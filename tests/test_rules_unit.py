"""Direct unit tests of apply_logit_rules on crafted logits — pins each
rule independently of the decode loop and the HF oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.core.config import WhisperConfig
from nobs_whisper_tpu.decode.rules import (DecodeOptions, apply_logit_rules,
                                           build_rule_tables)

# tiny layout: text 0..9, eot=10, sot=11, langs 12-13, translate=14,
# transcribe=15, sot_lm=16, sot_prev=17, no_speech=18, no_ts=19, ts 20..30
CFG = WhisperConfig(
    name="rules-test", n_mels=80, n_vocab=31, n_audio_ctx=16,
    n_audio_state=8, n_audio_head=2, n_audio_layer=1, n_text_ctx=16,
    n_text_state=8, n_text_head=2, n_text_layer=1, n_langs=2,
    eot_id=10, force_multilingual=True)
TB = CFG.timestamp_begin          # 20
EOT = CFG.eot                     # 10


def _apply(logits, n_sampled, last=0, penult=0, max_ts=TB - 1,
           opts=None, tokenizer=None):
    tables = build_rule_tables(CFG, opts or DecodeOptions(), tokenizer)
    out = apply_logit_rules(
        jnp.asarray(logits, jnp.float32)[None], tables,
        n_sampled=jnp.asarray([n_sampled], jnp.int32),
        last_token=jnp.asarray([last], jnp.int32),
        penult_token=jnp.asarray([penult], jnp.int32),
        max_ts_token=jnp.asarray([max_ts], jnp.int32))
    return np.asarray(out)[0]


def _flat():
    return np.zeros(CFG.n_vocab, np.float32)


def _texty():
    """Logits where a text token clearly dominates (so the prob-mass rule
    doesn't fire — on flat logits the summed timestamp mass legitimately
    beats any single text token and forces a timestamp)."""
    x = np.zeros(CFG.n_vocab, np.float32)
    x[3] = 8.0
    return x


def test_specials_always_suppressed():
    out = _apply(_texty(), n_sampled=5, last=3, penult=4)
    for t in (CFG.sot, CFG.sot_prev, CFG.sot_lm, CFG.translate,
              CFG.transcribe, CFG.no_speech, CFG.no_timestamps,
              CFG.lang_base, CFG.lang_base + 1):
        assert out[t] < -1e20, t
    assert out[3] == 8.0  # text untouched


def test_first_step_forces_initial_timestamp():
    out = _apply(_flat(), n_sampled=0)
    assert (out[:TB] < -1e20).all()              # no text, no eot
    # max_initial_timestamp = 1.0s = 50 steps > our 10 ts tokens: all ts ok
    assert (out[TB:] > -1e20).all()


def test_max_initial_timestamp_boundary():
    opts = DecodeOptions(max_initial_timestamp=0.04)  # 2 steps
    out = _apply(_flat(), n_sampled=0, opts=opts)
    assert out[TB] > -1e20 and out[TB + 2] > -1e20
    assert out[TB + 3] < -1e20                   # beyond the cap


def test_after_single_timestamp_text_required():
    # one sampled token (a timestamp): penultimate counts as ts ->
    # "has to be non-timestamp"
    out = _apply(_texty(), n_sampled=1, last=TB + 2)
    assert (out[TB:] < -1e20).all()
    assert out[0] > -1e20


def test_after_text_then_timestamp_must_close_pair():
    # [text, ts]: next must be ts or eot. eot gets a strong logit so the
    # prob-mass rule doesn't also claim it (openai suppresses everything
    # below timestamp_begin — eot included — when timestamp mass wins).
    logits = _flat()
    logits[EOT] = 8.0
    out = _apply(logits, n_sampled=2, last=TB + 3, penult=2, max_ts=TB + 3)
    assert (out[:EOT] < -1e20).all()             # no text
    assert out[EOT] > -1e20                      # eot allowed
    assert out[TB + 3] > -1e20                   # same ts allowed (pairing)
    assert out[TB + 2] < -1e20                   # earlier ts monotonic-banned


def test_prob_mass_rule_claims_eot_too():
    """openai semantics: when timestamp mass wins, everything below
    timestamp_begin (eot included) is suppressed."""
    out = _apply(_flat(), n_sampled=2, last=TB + 3, penult=2, max_ts=TB + 3)
    assert out[EOT] < -1e20
    assert out[TB + 3] > -1e20


def test_monotonic_after_closed_pair():
    # [..., ts, ts] closed pair: next ts must be strictly greater
    out = _apply(_texty(), n_sampled=3, last=5, penult=TB + 4,
                 max_ts=TB + 4)
    assert out[TB + 4] < -1e20                   # equal banned
    assert out[TB + 5] > -1e20                   # strictly greater ok


def test_prob_mass_rule_forces_timestamp():
    logits = _flat()
    logits[TB:] = 5.0                            # huge timestamp mass
    logits[3] = 4.0                              # best text
    out = _apply(logits, n_sampled=2, last=1, penult=2)
    assert (out[:TB] < -1e20).all()              # text forced out


def test_prob_mass_rule_keeps_text_when_text_wins():
    logits = _flat()
    logits[3] = 10.0                             # text dominates
    logits[TB:] = -5.0
    out = _apply(logits, n_sampled=2, last=1, penult=2)
    assert out[3] > -1e20


def test_no_timestamps_mode():
    out = _apply(_texty(), n_sampled=0,
                 opts=DecodeOptions(timestamps=False))
    assert (out[TB:] < -1e20).all()
    assert out[CFG.no_timestamps] < -1e20
    assert out[0] > -1e20                        # text ok at first step


def test_blank_suppression_needs_tokenizer():
    class FakeTok:
        def encode(self, s):
            return [7] if s == " " else [8]

        non_speech_tokens = ()

    out = _apply(_texty(), n_sampled=0,
                 opts=DecodeOptions(timestamps=False), tokenizer=FakeTok())
    assert out[7] < -1e20                        # " " suppressed at start
    assert out[EOT] < -1e20                      # eot suppressed at start
    out2 = _apply(_texty(), n_sampled=3, last=1, penult=2,
                  opts=DecodeOptions(timestamps=False), tokenizer=FakeTok())
    assert out2[7] > -1e20                       # only at the first step


def test_suppress_non_speech_option():
    class FakeTok:
        def encode(self, s):
            return [9]

        non_speech_tokens = (4, 5)

    out = _apply(_texty(), n_sampled=2, last=1, penult=2,
                 opts=DecodeOptions(suppress_non_speech=True),
                 tokenizer=FakeTok())
    assert out[4] < -1e20 and out[5] < -1e20
    assert out[3] > -1e20
