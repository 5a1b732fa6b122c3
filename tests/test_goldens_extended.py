"""Extended pinned goldens: translate/multilingual prompts, a
distil-shaped (asymmetric) model, long-form multi-window transcription,
and word-timestamp DTW — frozen by scripts/make_goldens_extended.py with
every oracle-checkable value asserted against torch/transformers at
creation time. This replay needs NO torch (VERDICT r2 item 5: the golden
suite is the parity instrument on a zero-egress box)."""

import json
import os
import re

import numpy as np
import pytest

import jax.numpy as jnp

GOLDENS_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _params_from(z, prefix="params["):
    params = {}
    for key in z.files:
        if not key.startswith(prefix):
            continue
        path = re.findall(r"\['([^']+)'\]", key[len(prefix) - 1:])
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(z[key])
    return params


@pytest.fixture(scope="module")
def tiny():
    from nobs_whisper_tpu.core.config import WhisperConfig

    z = np.load(os.path.join(GOLDENS_DIR, "oracle_tiny.npz"))
    params = _params_from(z)
    cfg = WhisperConfig(name="goldens-tiny", force_multilingual=True,
                        **json.loads(bytes(z["cfg_json"]).decode()))
    return params, cfg


@pytest.fixture(scope="module")
def ext():
    return np.load(os.path.join(GOLDENS_DIR, "oracle_extended.npz"))


@pytest.mark.parametrize("name", ["translate", "lang2"])
def test_prompt_variant_matches_golden(tiny, ext, name):
    """Translate-task and second-language decodes stay oracle-exact
    (task/language selection, reference whisper.rs:91-118)."""
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode

    params, cfg = tiny
    opts = DecodeOptions(suppress_blank=True)
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    xa = encode(params, jnp.asarray(ext[f"{name}_mel"]), cfg)
    res = decode_window(params, xa, [ext[f"{name}_prompt"].tolist()],
                        cfg, tables, opts)[0]
    assert res.tokens == ext[f"{name}_tokens"].tolist()
    assert res.sum_logprob == pytest.approx(
        float(ext[f"{name}_sum_logprob"]), rel=1e-3, abs=1e-3)


def test_distil_shape_matches_golden(ext):
    """The asymmetric distil geometry (4 encoder / 2 decoder layers, the
    registry's distil-* entries, model.rs:121-151) decodes oracle-exact
    through encode + the window loop."""
    from nobs_whisper_tpu.core.config import WhisperConfig
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode

    params = _params_from(ext, prefix="distil_params[")
    cfg = WhisperConfig(name="goldens-distil", force_multilingual=True,
                        **json.loads(bytes(ext["distil_cfg_json"]).decode()))
    assert cfg.n_audio_layer == 4 and cfg.n_text_layer == 2
    opts = DecodeOptions(suppress_blank=True)
    tables = build_rule_tables(cfg, opts, tokenizer=None)
    xa = encode(params, jnp.asarray(ext["distil_mel"]), cfg)
    res = decode_window(params, xa, [ext["distil_prompt"].tolist()],
                        cfg, tables, opts)[0]
    assert res.tokens == ext["distil_tokens"].tolist()
    assert res.sum_logprob == pytest.approx(
        float(ext["distil_sum_logprob"]), rel=1e-3, abs=1e-3)


def test_longform_multiwindow_matches_golden(tiny, ext):
    """Three chained windows through the seek loop: text, segment
    boundaries, seeks and tokens all pinned (the window decodes the loop
    builds on are oracle-pinned above)."""
    from nobs_whisper_tpu.core.tokenizer import WhisperTokenizer
    from nobs_whisper_tpu.decode.rules import DecodeOptions
    from nobs_whisper_tpu.pipeline.longform import transcribe_mel
    from nobs_whisper_tpu.utils.testing import byte_level_vocab

    params, cfg = tiny
    tokenizer = WhisperTokenizer(byte_level_vocab(cfg), cfg)
    wf = 2 * cfg.n_audio_ctx
    lf = transcribe_mel(params, ext["longform_mel"], 3 * wf, cfg,
                        tokenizer, DecodeOptions(suppress_blank=True))
    assert lf.text == bytes(ext["longform_text"]).decode()
    frozen = json.loads(bytes(ext["longform_seg_json"]).decode())
    assert len(lf.segments) == len(frozen)
    for s, (seek, start, end, tokens) in zip(lf.segments, frozen):
        assert s.seek == seek
        assert s.start == pytest.approx(start, abs=1e-6)
        assert s.end == pytest.approx(end, abs=1e-6)
        assert s.tokens == tokens


def test_word_timestamps_match_golden(tiny, ext):
    """Cross-attention DTW word timings pinned end to end (teacher-forced
    attention pass + vectorized DTW + word grouping)."""
    from nobs_whisper_tpu.core.tokenizer import WhisperTokenizer
    from nobs_whisper_tpu.decode.timing import find_word_timings
    from nobs_whisper_tpu.models.whisper import encode
    from nobs_whisper_tpu.utils.testing import byte_level_vocab

    params, cfg = tiny
    tokenizer = WhisperTokenizer(byte_level_vocab(cfg), cfg)
    xa = encode(params, jnp.asarray(ext["wt_mel"]), cfg)
    prompt = [cfg.sot, cfg.lang_base, cfg.transcribe]
    words = find_word_timings(
        params, cfg, tokenizer, xa, ext["wt_tokens"].tolist(), prompt,
        num_frames=128, time_offset=0.0)
    frozen = json.loads(bytes(ext["wt_json"]).decode())
    assert len(words) == len(frozen)
    for w, (word, start, end, tokens) in zip(words, frozen):
        assert w.word == word
        assert w.start == pytest.approx(start, abs=1e-4)
        assert w.end == pytest.approx(end, abs=1e-4)
        assert w.tokens == tokens
