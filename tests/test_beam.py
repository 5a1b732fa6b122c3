"""Beam search: pure beam_step math, model-level properties, batch/solo
equality."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.decode.beam import beam_decode_window, beam_step
from nobs_whisper_tpu.decode.greedy import decode_window
from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
from nobs_whisper_tpu.models.whisper import encode


# ---------------------------------------------------------------------------
# beam_step pure math
# ---------------------------------------------------------------------------

def _step(cum, logprobs, fin_valid=None, eot=3, first=False):
    b, k, v = logprobs.shape
    fin_valid = fin_valid if fin_valid is not None else np.zeros((b, k), bool)
    return [np.asarray(x) for x in beam_step(
        jnp.asarray(cum, jnp.float32), jnp.asarray(logprobs, jnp.float32),
        jnp.asarray(fin_valid), eot, jnp.asarray(first))]


def test_beam_step_first_expands_only_beam0():
    # K=2, V=4; beam1 has a huge score that must be ignored at step 0
    cum = np.array([[0.0, 100.0]], np.float32)
    lp = np.log(np.array([[[0.5, 0.3, 0.15, 0.05],
                           [0.25, 0.25, 0.25, 0.25]]], np.float32))
    src, tok, new_cum, *_ = _step(cum, lp, first=True)
    assert (src == 0).all()                 # both survivors from beam 0
    assert tok[0, 0] == 0 and tok[0, 1] == 1  # two best non-eot tokens
    np.testing.assert_allclose(new_cum[0], lp[0, 0, [0, 1]], rtol=1e-6)


def test_beam_step_selects_global_top_k():
    cum = np.array([[0.0, -0.1]], np.float32)
    # beam 0 best next: token0 (-0.2); beam 1 best: token1 (-0.05)
    lp = np.full((1, 2, 4), -10.0, np.float32)
    lp[0, 0, 0] = -0.2
    lp[0, 1, 1] = -0.05
    src, tok, new_cum, *_ = _step(cum, lp)
    # candidates: beam1+tok1 = -0.15, beam0+tok0 = -0.2
    assert src[0, 0] == 1 and tok[0, 0] == 1
    assert src[0, 1] == 0 and tok[0, 1] == 0
    np.testing.assert_allclose(new_cum[0], [-0.15, -0.2], rtol=1e-5)


def test_beam_step_eot_goes_to_finished():
    cum = np.zeros((1, 2), np.float32)
    lp = np.full((1, 2, 4), -10.0, np.float32)
    lp[0, 0, 3] = -0.1        # eot on beam 0: best candidate -> finished
    lp[0, 0, 0] = -0.5
    lp[0, 1, 1] = -0.7
    src, tok, new_cum, fin_slot, fin_src, fin_score = _step(cum, lp)
    assert fin_slot[0, 0] == 0            # takes the first empty pool slot
    assert fin_src[0, 0] == 0
    assert fin_score[0, 0] == pytest.approx(-0.1, rel=1e-5)
    assert fin_slot[0, 1] >= 2            # no second finisher
    # active beams exclude the eot candidate
    assert 3 not in tok[0]


def test_beam_step_full_pool_discards_new_finishers():
    """openai semantics: the pool fills WITHOUT replacement — once K
    sequences finished, even a better new finisher is discarded."""
    cum = np.zeros((1, 2), np.float32)
    fin_valid = np.array([[True, True]])          # pool already full
    lp = np.full((1, 2, 4), -10.0, np.float32)
    lp[0, 0, 3] = -0.01                           # excellent new eot
    lp[0, 1, 0] = -0.2
    src, tok, new_cum, fin_slot, fin_src, fin_score = _step(
        cum, lp, fin_valid=fin_valid)
    assert (fin_slot[0] >= 2).all()               # all dropped


def test_beam_step_low_ranked_eot_not_collected():
    """An eot candidate below the K-th active candidate never finishes
    (openai's sorted sweep breaks once K actives are saved)."""
    cum = np.zeros((1, 2), np.float32)
    lp = np.full((1, 2, 4), -10.0, np.float32)
    lp[0, 0, 0] = -0.2
    lp[0, 1, 1] = -0.3      # K-th (=2nd) active = -0.3
    lp[0, 0, 3] = -0.5      # eot BELOW the 2nd active: not a finisher
    src, tok, new_cum, fin_slot, fin_src, fin_score = _step(cum, lp)
    assert (fin_slot[0] >= 2).all()
    lp[0, 0, 3] = -0.25     # eot ABOVE the 2nd active: finishes
    src, tok, new_cum, fin_slot, fin_src, fin_score = _step(cum, lp)
    assert fin_slot[0, 0] == 0
    assert fin_score[0, 0] == pytest.approx(-0.25, rel=1e-5)


# ---------------------------------------------------------------------------
# model-level properties on the tiny oracle model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    from tests.test_decode import _special_layout, setup as _s
    # reuse the decode test fixture machinery manually
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    from nobs_whisper_tpu.core.config import WhisperConfig
    from nobs_whisper_tpu.core.hf import params_from_hf_state_dict

    sp = _special_layout()
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=sp["n_vocab"], num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=64, max_target_positions=96,
        activation_function="gelu", pad_token_id=sp["eot"],
        bos_token_id=sp["eot"], eos_token_id=sp["eot"],
        decoder_start_token_id=sp["sot"],
        suppress_tokens=None, begin_suppress_tokens=None)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = WhisperConfig(
        name="beam-test", n_mels=80, n_vocab=sp["n_vocab"],
        n_audio_ctx=64, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
        n_text_ctx=96, n_text_state=64, n_text_head=4, n_text_layer=2,
        n_langs=4, eot_id=sp["eot"], force_multilingual=True)
    params = params_from_hf_state_dict(model.model.state_dict(), cfg)
    return params, cfg, sp


def _xa_and_prompt(params, cfg, sp, seed=0, batch=1):
    rng = np.random.RandomState(seed)
    mel = rng.randn(batch, 80, 128).astype(np.float32)
    xa = encode(params, jnp.asarray(mel), cfg)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]
    return xa, prompt


def test_beam1_often_matches_greedy(setup):
    """beam_size=1 is greedy by construction when a finished beam exists."""
    params, cfg, sp = setup
    tables = build_rule_tables(cfg, DecodeOptions())
    for seed in (0, 1, 2):
        xa, prompt = _xa_and_prompt(params, cfg, sp, seed)
        g = decode_window(params, xa, [prompt], cfg, tables,
                          DecodeOptions())[0]
        b = beam_decode_window(params, xa, [prompt], cfg, tables,
                               beam_size=1)[0]
        assert b.tokens == g.tokens, f"seed {seed}"
        assert b.sum_logprob == pytest.approx(g.sum_logprob, abs=1e-3)


def test_beam5_no_worse_than_greedy(setup):
    params, cfg, sp = setup
    tables = build_rule_tables(cfg, DecodeOptions())
    for seed in (0, 1, 2, 3):
        xa, prompt = _xa_and_prompt(params, cfg, sp, seed)
        g = decode_window(params, xa, [prompt], cfg, tables,
                          DecodeOptions())[0]
        b = beam_decode_window(params, xa, [prompt], cfg, tables,
                               beam_size=5)[0]
        assert b.avg_logprob >= g.avg_logprob - 1e-4, f"seed {seed}"


def test_beam_rules_respected(setup):
    params, cfg, sp = setup
    tables = build_rule_tables(cfg, DecodeOptions())
    xa, prompt = _xa_and_prompt(params, cfg, sp, seed=5)
    b = beam_decode_window(params, xa, [prompt], cfg, tables, beam_size=5)[0]
    if b.tokens:
        assert b.tokens[0] >= sp["ts_begin"]       # starts with timestamp
    for t in b.tokens:
        assert t != sp["sot"] and t != sp["no_ts"]


def test_beam_batch_matches_solo(setup):
    params, cfg, sp = setup
    tables = build_rule_tables(cfg, DecodeOptions())
    rng = np.random.RandomState(9)
    mel = rng.randn(3, 80, 128).astype(np.float32)
    xa = encode(params, jnp.asarray(mel), cfg)
    prompt = [sp["sot"], sp["lang0"], sp["transcribe"]]
    batch = beam_decode_window(params, xa, [prompt] * 3, cfg, tables,
                               beam_size=3)
    for i in range(3):
        solo = beam_decode_window(params, xa[i: i + 1], [prompt], cfg,
                                  tables, beam_size=3)[0]
        assert batch[i].tokens == solo.tokens
        assert batch[i].avg_logprob == pytest.approx(solo.avg_logprob,
                                                     abs=1e-3)


def test_beam_shared_packed_cross_kv_matches_plain(setup):
    """The packed, beam-SHARED cross-KV path (grouped cross-attention,
    the bf16 TPU default) must produce the same beams as the plain
    repeated-KV path at the same precision."""
    import os
    import jax
    params, cfg, sp = setup
    p16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    tables = build_rule_tables(cfg, DecodeOptions())
    for seed, batch in ((0, 1), (3, 2)):
        xa, prompt = _xa_and_prompt(params, cfg, sp, seed, batch=batch)
        xa16 = xa.astype(jnp.bfloat16)
        prompts = [prompt] * batch
        # the env flags are read at CALL time and become the packed_kv
        # static arg, so the two calls compile (and cache) as distinct
        # programs — no clear_cache dance needed
        os.environ["NWT_NO_KT_XATTN"] = "1"     # plain repeated KV
        try:
            plain = beam_decode_window(p16, xa16, prompts, cfg, tables,
                                       beam_size=3,
                                       compute_dtype=jnp.bfloat16)
        finally:
            del os.environ["NWT_NO_KT_XATTN"]
        os.environ["NWT_FORCE_KT"] = "1"        # packed + shared (grouped)
        try:
            shared = beam_decode_window(p16, xa16, prompts, cfg, tables,
                                        beam_size=3,
                                        compute_dtype=jnp.bfloat16)
        finally:
            del os.environ["NWT_FORCE_KT"]
        for pl_r, sh_r in zip(plain, shared):
            assert sh_r.tokens == pl_r.tokens, f"seed {seed}"
            assert sh_r.sum_logprob == pytest.approx(pl_r.sum_logprob,
                                                     abs=5e-2)


def test_beam_ancestry_matches_permuted(setup):
    """NWT_BEAM_ANCESTRY=1 (self-attention through ancestry pointers,
    no per-step cache permutation) must be token-equal with the
    default one-hot-reorder path — the adoption gate for the round-5
    reorder-deletion lever (scripts/beam_ancestry_probe.py). The knob
    is trace-time, so caches are cleared around the flip."""
    import os

    import jax
    params, cfg, sp = setup
    tables = build_rule_tables(cfg, DecodeOptions())
    for seed, batch in ((0, 1), (3, 2), (7, 3)):
        xa, prompt = _xa_and_prompt(params, cfg, sp, seed, batch=batch)
        prompts = [prompt] * batch
        jax.clear_caches()
        base = beam_decode_window(params, xa, prompts, cfg, tables,
                                  beam_size=3)
        os.environ["NWT_BEAM_ANCESTRY"] = "1"
        jax.clear_caches()
        try:
            anc = beam_decode_window(params, xa, prompts, cfg, tables,
                                     beam_size=3)
        finally:
            del os.environ["NWT_BEAM_ANCESTRY"]
            jax.clear_caches()
        for b_r, a_r in zip(base, anc):
            assert a_r.tokens == b_r.tokens, f"seed {seed}"
            assert a_r.sum_logprob == pytest.approx(b_r.sum_logprob,
                                                    abs=1e-3)
