"""Layer-level numeric parity vs the torch (transformers) Whisper.

transformers' WhisperModel is numerically equivalent to openai-whisper
(and hence to what whisper.cpp computes in fp32), so random-weight parity
here pins our encoder/decoder math: conv stem, attention scaling, layernorm
placement, KV caching, logit projection.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.core.hf import config_from_hf, params_from_hf_state_dict
from nobs_whisper_tpu.models.whisper import (
    decoder_forward, encode, init_kv_cache, precompute_cross_kv)


@pytest.fixture(scope="module")
def torch_model():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=937,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        decoder_ffn_dim=256,
        encoder_ffn_dim=256,
        max_source_positions=64,   # audio ctx (mel frames / 2)
        max_target_positions=96,
        activation_function="gelu",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    return model, hf_cfg


@pytest.fixture(scope="module")
def jax_params(torch_model):
    model, hf_cfg = torch_model
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(model.model.state_dict(), cfg)
    return params, cfg


def _rand_mel(hf_cfg, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    t_mel = 2 * hf_cfg.max_source_positions
    return rng.randn(batch, hf_cfg.num_mel_bins, t_mel).astype(np.float32)


def test_encoder_parity(torch_model, jax_params):
    import torch
    model, hf_cfg = torch_model
    params, cfg = jax_params
    mel = _rand_mel(hf_cfg)
    with torch.no_grad():
        expected = model.model.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encode(params, jnp.asarray(mel), cfg))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_decoder_prefill_parity(torch_model, jax_params):
    import torch
    model, hf_cfg = torch_model
    params, cfg = jax_params
    mel = _rand_mel(hf_cfg)
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, hf_cfg.vocab_size, size=(2, 7)).astype(np.int32)

    with torch.no_grad():
        out = model(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)))
        expected = out.logits.numpy()

    xa = encode(params, jnp.asarray(mel), cfg)
    cross_kv = precompute_cross_kv(params, xa, cfg)
    cache = init_kv_cache(cfg, batch=2)
    logits, _ = decoder_forward(
        params, jnp.asarray(tokens), jnp.int32(0), jnp.zeros(2, jnp.int32),
        cache, cross_kv, cfg)
    np.testing.assert_allclose(np.asarray(logits), expected,
                               rtol=1e-4, atol=1e-3)


def test_incremental_decode_matches_prefill(torch_model, jax_params):
    """Token-by-token decoding with the KV cache must equal one-shot
    prefill — validates cache writes, masks and position handling."""
    model, hf_cfg = torch_model
    params, cfg = jax_params
    mel = _rand_mel(hf_cfg, seed=2)
    rng = np.random.RandomState(3)
    tokens = rng.randint(0, hf_cfg.vocab_size, size=(2, 6)).astype(np.int32)
    no_pad = jnp.zeros(2, jnp.int32)

    xa = encode(params, jnp.asarray(mel), cfg)
    cross_kv = precompute_cross_kv(params, xa, cfg)

    cache = init_kv_cache(cfg, batch=2)
    full_logits, _ = decoder_forward(
        params, jnp.asarray(tokens), jnp.int32(0), no_pad, cache,
        cross_kv, cfg)

    cache = init_kv_cache(cfg, batch=2)
    step_logits = []
    for i in range(tokens.shape[1]):
        logits, cache = decoder_forward(
            params, jnp.asarray(tokens[:, i: i + 1]), jnp.int32(i),
            no_pad, cache, cross_kv, cfg)
        step_logits.append(np.asarray(logits[:, 0]))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               rtol=1e-4, atol=1e-4)


def test_left_padded_ragged_batch(torch_model, jax_params):
    """Left-padded ragged batches: each element's logits must equal its
    solo decode — validates the pad mask and position-index offsets."""
    model, hf_cfg = torch_model
    params, cfg = jax_params
    mel = _rand_mel(hf_cfg, seed=4)
    rng = np.random.RandomState(5)
    t_a = rng.randint(0, hf_cfg.vocab_size, size=9).astype(np.int32)
    t_b = rng.randint(0, hf_cfg.vocab_size, size=4).astype(np.int32)
    p_max = 9

    xa = encode(params, jnp.asarray(mel), cfg)
    cross_kv = precompute_cross_kv(params, xa, cfg)

    # solo decodes (no padding)
    solo = []
    for bi, toks in ((0, t_a), (1, t_b)):
        cache = init_kv_cache(cfg, batch=2)
        logits, cache = decoder_forward(
            params, jnp.broadcast_to(jnp.asarray(toks), (2, len(toks))),
            jnp.int32(0), jnp.zeros(2, jnp.int32), cache, cross_kv, cfg)
        solo.append(np.asarray(logits[bi, -1]))

    # joint left-padded prefill: element 1 padded to 9 with junk tokens
    pad_b = p_max - len(t_b)
    joint = np.stack([t_a,
                      np.concatenate([np.full(pad_b, 7, np.int32), t_b])])
    pads = jnp.asarray(np.array([0, pad_b], np.int32))
    cache = init_kv_cache(cfg, batch=2)
    logits, cache = decoder_forward(
        params, jnp.asarray(joint), jnp.int32(0), pads, cache,
        cross_kv, cfg)
    np.testing.assert_allclose(np.asarray(logits[0, -1]), solo[0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits[1, -1]), solo[1],
                               rtol=1e-4, atol=1e-4)

    # and one joint decode step after the prefill
    cache2 = init_kv_cache(cfg, batch=2)
    solo_step = []
    for bi, toks in ((0, t_a), (1, t_b)):
        c = init_kv_cache(cfg, batch=2)
        _, c = decoder_forward(
            params, jnp.broadcast_to(jnp.asarray(toks), (2, len(toks))),
            jnp.int32(0), jnp.zeros(2, jnp.int32), c, cross_kv, cfg)
        lg, _ = decoder_forward(
            params, jnp.full((2, 1), 11, jnp.int32), jnp.int32(len(toks)),
            jnp.zeros(2, jnp.int32), c, cross_kv, cfg)
        solo_step.append(np.asarray(lg[bi, 0]))
    lg, _ = decoder_forward(
        params, jnp.full((2, 1), 11, jnp.int32), jnp.int32(p_max),
        pads, cache, cross_kv, cfg)
    np.testing.assert_allclose(np.asarray(lg[0, 0]), solo_step[0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lg[1, 0]), solo_step[1],
                               rtol=1e-4, atol=1e-4)


def test_bf16_close_to_fp32(torch_model, jax_params):
    import jax
    model, hf_cfg = torch_model
    params, cfg = jax_params
    mel = _rand_mel(hf_cfg, seed=6)
    f32 = np.asarray(encode(params, jnp.asarray(mel), cfg))
    p16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    b16 = np.asarray(encode(p16, jnp.asarray(mel), cfg,
                            compute_dtype=jnp.bfloat16).astype(jnp.float32))
    # bf16 has ~3 decimal digits; activations are O(1)
    assert np.abs(b16 - f32).mean() < 0.05


def test_deep_decoder_path_matches_unrolled(torch_model, jax_params):
    """The fori_loop decoder branch (small/medium/large-v3, >8 layers)
    must equal the unrolled branch exactly — same in-place cache
    semantics, layer params/cross-KV fetched by dynamic index."""
    import os
    import jax
    params, cfg = jax_params
    mel = _rand_mel((torch_model)[1], seed=7)
    xa = encode(params, jnp.asarray(mel), cfg)
    cross_kv = precompute_cross_kv(params, xa, cfg)
    toks = jnp.asarray([[3, 7, 11], [3, 5, 2]], jnp.int32)
    pads = jnp.asarray([0, 1], jnp.int32)

    def run():
        cache = init_kv_cache(cfg, batch=2)
        lg1, cache = decoder_forward(params, toks, jnp.int32(0), pads,
                                     cache, cross_kv, cfg)
        lg2, cache = decoder_forward(
            params, jnp.full((2, 1), 9, jnp.int32), jnp.int32(3), pads,
            cache, cross_kv, cfg)
        return np.asarray(lg1), np.asarray(lg2), jax.tree.map(
            np.asarray, cache)

    assert not os.environ.get("NWT_DEEP_DECODER")
    a1, a2, ca = run()
    os.environ["NWT_DEEP_DECODER"] = "1"
    try:
        b1, b2, cb = run()
    finally:
        del os.environ["NWT_DEEP_DECODER"]
    np.testing.assert_allclose(a1, b1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(a2, b2, rtol=1e-6, atol=1e-6)
    for x, y in zip(jax.tree.leaves(ca), jax.tree.leaves(cb)):
        np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-6)
