"""Int8 path: quantization error bounds, Pallas kernel parity (interpret),
quantized decoder quality vs fp32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nobs_whisper_tpu.ops.quant import (
    dense, dequantize_int8, is_quantized, q8_matmul, quantize_decoder_params,
    quantize_int8)


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    w = rng.randn(256, 512).astype(np.float32) * 0.1
    qt = quantize_int8(jnp.asarray(w))
    assert qt["q"].dtype == jnp.int8
    assert qt["s"].shape == (1, 512)
    back = np.asarray(dequantize_int8(qt))
    # per-channel absmax/127 bounds the error at half a step
    step = np.abs(w).max(axis=0, keepdims=True) / 127
    assert (np.abs(back - w) <= step * 0.5 + 1e-7).all()


def test_quantize_stacked():
    rng = np.random.RandomState(1)
    w = rng.randn(3, 64, 128).astype(np.float32)
    qt = quantize_int8(jnp.asarray(w))
    assert qt["q"].shape == (3, 64, 128)
    assert qt["s"].shape == (3, 1, 128)
    back = np.asarray(dequantize_int8(qt))
    assert np.abs(back - w).max() < np.abs(w).max() / 100


def test_q8_matmul_kernel_matches_dequant():
    rng = np.random.RandomState(2)
    x = rng.randn(8, 256).astype(np.float32)
    w = rng.randn(256, 640).astype(np.float32) * 0.05
    qt = quantize_int8(jnp.asarray(w))
    expected = np.asarray(jnp.asarray(x) @ dequantize_int8(qt))
    got = np.asarray(q8_matmul(jnp.asarray(x), qt, interpret=True))
    # kernel computes in bf16: ~1% relative tolerance on O(1) outputs
    assert np.abs(got - expected).max() < 0.05 * np.abs(expected).max() + 0.05


def test_dense_dispatch():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.05)
    np.testing.assert_allclose(np.asarray(dense(x, w)),
                               np.asarray(x @ w), rtol=1e-6)
    qt = quantize_int8(w)
    assert is_quantized(qt)
    d = np.asarray(dense(x, qt))
    ref = np.asarray(x @ w)
    assert np.abs(d - ref).max() < 0.02 * np.abs(ref).max() + 0.01


@pytest.fixture(scope="module")
def engine():
    import tempfile, os
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint
    path = os.path.join(tempfile.mkdtemp(), "m.bin")
    write_tiny_checkpoint(path)
    return WhisperEngine.from_ggml(path, dtype=jnp.float32)


def test_quantized_decoder_structure(engine):
    qp = quantize_decoder_params(engine.params)
    blocks = qp["decoder"]["blocks"]
    assert is_quantized(blocks["q_w"])
    assert not is_quantized(blocks["ln1_g"])          # norms untouched
    assert not is_quantized(qp["encoder"]["blocks"]["q_w"])
    assert "tok_emb_q" in qp["decoder"]
    d = engine.cfg.n_audio_state
    assert qp["decoder"]["tok_emb_q"]["q"].shape == (d, engine.cfg.n_vocab)


def test_quantized_decode_close_to_fp32(engine):
    """Greedy transcripts from the int8 decoder should usually match fp32;
    at minimum the step logits must stay highly correlated."""
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import (
        decoder_forward, encode, init_kv_cache, precompute_cross_kv)

    cfg = engine.cfg
    rng = np.random.RandomState(0)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(engine.params, jnp.asarray(mel), cfg)
    qp = quantize_decoder_params(engine.params)

    prompt = jnp.asarray([[cfg.sot, cfg.lang_base, cfg.transcribe]],
                         jnp.int32)
    pos = jnp.int32(0)
    pads = jnp.zeros((1,), jnp.int32)

    ckv_f = precompute_cross_kv(engine.params, xa, cfg)
    ckv_q = precompute_cross_kv(qp, xa, cfg)
    lf, _ = decoder_forward(engine.params, prompt, pos, pads,
                            init_kv_cache(cfg, 1), ckv_f, cfg)
    lq, _ = decoder_forward(qp, prompt, pos, pads,
                            init_kv_cache(cfg, 1), ckv_q, cfg)
    a = np.asarray(lf[:, -1]).ravel()
    b = np.asarray(lq[:, -1]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr
    assert a.argmax() == b.argmax()

    tables = build_rule_tables(cfg, DecodeOptions(), engine.tokenizer)
    rf = decode_window(engine.params, xa, [[cfg.sot, cfg.lang_base,
                                            cfg.transcribe]],
                       cfg, tables, DecodeOptions())[0]
    rq = decode_window(qp, xa, [[cfg.sot, cfg.lang_base, cfg.transcribe]],
                       cfg, tables, DecodeOptions())[0]
    # token-level agreement on the prefix (int8 noise may diverge late)
    n = min(len(rf.tokens), len(rq.tokens), 5)
    assert rf.tokens[:n] == rq.tokens[:n]


def test_fuse_qkv_equivalence(engine):
    """Fused-QKV decode must equal the unfused path exactly (same math)."""
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode
    from nobs_whisper_tpu.ops.quant import fuse_qkv

    cfg = engine.cfg
    rng = np.random.RandomState(4)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(engine.params, jnp.asarray(mel), cfg)
    prompt = [[cfg.sot, cfg.lang_base, cfg.transcribe]]
    tables = build_rule_tables(cfg, DecodeOptions(), engine.tokenizer)

    base = decode_window(engine.params, xa, prompt, cfg, tables,
                         DecodeOptions())[0]
    fused = decode_window(fuse_qkv(engine.params), xa, prompt, cfg, tables,
                          DecodeOptions())[0]
    assert fused.tokens == base.tokens
    assert fused.sum_logprob == pytest.approx(base.sum_logprob, abs=1e-3)

    # also through the quantized tree
    qp = fuse_qkv(quantize_decoder_params(engine.params))
    fq = decode_window(qp, xa, prompt, cfg, tables, DecodeOptions())[0]
    assert isinstance(fq.tokens, list)


def test_int8_encoder_accuracy(engine):
    """Dynamic-int8 encoder activations track the fp32 encoder closely
    enough to keep the greedy transcript prefix."""
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode
    from nobs_whisper_tpu.ops.quant import quantize_encoder_params

    cfg = engine.cfg
    rng = np.random.RandomState(7)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    qp = quantize_encoder_params(engine.params)

    xa_f = np.asarray(encode(engine.params, jnp.asarray(mel), cfg))
    xa_q = np.asarray(encode(qp, jnp.asarray(mel), cfg))
    assert xa_q.shape == xa_f.shape
    corr = np.corrcoef(xa_f.ravel(), xa_q.ravel())[0, 1]
    assert corr > 0.995, corr

    prompt = [[cfg.sot, cfg.lang_base, cfg.transcribe]]
    tables = build_rule_tables(cfg, DecodeOptions(), engine.tokenizer)
    rf = decode_window(engine.params, jnp.asarray(xa_f), prompt, cfg,
                       tables, DecodeOptions())[0]
    rq = decode_window(engine.params, jnp.asarray(xa_q), prompt, cfg,
                       tables, DecodeOptions())[0]
    n = min(len(rf.tokens), len(rq.tokens), 5)
    assert rf.tokens[:n] == rq.tokens[:n]
