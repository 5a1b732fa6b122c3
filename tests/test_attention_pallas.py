"""Int8 cross-KV attention: quantization folding, kernel parity
(interpret), end-to-end decode agreement with fp32 KV."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nobs_whisper_tpu.ops.attention_pallas import (
    cross_attention_decode_q8, cross_attention_dequant_reference,
    quantize_cross_kv)


def _fp_reference(q, k, v):
    dh = q.shape[-1]
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k) * (dh ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


def _make(b=2, h=4, t=300, dh=64, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(1, b, h, 1, dh).astype(np.float32)[0] * 0.5
    k = rng.randn(1, b, h, t, dh).astype(np.float32)  # (L=1,B,H,T,D)
    v = rng.randn(1, b, h, t, dh).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_quantize_cross_kv_shapes_and_padding():
    q, k, v = _make(t=300)
    kq, vq = quantize_cross_kv((k, v))
    assert kq["q"].shape == (1, 2, 4, 64, 384)      # T padded to 384
    assert kq["s"].shape == (1, 2, 4, 384)
    assert vq["q"].shape == (1, 2, 4, 384, 64)
    # padding positions carry zero scale
    assert np.asarray(kq["s"])[..., 300:].max() == 0.0
    assert np.asarray(kq["s"])[..., :300].min() > 0.0


def test_dequant_reference_close_to_fp():
    q, k, v = _make()
    kq, vq = quantize_cross_kv((k, v))
    expected = np.asarray(_fp_reference(q, k[0], v[0]))
    got = np.asarray(cross_attention_dequant_reference(
        q, jax.tree.map(lambda x: x[0], kq), jax.tree.map(lambda x: x[0], vq)))
    assert np.abs(got - expected).max() < 0.02


def test_kernel_matches_dequant_reference():
    q, k, v = _make(seed=3)
    kq, vq = quantize_cross_kv((k, v))
    kq0 = jax.tree.map(lambda x: x[0], kq)
    vq0 = jax.tree.map(lambda x: x[0], vq)
    expected = np.asarray(cross_attention_dequant_reference(q, kq0, vq0))
    got = np.asarray(cross_attention_decode_q8(q, kq0, vq0, interpret=True))
    assert got.shape == expected.shape
    # kernel computes qk in bf16 — small tolerance
    assert np.abs(got - expected).max() < 0.02


def test_bf16_pack_shapes():
    from nobs_whisper_tpu.ops.attention_pallas import pack_cross_kv_bf16
    q, k, v = _make(t=300)
    kd, vd = pack_cross_kv_bf16((k, v))
    assert kd["kT"].shape == (1, 2, 4, 64, 384)     # T padded to 384
    assert kd["kT"].dtype == jnp.bfloat16
    assert vd["v"].shape == (1, 2, 4, 384, 64)
    # padded tail is zeros (masked by index in the kernel)
    assert np.asarray(kd["kT"])[..., 300:].max() == 0.0


def test_bf16_kernel_matches_reference():
    from nobs_whisper_tpu.ops.attention_pallas import (
        cross_attention_bf16_reference, cross_attention_decode_bf16,
        pack_cross_kv_bf16)
    q, k, v = _make(seed=7)
    kd, vd = pack_cross_kv_bf16((k, v))
    packed = {"kT": kd["kT"][0], "v": vd["v"][0]}
    expected = np.asarray(_fp_reference(q, k[0], v[0]))
    ref = np.asarray(cross_attention_bf16_reference(q, packed, 300))
    got = np.asarray(cross_attention_decode_bf16(q, packed, 300,
                                                 interpret=True))
    assert got.shape == expected.shape
    assert np.abs(ref - expected).max() < 0.02      # bf16 K/V rounding
    assert np.abs(got - ref).max() < 0.02


def test_bf16_decode_window_matches_fp32():
    """Greedy decode with the bf16 packed cross-KV tracks the plain path."""
    import tempfile, os
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint

    path = os.path.join(tempfile.mkdtemp(), "m.bin")
    write_tiny_checkpoint(path)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    cfg = eng.cfg
    rng = np.random.RandomState(0)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(eng.params, jnp.asarray(mel), cfg)
    prompt = [[cfg.sot, cfg.lang_base, cfg.transcribe]]

    tables = build_rule_tables(cfg, DecodeOptions(), eng.tokenizer)
    fp = decode_window(eng.params, xa, prompt, cfg, tables,
                       DecodeOptions())[0]
    bf = decode_window(eng.params, xa, prompt, cfg, tables,
                       DecodeOptions(xattn_bf16=True))[0]
    n = min(len(fp.tokens), len(bf.tokens), 5)
    assert fp.tokens[:n] == bf.tokens[:n]
    assert bf.no_speech_prob == pytest.approx(fp.no_speech_prob, abs=0.05)


def test_quantized_decode_window_matches_fp32():
    """Greedy decode with q8 cross-KV tracks the fp32 path."""
    import tempfile, os
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.decode.greedy import decode_window
    from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
    from nobs_whisper_tpu.models.whisper import encode
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint

    path = os.path.join(tempfile.mkdtemp(), "m.bin")
    write_tiny_checkpoint(path)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    cfg = eng.cfg
    rng = np.random.RandomState(0)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(eng.params, jnp.asarray(mel), cfg)
    prompt = [[cfg.sot, cfg.lang_base, cfg.transcribe]]

    tables = build_rule_tables(cfg, DecodeOptions(), eng.tokenizer)
    fp = decode_window(eng.params, xa, prompt, cfg, tables,
                       DecodeOptions())[0]
    q8 = decode_window(eng.params, xa, prompt, cfg, tables,
                       DecodeOptions(q8_cross_kv=True))[0]
    n = min(len(fp.tokens), len(q8.tokens), 5)
    assert fp.tokens[:n] == q8.tokens[:n]
    assert q8.no_speech_prob == pytest.approx(fp.no_speech_prob, abs=0.05)


def test_kt_xla_layout_matches_reference():
    """The packed-layout XLA cross-attention (the bf16 TPU decode default)
    matches the plain fp path within bf16 rounding."""
    from nobs_whisper_tpu.ops.attention_pallas import (
        cross_attention_bf16_reference, cross_attention_kt_xla,
        pack_cross_kv_bf16)
    q, k, v = _make(seed=11, t=300)
    kd, vd = pack_cross_kv_bf16((k, v))
    packed = {"kT": kd["kT"][0], "v": vd["v"][0]}
    ref = np.asarray(cross_attention_bf16_reference(q, packed, 300))
    got = np.asarray(cross_attention_kt_xla(q, packed, 300))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 0.02


def test_fused_q8_precompute_matches_unfused():
    """precompute_cross_kv_q8 (per-layer fused projection+quantization,
    the memory-lifting order) computes the same math as
    quantize_cross_kv(precompute_cross_kv(...)). The two are separately
    compiled programs, so XLA may reassociate the K/V projection matmul
    differently (measured: 1-ulp scale drift on ~2.5% of positions on
    XLA:CPU, bit-identical on the TPU) — quantized VALUES must match
    exactly, scales to 1 ulp."""
    import jax

    from nobs_whisper_tpu.models.whisper import (init_params,
                                                 precompute_cross_kv,
                                                 precompute_cross_kv_q8)
    from nobs_whisper_tpu.utils.testing import tiny_test_config

    cfg = tiny_test_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    xa = jax.random.normal(jax.random.PRNGKey(1),
                           (2, cfg.n_audio_ctx, cfg.n_audio_state),
                           jnp.float32)
    ref_k, ref_v = quantize_cross_kv(precompute_cross_kv(params, xa, cfg))
    fus_k, fus_v = precompute_cross_kv_q8(params, xa, cfg)
    for ref, fus in ((ref_k, fus_k), (ref_v, fus_v)):
        np.testing.assert_array_equal(np.asarray(ref["q"]),
                                      np.asarray(fus["q"]))
        np.testing.assert_allclose(np.asarray(ref["s"]),
                                   np.asarray(fus["s"]), rtol=1e-6)
