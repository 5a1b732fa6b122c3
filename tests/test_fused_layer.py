"""Whole-layer fused kernel: interpret-mode parity with the composition
it replaces (fused attention+o kernel, then resident int8 MLP kernel)
and with the fully-unfused shipping path."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.ops.encoder_attention import encoder_attention_fused_qkv
from nobs_whisper_tpu.ops.fused_layer import encoder_layer_fused
from nobs_whisper_tpu.ops.fused_mlp import encoder_mlp_int8_resident
from nobs_whisper_tpu.ops.quant import quantize_int8


def _setup(b, h, t, d, ffn, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ln = lambda: (jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32)),
                  jnp.asarray(0.1 * rng.randn(d).astype(np.float32)))
    mkw = lambda di, do: quantize_int8(jnp.asarray(
        rng.randn(di, do).astype(np.float32) * (di ** -0.5)))
    mkb = lambda n: jnp.asarray(0.1 * rng.randn(n).astype(np.float32))
    ln1_g, ln1_b = ln()
    ln2_g, ln2_b = ln()
    return dict(x=x, ln1_g=ln1_g, ln1_b=ln1_b, ln2_g=ln2_g, ln2_b=ln2_b,
                wq=mkw(d, d), bq=mkb(d), wk=mkw(d, d), wv=mkw(d, d),
                bv=mkb(d), wo=mkw(d, d), bo=mkb(d),
                fc1=mkw(d, ffn), fc1_b=mkb(ffn),
                fc2=mkw(ffn, d), fc2_b=mkb(d))


def _composition(s, n_real, sm, h, block_q, block_f):
    a = encoder_attention_fused_qkv(
        s["x"], s["ln1_g"], s["ln1_b"], s["wq"], s["bq"], s["wk"],
        s["wv"], s["bv"], n_real, sm, h, block_q=block_q,
        wo=s["wo"], bo=s["bo"], interpret=True)
    b, t, d = a.shape
    m = encoder_mlp_int8_resident(
        a.reshape(b * t, d), s["ln2_g"], s["ln2_b"],
        s["fc1"], s["fc1_b"], s["fc2"], s["fc2_b"],
        block_m=t, block_f=block_f, interpret=True)
    return m.reshape(b, t, d)


@pytest.mark.parametrize("n_real", [256, 250])
def test_layer_matches_composition(n_real):
    b, h, t, d, ffn = 2, 4, 256, 256, 512
    s = _setup(b, h, t, d, ffn, seed=20)
    sm = float(d // h) ** -0.5
    got = encoder_layer_fused(
        s["x"], s["ln1_g"], s["ln1_b"], s["wq"], s["bq"], s["wk"],
        s["wv"], s["bv"], s["wo"], s["bo"], s["ln2_g"], s["ln2_b"],
        s["fc1"], s["fc1_b"], s["fc2"], s["fc2_b"],
        n_real, sm, h, block_q=128, block_f=256, interpret=True)
    ref = _composition(s, n_real, sm, h, block_q=128, block_f=256)
    np.testing.assert_allclose(
        np.asarray(got[:, :n_real], np.float32),
        np.asarray(ref[:, :n_real], np.float32),
        rtol=2e-2, atol=2e-2)


def test_layer_matches_unfused_shipping_path():
    """Against the fully-unfused XLA-composed layer (LN -> int8 dynamic
    projections -> btd kernel -> o -> residual -> LN -> int8 MLP)."""
    from nobs_whisper_tpu.models.whisper import _layer_norm
    from nobs_whisper_tpu.ops.encoder_attention import encoder_attention_btd
    from nobs_whisper_tpu.ops.quant import dense_int8_dynamic

    b, h, t, d, ffn = 1, 6, 128, 384, 512
    s = _setup(b, h, t, d, ffn, seed=21)
    sm = float(d // h) ** -0.5
    got = encoder_layer_fused(
        s["x"], s["ln1_g"], s["ln1_b"], s["wq"], s["bq"], s["wk"],
        s["wv"], s["bv"], s["wo"], s["bo"], s["ln2_g"], s["ln2_b"],
        s["fc1"], s["fc1_b"], s["fc2"], s["fc2_b"],
        t, sm, h, block_q=128, block_f=256, interpret=True)

    x = s["x"]
    hn = _layer_norm(x, s["ln1_g"], s["ln1_b"])
    q = dense_int8_dynamic(hn, s["wq"], s["bq"])
    k = dense_int8_dynamic(hn, s["wk"])
    v = dense_int8_dynamic(hn, s["wv"], s["bv"])
    a = encoder_attention_btd(q, k, v, t, sm, h, block_q=128,
                              interpret=True)
    x1 = x.astype(jnp.float32) + dense_int8_dynamic(
        a.astype(jnp.float32), s["wo"], s["bo"])
    m = encoder_mlp_int8_resident(
        x1.reshape(b * t, d).astype(jnp.bfloat16), s["ln2_g"],
        s["ln2_b"], s["fc1"], s["fc1_b"], s["fc2"], s["fc2_b"],
        block_m=t, block_f=256, interpret=True)
    ref = m.reshape(b, t, d)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=4e-2, atol=4e-2)


def test_layer_int8_variants_compose():
    b, h, t, d, ffn = 1, 4, 256, 256, 512
    s = _setup(b, h, t, d, ffn, seed=22)
    sm = float(d // h) ** -0.5
    got = encoder_layer_fused(
        s["x"], s["ln1_g"], s["ln1_b"], s["wq"], s["bq"], s["wk"],
        s["wv"], s["bv"], s["wo"], s["bo"], s["ln2_g"], s["ln2_b"],
        s["fc1"], s["fc1_b"], s["fc2"], s["fc2_b"],
        250, sm, h, block_q=128, block_f=256,
        int8_scores=True, int8_pv=True, interpret=True)
    ref = _composition(s, 250, sm, h, block_q=128, block_f=256)
    np.testing.assert_allclose(
        np.asarray(got[:, :250], np.float32),
        np.asarray(ref[:, :250], np.float32),
        rtol=8e-2, atol=8e-2)
