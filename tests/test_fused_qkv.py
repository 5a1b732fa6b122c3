"""Interpret-mode parity of the fused int8 QKV / residual-o kernels vs
the XLA dynamic-int8 path (the shipping encoder numerics)."""

import numpy as np
import jax.numpy as jnp

from nobs_whisper_tpu.ops.fused_qkv import (encoder_qkv_int8,
                                            qkv_reference,
                                            residual_o_int8,
                                            residual_o_reference)
from nobs_whisper_tpu.ops.quant import quantize_int8


def _mk(seed=0, m=300, d=256):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    ws = [quantize_int8(jnp.asarray(
        rng.randn(d, d).astype(np.float32) * (d ** -0.5)))
        for _ in range(4)]
    q_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    v_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    return x, ln_g, ln_b, ws, q_b, v_b


def test_encoder_qkv_int8_matches_reference():
    x, ln_g, ln_b, (wq, wk, wv, _), q_b, v_b = _mk()
    ref = qkv_reference(x, ln_g, ln_b, wq, q_b, wk, wv, v_b)
    got = encoder_qkv_int8(x, ln_g, ln_b, wq, q_b, wk, wv, v_b,
                           block_m=128, interpret=True)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        err = np.abs(np.asarray(g, np.float32)
                     - np.asarray(r, np.float32)).max()
        assert err < 0.05, err


def test_residual_o_int8_matches_reference():
    x, _, _, (_, _, _, wo), _, _ = _mk(seed=1)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    o_b = jnp.asarray(0.1 * rng.randn(x.shape[1]).astype(np.float32))
    ref = residual_o_reference(x, a, wo, o_b)
    got = residual_o_int8(x, a, wo, o_b, block_m=128, interpret=True)
    assert got.shape == ref.shape
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(ref, np.float32)).max()
    assert err < 0.05, err
