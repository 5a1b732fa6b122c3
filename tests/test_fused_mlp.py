"""Fused MLP kernel vs XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.ops.fused_mlp import fused_mlp_q8, mlp_reference
from nobs_whisper_tpu.ops.quant import quantize_int8


def test_fused_mlp_matches_reference():
    rng = np.random.RandomState(0)
    d, ffn, m = 128, 512, 8
    x = jnp.asarray(rng.randn(m, d).astype(np.float32) * 0.5)
    ln_g = jnp.asarray(np.ones(d, np.float32))
    ln_b = jnp.asarray(np.zeros(d, np.float32))
    fc1 = quantize_int8(jnp.asarray(rng.randn(d, ffn).astype(np.float32) * 0.05))
    fc1_b = jnp.asarray(rng.randn(ffn).astype(np.float32) * 0.01)
    fc2 = quantize_int8(jnp.asarray(rng.randn(ffn, d).astype(np.float32) * 0.05))
    fc2_b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.01)

    ref = np.asarray(mlp_reference(x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b))
    got = np.asarray(fused_mlp_q8(x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
                                  interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fused_mlp_bf16_io():
    rng = np.random.RandomState(1)
    d, ffn, m = 128, 256, 4
    x = jnp.asarray(rng.randn(m, d).astype(np.float32)).astype(jnp.bfloat16)
    ln_g = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    fc1 = quantize_int8(jnp.asarray(rng.randn(d, ffn).astype(np.float32) * 0.05))
    fc2 = quantize_int8(jnp.asarray(rng.randn(ffn, d).astype(np.float32) * 0.05))
    zb1 = jnp.zeros((ffn,), jnp.float32)
    zb2 = jnp.zeros((d,), jnp.float32)
    out = fused_mlp_q8(x, ln_g, ln_b, fc1, zb1, fc2, zb2, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = mlp_reference(x, ln_g, ln_b, fc1, zb1, fc2, zb2)
    assert np.abs(np.asarray(out, np.float32) -
                  np.asarray(ref, np.float32)).max() < 0.1


def test_encoder_mlp_int8_matches_reference():
    """Fused encoder MLP (interpret) vs the XLA dynamic-int8 path.

    Differences allowed: tanh vs exact gelu, per-(row,chunk) vs per-row
    fc2 input scales, bf16 MXU vs int8 — all sub-1e-2 on unit-scale data."""
    import numpy as np
    import jax.numpy as jnp
    from nobs_whisper_tpu.ops.fused_mlp import (encoder_mlp_int8,
                                                encoder_mlp_reference)
    from nobs_whisper_tpu.ops.quant import quantize_int8

    rng = np.random.RandomState(0)
    m, d, f = 300, 256, 512          # m not a multiple of block_m: pads
    x = jnp.asarray(rng.randn(m, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    fc1 = quantize_int8(jnp.asarray(
        rng.randn(d, f).astype(np.float32) * (d ** -0.5)))
    fc1_b = jnp.asarray(0.1 * rng.randn(f).astype(np.float32))
    fc2 = quantize_int8(jnp.asarray(
        rng.randn(f, d).astype(np.float32) * (f ** -0.5)))
    fc2_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))

    ref = np.asarray(encoder_mlp_reference(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b), np.float32)
    got = np.asarray(encoder_mlp_int8(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
        block_m=128, block_f=128, interpret=True), np.float32)
    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 0.05, err


def test_encoder_mlp_int8_resident_matches_chunked():
    """Resident-weight variant must be numerically IDENTICAL to the
    chunked kernel (same per-(row,chunk) scales, same tanh gelu) and
    close to the XLA reference."""
    from nobs_whisper_tpu.ops.fused_mlp import (encoder_mlp_int8,
                                                encoder_mlp_int8_resident,
                                                encoder_mlp_reference)

    rng = np.random.RandomState(2)
    m, d, f = 300, 256, 512          # m not a multiple of block_m: pads
    x = jnp.asarray(rng.randn(m, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ln_g = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    fc1 = quantize_int8(jnp.asarray(
        rng.randn(d, f).astype(np.float32) * (d ** -0.5)))
    fc1_b = jnp.asarray(0.1 * rng.randn(f).astype(np.float32))
    fc2 = quantize_int8(jnp.asarray(
        rng.randn(f, d).astype(np.float32) * (f ** -0.5)))
    fc2_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))

    chunked = np.asarray(encoder_mlp_int8(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
        block_m=128, block_f=128, interpret=True), np.float32)
    resident = np.asarray(encoder_mlp_int8_resident(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
        block_m=128, block_f=128, interpret=True), np.float32)
    np.testing.assert_allclose(resident, chunked, rtol=0, atol=1e-5)

    ref = np.asarray(encoder_mlp_reference(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b), np.float32)
    assert np.abs(resident - ref).max() < 0.05


def test_encoder_mlp_resident_block_f_snap():
    """block_f larger than ffn (the tiny-config case under the
    production bf=2560 default) must snap to ffn and still match."""
    from nobs_whisper_tpu.ops.fused_mlp import (encoder_mlp_int8_resident,
                                                encoder_mlp_reference)

    rng = np.random.RandomState(3)
    m, d, f = 160, 128, 384
    x = jnp.asarray(rng.randn(m, d).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    ln_g = jnp.asarray(np.ones(d, np.float32))
    ln_b = jnp.asarray(np.zeros(d, np.float32))
    fc1 = quantize_int8(jnp.asarray(
        rng.randn(d, f).astype(np.float32) * (d ** -0.5)))
    fc1_b = jnp.asarray(0.1 * rng.randn(f).astype(np.float32))
    fc2 = quantize_int8(jnp.asarray(
        rng.randn(f, d).astype(np.float32) * (f ** -0.5)))
    fc2_b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))

    got = np.asarray(encoder_mlp_int8_resident(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
        block_m=128, block_f=2560, interpret=True), np.float32)
    ref = np.asarray(encoder_mlp_reference(
        x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b), np.float32)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 0.05
