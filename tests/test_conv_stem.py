"""Fused conv-stem kernel: interpret-mode parity with the unfused stem
(conv1 s1 -> gelu -> conv2 s2 -> gelu -> +pos), channel lane-padding,
output row padding/zeroing."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.ops.conv_stem import encoder_stem_fused, stem_reference


def _setup(b, c_in, n_frames, d, seed=0):
    rng = np.random.RandomState(seed)
    mel = jnp.asarray(rng.randn(b, c_in, n_frames).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(3, c_in, d).astype(np.float32)
                     * (3 * c_in) ** -0.5)
    b1 = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    w2 = jnp.asarray(rng.randn(3, d, d).astype(np.float32)
                     * (3 * d) ** -0.5)
    b2 = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    pos = jnp.asarray(0.1 * rng.randn(n_frames // 2, d).astype(np.float32))
    return mel, w1, b1, w2, b2, pos


@pytest.mark.parametrize("c_in", [80, 128])
def test_matches_unfused_stem(c_in):
    """80-mel (lane-padded to 128) and 128-mel (large-v3) geometries."""
    b, n_frames, d = 2, 64, 128
    mel, w1, b1, w2, b2, pos = _setup(b, c_in, n_frames, d, seed=1)
    got = encoder_stem_fused(mel, w1, b1, w2, b2, pos, n_frames // 2,
                             interpret=True)
    ref = stem_reference(mel, w1, b1, w2, b2, pos)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_padded_output_rows_are_zero():
    """t_out_pad > n_frames//2: the extra rows are exact zeros (the
    layer scan's padding contract) and the real rows still match."""
    b, c_in, n_frames, d = 1, 80, 64, 128
    mel, w1, b1, w2, b2, pos = _setup(b, c_in, n_frames, d, seed=2)
    t_pad = 48                                   # 32 real + 16 pad rows
    got = encoder_stem_fused(mel, w1, b1, w2, b2, pos, t_pad,
                             interpret=True)
    assert got.shape == (b, t_pad, d)
    ref = stem_reference(mel, w1, b1, w2, b2, pos)
    np.testing.assert_allclose(np.asarray(got[:, :32], np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)
    assert np.asarray(got[:, 32:], np.float32).max() == 0.0


def test_boundary_rows_use_zero_padding():
    """First/last output rows depend on the convs' zero padding — an
    impulse at frame 0 must reproduce the reference's edge handling."""
    b, c_in, n_frames, d = 1, 80, 32, 128
    mel, w1, b1, w2, b2, pos = _setup(b, c_in, n_frames, d, seed=3)
    mel = jnp.zeros_like(mel).at[0, :, 0].set(1.0).at[0, :, -1].set(-1.0)
    got = encoder_stem_fused(mel, w1, b1, w2, b2, pos, n_frames // 2,
                             interpret=True)
    ref = stem_reference(mel, w1, b1, w2, b2, pos)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)
