"""Sample-rate conversion to Whisper's 16 kHz.

Replaces the reference's rubato FFT resampler (src-tauri/src/audio.rs:509-
563). Host path: polyphase scipy (exact rational ratios, e.g. 48k->16k);
device path: a JAX polyphase kernel so the resample can fuse with the mel
front-end when the ingest rate is known statically.
"""

from __future__ import annotations

import fractions
import functools
from typing import Optional

import numpy as np

from ..core.config import SAMPLE_RATE


def resample(audio: np.ndarray, in_rate: int,
             out_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Polyphase resample (host). Identity when rates match."""
    audio = np.asarray(audio, dtype=np.float32)
    if in_rate == out_rate:
        return audio
    from scipy.signal import resample_poly
    frac = fractions.Fraction(out_rate, in_rate)
    out = resample_poly(audio.astype(np.float64), frac.numerator,
                        frac.denominator)
    expected = int(round(len(audio) * out_rate / in_rate))
    if len(out) > expected:
        out = out[:expected]
    elif len(out) < expected:
        out = np.pad(out, (0, expected - len(out)))
    return out.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _polyphase_filter_np(up: int, down: int, taps_per_phase: int = 24):
    """Windowed-sinc anti-aliasing filter split into ``up`` phases."""
    n_taps = taps_per_phase * up
    cutoff = 1.0 / max(up, down)
    t = np.arange(n_taps) - (n_taps - 1) / 2
    h = np.sinc(t * cutoff) * cutoff * up
    h *= np.hamming(n_taps)
    # phase p uses taps h[p::up]
    return h.astype(np.float32)


def resample_jax(audio, in_rate: int, out_rate: int = SAMPLE_RATE):
    """Device-side polyphase resample as a strided matmul (MXU-friendly).

    Static rates -> static shapes; suitable for fusing ahead of the mel
    kernel when streaming at a fixed ingest rate.

    NOT numerically/length-interchangeable with the host ``resample``:
    this path returns floor(n*up/down) samples (the host pads/trims to
    round(n*out/in)) and its group-delay compensation differs by ~0.5
    input sample for integer-downsample ratios. The serving path uses
    the host/native resamplers exclusively; treat this as a fusion
    experiment surface, not a drop-in.
    """
    import jax.numpy as jnp

    if in_rate == out_rate:
        return jnp.asarray(audio, jnp.float32)
    frac = fractions.Fraction(out_rate, in_rate)
    up, down = frac.numerator, frac.denominator
    h = _polyphase_filter_np(up, down)
    n_taps = h.shape[0]
    x = jnp.asarray(audio, jnp.float32)
    n_in = x.shape[0]
    n_out = (n_in * up) // down

    # output sample j draws from upsampled index j*down; its phase is
    # (j*down) % up and the input window starts at (j*down)//up
    j = np.arange(n_out)
    phase = (j * down) % up
    taps_pp = n_taps // up
    # center the sinc (group-delay compensation): half the per-phase taps
    start = (j * down) // up + taps_pp // 2
    # gather input windows: (n_out, taps_pp)
    offs = np.arange(taps_pp)
    pad = taps_pp
    xp = jnp.pad(x, (pad, pad))
    idx = start[:, None] - offs[None, :] + pad
    windows = xp[jnp.asarray(idx)]
    # per-phase filter bank: (up, taps_pp)
    hp = np.stack([h[p::up] for p in range(up)])
    coeffs = jnp.asarray(hp)[jnp.asarray(phase)]       # (n_out, taps_pp)
    return jnp.sum(windows * coeffs, axis=1)
