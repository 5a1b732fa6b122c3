"""Fused Pallas log-mel kernel.

The audio front-end as one TPU kernel per (batch, frame-block) grid cell:
DMA a (FRAME_BLOCK+2, 160) row-slice of PCM from HBM, run the windowed DFT
as three row-shifted MXU matmuls against split cos/sin bases (hop 160 /
width 400 means frame i = rows i, i+1 and half of row i+2 — the half-row is
handled by zero-padding the third basis block, no in-kernel reshape or lane
concat), square-add to power, project through the mel filterbank, take
log10 — intermediates never touch HBM. The whisper dynamic-range clamp
needs the global max, so the kernel emits un-normalized log10 mel and the
(cheap, fused) normalization happens outside.

Numerical contract: matches audio.mel._log_mel_single to fp32 tolerance
(same bases, same filterbank; see tests/test_mel_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import _dft_bases_np, mel_filter_bank
from ..core.config import HOP_LENGTH, N_FFT

FRAME_BLOCK = 600          # frames per grid cell (3000 = 5 blocks)
N_FREQ_PAD = 256           # 201 rfft bins zero-padded to a lane-friendly 256
LANE_PAD = 256             # 160-sample hop rows zero-padded to full lanes


@functools.lru_cache(maxsize=4)
def _padded_tables(n_mels: int):
    """Split DFT bases into 3 row blocks of 160 (block 2 zero-padded from
    80 real rows) + zero-padded mel filterbank."""
    cos_b, sin_b = _dft_bases_np(N_FFT)             # (400, 201)

    def split(b):
        # row blocks padded from 160 to LANE_PAD (the extra input lanes are
        # zero, so the garbage-free contraction stays exact)
        out = np.zeros((3, LANE_PAD, N_FREQ_PAD), np.float32)
        out[0, :160, :201] = b[0:160]
        out[1, :160, :201] = b[160:320]
        out[2, :80, :201] = b[320:400]
        return out

    melf = np.zeros((N_FREQ_PAD, n_mels), np.float32)
    melf[:201] = mel_filter_bank(n_mels).T          # (201, n_mels)
    return split(cos_b), split(sin_b), melf


def _mel_kernel(audio_ref, cos_ref, sin_ref, mel_ref, out_ref,
                rows_scratch, sem):
    """Grid: (B, n_blocks). audio_ref: (B, n_rows, 160) rows in HBM."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(i * FRAME_BLOCK, FRAME_BLOCK + 8), :],
        rows_scratch, sem)
    dma.start()
    dma.wait()

    # row-shifted views via sublane roll (sublane slices must be 8-aligned
    # on TPU, so a direct [k : k+600] is not lowerable for k=1,2)
    blk = rows_scratch[:]
    n_rows = FRAME_BLOCK + 8
    # negative shifts unsupported: -k == n_rows - k
    shifted = [blk, pltpu.roll(blk, shift=n_rows - 1, axis=0),
               pltpu.roll(blk, shift=n_rows - 2, axis=0)]

    hi = jax.lax.Precision.HIGHEST  # true fp32, not bf16 MXU passes

    def dft(basis_ref):
        acc = jnp.zeros((FRAME_BLOCK, N_FREQ_PAD), jnp.float32)
        for k in range(3):
            acc = acc + jnp.dot(shifted[k][:FRAME_BLOCK], basis_ref[k],
                                preferred_element_type=jnp.float32,
                                precision=hi)
        return acc

    re = dft(cos_ref)
    im = dft(sin_ref)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    # un-normalized log10; global clamp happens outside the kernel
    out_ref[...] = jnp.log10(jnp.maximum(mel, 1e-10))[None]


def log10_mel_pallas(audio: jnp.ndarray, n_mels: int = 80,
                     interpret: bool = False) -> jnp.ndarray:
    """(B, T) 16 kHz PCM -> (B, n_frames, n_mels) un-normalized log10 mel.

    T must be a multiple of FRAME_BLOCK*160 (pad_or_trim handles 30 s
    windows: 480000 = 5 blocks). Centered-STFT reflect padding applied here.
    """
    b, t = audio.shape
    n_frames = t // HOP_LENGTH
    if n_frames % FRAME_BLOCK:
        raise ValueError(f"frames {n_frames} not a multiple of {FRAME_BLOCK}")
    n_blocks = n_frames // FRAME_BLOCK

    pad = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_rows = n_frames + 8
    need = n_rows * HOP_LENGTH
    padded = jnp.pad(padded, ((0, 0), (0, max(need - padded.shape[1], 0))))
    rows = padded[:, :need].reshape(b, n_rows, HOP_LENGTH)
    rows = jnp.pad(rows, ((0, 0), (0, 0), (0, LANE_PAD - HOP_LENGTH)))

    cosp, sinp, melf = _padded_tables(n_mels)
    out = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_frames, n_mels), jnp.float32),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, n_mels),
            lambda bi, fi: (bi, fi, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((FRAME_BLOCK + 8, LANE_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rows, jnp.asarray(cosp), jnp.asarray(sinp), jnp.asarray(melf))
    return out


def log_mel_spectrogram_pallas(audio: jnp.ndarray, n_mels: int = 80,
                               interpret: bool = False) -> jnp.ndarray:
    """Drop-in for audio.mel.log_mel_spectrogram on 30 s windows:
    (B, T) -> (B, n_mels, n_frames), whisper-normalized."""
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    log_spec = log10_mel_pallas(audio.astype(jnp.float32), n_mels,
                                interpret=interpret)
    mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    out = jnp.swapaxes((log_spec + 4.0) / 4.0, 1, 2)
    return out[0] if squeeze else out
