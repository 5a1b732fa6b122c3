"""Fused encoder conv stem: conv1(k3,s1) -> gelu -> conv2(k3,s2) -> gelu
-> +pos in ONE Pallas kernel per batch row.

Why: the stem's XLA lowering materializes the (B, 3000, d) conv1 output
(+ gelu) in HBM (~307 MB write + read at B=40 turbo) and pays conv
im2col/layout costs; the conv-as-shifted-matmuls formulation as an XLA
GRAPH was measured SLOWER (docs/ROADMAP.md round-3: the 3 separate f32
partial buffers cost more bandwidth than the conv lowering) — but
in-kernel those partials live in VMEM, which is exactly the
traffic-deletion pattern that won for the resident MLP and the fused
attention kernels.

Formulation: with the time axis split into even/odd half-rate streams
(done outside, fused into the mel program's epilogue by XLA), the
stride-2 stack becomes NINE aligned (T/2, C)@(C, d) matmuls plus two
one-row shifts expressible with ``pltpu.roll`` (sublane slices need
8-alignment on TPU, so the +-1 row shifts of the full buffers replace
unexpressible odd-offset slices):

    E[i] = A[2i]   = mel_O[i-1] @ w1_0 + mel_E[i] @ w1_1 + mel_O[i] @ w1_2
    O[i] = A[2i+1] = mel_E[i]   @ w1_0 + mel_O[i] @ w1_1 + mel_E[i+1] @ w1_2
    out[t] = gelu(O[t-1] @ w2_0 + E[t] @ w2_1 + O[t] @ w2_2 + b2) + pos[t]

where A is the (never materialized) conv1+gelu output and the [-1]/[+1]
boundary rows are the convs' zero padding (masked after the roll).

gelu is the tanh approximation (Mosaic has no erf; this is already the
bf16 serving path's stem gelu, models/whisper.py::_gelu_fast). Numeric
contract: the conv sums are rounded to bf16 before each gelu exactly
like the unfused path, but the gelu itself evaluates with f32
internals, where jax.nn.gelu on bf16 keeps every intermediate in bf16
— a one-ulp bf16 delta on ~40% of elements (measured), i.e. both are
valid bf16 roundings and the kernel's is the more accurate one.
Capability reference: the conv stem inside whisper.cpp's encoder
(src-tauri/src/whisper.rs:128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_tanh(a):
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * a * (1.0 + jnp.tanh(c * (a + 0.044715 * a * a * a)))


def _roll_rows(x, shift):
    """Sublane roll that Mosaic can lower for any dtype.

    tpu.dynamic_rotate is only implemented for 32-bit element types
    (measured on-chip 2026-08-19: bf16 rolls fail to compile with
    "Rotate with non-32-bit data"), so narrow dtypes round-trip
    through f32 for the shuffle. VPU cost is negligible next to the
    kernel's nine matmuls.
    """
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift=shift, axis=0)
    return pltpu.roll(x.astype(jnp.float32), shift=shift,
                      axis=0).astype(x.dtype)


def _stem_kernel(me_ref, mo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 pos_ref, o_ref, *, c, d, t_real):
    th = me_ref.shape[1]                           # padded half-length
    me = me_ref[0]                                 # (Th, C) bf16
    mo = mo_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)

    # mel_O[i-1]: row 0 = the conv1 left pad. mel_E[i+1]: row t_real-1
    # must be the RIGHT pad (mel frame n_frames), which the roll only
    # provides when there are explicit pad rows (t_out_pad > t_real) —
    # mask it (and the wrapped don't-care rows above it) to zero.
    mo_m1 = jnp.where(row == 0, jnp.zeros((), mo.dtype),
                      _roll_rows(mo, 1))
    me_p1 = jnp.where(row >= t_real - 1, jnp.zeros((), me.dtype),
                      _roll_rows(me, th - 1))  # roll(-1)

    w1_0 = w1_ref[0:c, :]
    w1_1 = w1_ref[c:2 * c, :]
    w1_2 = w1_ref[2 * c:3 * c, :]
    b1 = b1_ref[...].astype(jnp.float32)

    def mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def round_gelu(s):
        # mirror the unfused path's rounding points (conv sum + bias is
        # cast to the compute dtype BEFORE gelu): the kernel's only
        # numeric deltas vs XLA are then f32 partial-sum order and the
        # gelu's internal precision
        return _gelu_tanh(s.astype(jnp.bfloat16).astype(jnp.float32)
                          ).astype(jnp.bfloat16)

    e = round_gelu(mm(mo_m1, w1_0) + mm(me, w1_1) + mm(mo, w1_2) + b1)
    o = round_gelu(mm(me, w1_0) + mm(mo, w1_1) + mm(me_p1, w1_2) + b1)

    # O[t-1]: row 0 = the conv2 left pad (conv1's r = -1 zero row)
    o_m1 = jnp.where(row == 0, jnp.zeros((), o.dtype),
                     _roll_rows(o, 1))

    w2_0 = w2_ref[0:d, :]
    w2_1 = w2_ref[d:2 * d, :]
    w2_2 = w2_ref[2 * d:3 * d, :]
    y = round_gelu(mm(o_m1, w2_0) + mm(e, w2_1) + mm(o, w2_2)
                   + b2_ref[...].astype(jnp.float32))
    y = y + pos_ref[...].astype(y.dtype)           # bf16 add, as unfused
    # rows >= t_real are the layer-scan padding: must be zero (the
    # unfused path pads with zeros AFTER the stem)
    y = jnp.where(row < t_real, y, jnp.zeros((), y.dtype))
    o_ref[0] = y.astype(o_ref.dtype)


def encoder_stem_fused(mel: jnp.ndarray, w1, b1, w2, b2, pos,
                       t_out_pad: int, out_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jnp.ndarray:
    """mel: (B, C_in, n_frames) f32 (the mel program's output layout);
    w1: (3, C_in, d); w2: (3, d, d); b1/b2: (d,); pos: (n_frames//2, d).
    Returns (B, t_out_pad, d) in ``out_dtype`` — the encoder layer
    scan's input, already padded (zeros) to the attention kernels' T
    multiple. ``t_out_pad`` >= n_frames//2, a multiple of 8."""
    b, c_in, n_frames = mel.shape
    d = w1.shape[-1]
    t_half = n_frames // 2
    assert n_frames % 2 == 0 and t_out_pad >= t_half, (n_frames,
                                                       t_out_pad)
    assert t_out_pad % 8 == 0 and d % 128 == 0, (t_out_pad, d)
    c = -(-c_in // 128) * 128                      # lane-pad channels

    xt = jnp.swapaxes(mel, -1, -2).astype(jnp.bfloat16)  # (B, F, C_in)
    if c != c_in:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, c - c_in)))
    me = xt[:, 0::2, :]                            # (B, T/2, C)
    mo = xt[:, 1::2, :]
    if t_out_pad != t_half:
        rp = ((0, 0), (0, t_out_pad - t_half), (0, 0))
        me = jnp.pad(me, rp)
        mo = jnp.pad(mo, rp)

    w1f = jnp.asarray(w1, jnp.bfloat16)            # (3, C_in, d)
    if c != c_in:
        w1f = jnp.pad(w1f, ((0, 0), (0, c - c_in), (0, 0)))
    w1f = w1f.reshape(3 * c, d)
    w2f = jnp.asarray(w2, jnp.bfloat16).reshape(3 * d, d)
    # the kernel adds pos in bf16 (the unfused path's compute dtype);
    # shipping it as f32 would double the resident block for nothing
    posp = jnp.asarray(pos, jnp.bfloat16)
    if posp.shape[0] != t_out_pad:
        posp = jnp.pad(posp, ((0, t_out_pad - posp.shape[0]), (0, 0)))

    mspec = pl.BlockSpec((1, t_out_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, c=c, d=d, t_real=t_half),
        out_shape=jax.ShapeDtypeStruct((b, t_out_pad, d), out_dtype),
        grid=(b,),
        in_specs=[mspec, mspec,
                  const2((3 * c, d)), const2((1, d)),
                  const2((3 * d, d)), const2((1, d)),
                  const2((t_out_pad, d))],
        out_specs=pl.BlockSpec((1, t_out_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # whole-row working set: E/O/out (T/2, d) + resident w2 (3d, d)
        # bf16 — ~25 MB at turbo geometry, above the 16 MB scoped
        # default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(me, mo, w1f, jnp.reshape(jnp.asarray(b1, jnp.float32), (1, d)),
      w2f, jnp.reshape(jnp.asarray(b2, jnp.float32), (1, d)), posp)
    return out


def stem_reference(mel, w1, b1, w2, b2, pos, compute_dtype=jnp.bfloat16):
    """The unfused stem (models/whisper.py::_encode lines 208-211,
    tanh-gelu serving variant) for parity tests."""
    from ..models.whisper import _conv1d, _gelu_fast
    x = jnp.swapaxes(mel, -1, -2).astype(compute_dtype)
    x = _gelu_fast(_conv1d(x, w1, b1, stride=1))
    x = _gelu_fast(_conv1d(x, w2, b2, stride=2))
    return x + pos.astype(compute_dtype)
