"""Fused int8-KV cross-attention for the decode hot loop.

Per decode step, cross-attention re-reads the entire per-window K/V
(H x 1500 x 64 x 2 per layer per element) from HBM — the single largest
term in the token-step's byte budget. Storing K/V as int8 with
per-position scales halves that traffic; this kernel reads the int8
tensors, dequantizes in VMEM, and runs scores -> softmax -> mix in one
pass per (batch element, layer).

Quantization folds exactly:
  scores[t] = (q . Kq[t]) * ks[t]         (K scale per position)
  out       = (probs * vs) @ Vq           (V scale per position folds into
                                           the probability vector)
Positions padded to the lane-aligned T carry scale 0 and are masked to
-inf before the softmax.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QKV = Dict[str, jnp.ndarray]

_NEG = -1e30  # plain float: jnp scalars captured in kernels are rejected


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def quant_kv_padded(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp (..., T, Dh) -> (int8 (..., T_pad, Dh), scales (..., T_pad)).

    Per-position absmax quantization; T padded to a multiple of 128 with
    zero-scale (masked) positions. Leading-dim agnostic so the same
    quantization runs on a full (L, B, H, ...) stack or one layer inside
    a scan (precompute_cross_kv_q8)."""
    t = x.shape[-2]
    t_pad = _round_up(t, 128)
    lead = [(0, 0)] * (x.ndim - 2)
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)  # (...,T,1)
    s = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    q = jnp.pad(q, lead + [(0, t_pad - t), (0, 0)])
    s = jnp.pad(s[..., 0], lead + [(0, t_pad - t)])          # 0 = masked
    return q, s


def quantize_cross_kv(
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
) -> Tuple[QKV, QKV]:
    """(xk, xv) fp (L, B, H, T, Dh) -> int8 with per-position scales.

    K is stored transposed (L, B, H, Dh, T_pad) for the scores matvec;
    V stays (L, B, H, T_pad, Dh). T is padded to a multiple of 128 with
    zero-scale (masked) positions.
    """
    xk, xv = cross_kv
    kq, ks = quant_kv_padded(xk)
    vq, vs = quant_kv_padded(xv)
    return ({"q": jnp.swapaxes(kq, -1, -2), "s": ks},   # (L,B,H,Dh,Tp)
            {"q": vq, "s": vs})                          # (L,B,H,Tp,Dh)


def _xattn_kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, out_ref):
    """Grid: (B*H,) — one (element, head) pair per program, plain 2D MXU
    matmuls (Mosaic rejects batched dot_general). Blocks carry explicit
    unit dims so every blocked axis equals its array dim: q (1,1,Dh);
    kq (1,Dh,Tp); ks (1,1,Tp); vq (1,Tp,Dh); vs (1,1,Tp); out (1,1,Dh)."""
    q = q_ref[0].astype(jnp.bfloat16)                    # (1, Dh)
    kq = kq_ref[0].astype(jnp.bfloat16)                  # (Dh, Tp)
    ks = ks_ref[0]                                       # (1, Tp) f32
    dh = q.shape[-1]
    scale = float(dh) ** -0.5

    raw = jnp.dot(q, kq, preferred_element_type=jnp.float32)   # (1, Tp)
    scores = jnp.where(ks > 0, raw * ks * scale, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)              # (1, Tp) f32

    vs = vs_ref[0]                                       # (1, Tp)
    pv = (probs * vs).astype(jnp.bfloat16)               # V scale folded
    vq = vq_ref[0].astype(jnp.bfloat16)                  # (Tp, Dh)
    out = jnp.dot(pv, vq, preferred_element_type=jnp.float32)  # (1, Dh)
    out_ref[...] = out[None]


def cross_attention_decode_q8(
    q: jnp.ndarray,          # (B, H, 1, Dh) — single decode position
    kq: QKV,                 # {"q": (B,H,Dh,Tp) int8, "s": (B,H,Tp) f32}
    vq: QKV,                 # {"q": (B,H,Tp,Dh) int8, "s": (B,H,Tp) f32}
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused single-query cross-attention; returns (B, H, 1, Dh) fp32.

    NB: applies the standard 1/sqrt(dh) scaling internally (matching
    models.whisper._attention numerics).
    """
    b, h, s, dh = q.shape
    assert s == 1, "decode kernel is single-query"
    t_pad = kq["q"].shape[-1]
    bh = b * h

    out = pl.pallas_call(
        _xattn_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, 1, dh), jnp.float32),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, 1, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q.reshape(bh, 1, dh),
      kq["q"].reshape(bh, dh, t_pad),
      kq["s"].reshape(bh, 1, t_pad),
      vq["q"].reshape(bh, t_pad, dh),
      vq["s"].reshape(bh, 1, t_pad))
    return out.reshape(b, h, 1, dh)


def pack_cross_kv_bf16(
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """(xk, xv) fp (L, B, H, T, Dh) -> bf16 with K pre-transposed.

    Layout for the single-query decode kernel: K as (L,B,H,Dh,Tp) so the
    per-step scores are one (1,Dh)x(Dh,Tp) MXU matmul with NO per-step
    transpose; V as (L,B,H,Tp,Dh). T padded to a lane multiple; padded
    positions are masked by index inside the kernel (no scales needed —
    this is the full-precision variant of quantize_cross_kv)."""
    xk, xv = cross_kv
    t = xk.shape[-2]
    t_pad = _round_up(t, 128)
    kT = jnp.swapaxes(xk.astype(jnp.bfloat16), -1, -2)       # (L,B,H,Dh,T)
    kT = jnp.pad(kT, [(0, 0)] * (kT.ndim - 1) + [(0, t_pad - t)])
    v = jnp.pad(xv.astype(jnp.bfloat16),
                [(0, 0)] * (xv.ndim - 2) + [(0, t_pad - t), (0, 0)])
    # two dicts so the (xk, xv) tuple shape of plain cross_kv is preserved
    return {"kT": kT}, {"v": v}


def _xattn_bf16_kernel(t_real, scale, q_ref, kT_ref, v_ref, out_ref):
    """Grid: (B*H,). One fused scores->softmax->mix pass per (element,
    head): K and V stream through VMEM exactly once per step, the only
    HBM traffic cross-attention fundamentally needs."""
    q = q_ref[0]                                          # (1, Dh) bf16
    kT = kT_ref[0]                                        # (Dh, Tp) bf16
    raw = jnp.dot(q, kT, preferred_element_type=jnp.float32)   # (1, Tp)
    idx = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    scores = jnp.where(idx < t_real, raw * scale, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    v = v_ref[0]                                          # (Tp, Dh) bf16
    out_ref[...] = jnp.dot(probs.astype(jnp.bfloat16), v,
                           preferred_element_type=jnp.float32)[None]


def cross_attention_decode_bf16(
    q: jnp.ndarray,          # (B, H, 1, Dh) — single decode position
    packed: Dict[str, jnp.ndarray],   # {"kT": (B,H,Dh,Tp), "v": (B,H,Tp,Dh)}
    t_real: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused single-query bf16 cross-attention; returns (B, H, 1, Dh) f32.

    Applies the standard 1/sqrt(dh) scaling internally (matching
    models.whisper._attention numerics)."""
    b, h, s, dh = q.shape
    assert s == 1, "decode kernel is single-query"
    t_pad = packed["kT"].shape[-1]
    bh = b * h

    out = pl.pallas_call(
        functools.partial(_xattn_bf16_kernel, t_real, float(dh) ** -0.5),
        out_shape=jax.ShapeDtypeStruct((bh, 1, dh), jnp.float32),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, 1, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q.astype(jnp.bfloat16).reshape(bh, 1, dh),
      packed["kT"].reshape(bh, dh, t_pad),
      packed["v"].reshape(bh, t_pad, dh))
    return out.reshape(b, h, 1, dh)


def cross_attention_kt_xla(q, packed, t_real):
    """Pure-XLA cross-attention on the PACKED (Dh, Tp) K layout — the
    decode-loop DEFAULT on bf16 TPU (NWT_NO_KT_XATTN opts out): the scores
    contraction runs over the sublane Dh axis with T on lanes, no
    per-step transpose, padding masked by index."""
    kT = packed["kT"]                                      # (B,H,Dh,Tp)
    v = packed["v"]                                        # (B,H,Tp,Dh)
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhsd,bhdt->bhst", q.astype(jnp.bfloat16), kT,
        preferred_element_type=jnp.float32) * (dh ** -0.5)
    tp = kT.shape[-1]
    mask = jnp.arange(tp) < t_real
    scores = jnp.where(mask[None, None, None, :], scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32)


def cross_attention_kt_xla_grouped(q, packed, t_real):
    """Grouped variant of :func:`cross_attention_kt_xla` for beam search:
    q is (B, G, H, S, Dh) — G beams per element sharing ONE packed K/V
    (B, H, Dh, Tp) — so the dominant cross-KV HBM read happens once per
    element instead of once per beam. Returns (B, G, H, S, Dh) f32.

    Implemented as the ungrouped op on q folded to (B, H, G*S, Dh):
    softmax/masking act per (g, s) row with no cross-row interaction, so
    the fold is exact — one implementation to keep numerically in sync,
    and the 4-D einsum also lowers on XLA:CPU (the direct 5-D bf16
    einsum does not)."""
    b, g, h, s, dh = q.shape
    q4 = q.transpose(0, 2, 1, 3, 4).reshape(b, h, g * s, dh)
    out = cross_attention_kt_xla(q4, packed, t_real)
    return out.reshape(b, h, g, s, dh).transpose(0, 2, 1, 3, 4)


def cross_attention_bf16_reference(q, packed, t_real):
    """XLA fallback with identical semantics (CPU and prefill S>1)."""
    k = jnp.swapaxes(packed["kT"][..., :t_real], -1, -2)  # (B,H,T,Dh)
    v = packed["v"][..., :t_real, :]
    dh = q.shape[-1]
    scores = jnp.einsum("bhsd,bhtd->bhst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (dh ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v.astype(jnp.float32))


def cross_attention_dequant_reference(q, kq, vq):
    """XLA fallback with identical semantics (used on CPU and for S>1)."""
    k = (kq["q"].astype(jnp.float32) *
         kq["s"][..., None, :]).swapaxes(-1, -2)          # (B,H,Tp,Dh)
    v = vq["q"].astype(jnp.float32) * vq["s"][..., None]
    dh = q.shape[-1]
    scores = jnp.einsum("bhsd,bhtd->bhst", q.astype(jnp.float32), k)
    scores = scores * (dh ** -0.5)
    mask = (kq["s"] > 0)[:, :, None, :]
    scores = jnp.where(mask, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)
