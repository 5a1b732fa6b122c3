"""Fused int8 encoder attention projections.

Companion to ops/fused_mlp.py::encoder_mlp_int8 (same numerics class:
dynamic per-row int8 activations on the native int8 MXU). Two kernels:

- ``encoder_qkv_int8``: LN -> {q,k,v} = int8 matmuls, one Pallas launch.
  The XLA dynamic-int8 path materializes the LN output, the quantized
  activation copy, and three dequantized outputs as separate HBM passes;
  here x is read ONCE per row tile, LN + quantize stay in VMEM, and the
  only HBM writes are the three projection outputs.
- ``residual_o_int8``: x + o_proj(a) in one launch (quantize of a and
  the residual add stay in VMEM).

All three projection weights (d*d int8 each, 1.6 MB at d=1280) are
VMEM-resident across the whole row sweep (constant index maps), so the
weight read happens once per layer, not once per tile.

Reference capability: these are the encoder self-attention projections
of whisper.cpp's encode step (driven via state.full, reference
src-tauri/src/whisper.rs:128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_quant(x_ref, g_ref, b_ref):
    """LN over the last axis + per-row dynamic int8 quantization."""
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-6) / 127.0
    xq = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _qkv_kernel(x_ref, g_ref, b_ref,
                wq_ref, sq_ref, bq_ref,
                wk_ref, sk_ref,
                wv_ref, sv_ref, bv_ref,
                q_out, k_out, v_out):
    xq, sx = _ln_quant(x_ref, g_ref, b_ref)

    def proj(w_ref, s_ref, bias_ref, out_ref):
        y = jnp.dot(xq, w_ref[...],
                    preferred_element_type=jnp.int32)    # int8 MXU
        y = y.astype(jnp.float32) * sx * s_ref[...].astype(jnp.float32)
        if bias_ref is not None:
            y = y + bias_ref[...].astype(jnp.float32)
        out_ref[...] = y.astype(out_ref.dtype)

    proj(wq_ref, sq_ref, bq_ref, q_out)
    proj(wk_ref, sk_ref, None, k_out)                    # k has no bias
    proj(wv_ref, sv_ref, bv_ref, v_out)


def encoder_qkv_int8(x: jnp.ndarray, ln_g, ln_b,
                     wq, q_b, wk, wv, v_b,
                     block_m: int = 256,
                     interpret: bool = False):
    """x: (M, d). wq/wk/wv: int8 QTensors (d, d). Returns (q, k, v),
    each (M, d) in x.dtype, equal (mod int8 noise) to
    dense_int8_dynamic(layer_norm(x), w, b)."""
    m, d = x.shape
    block_m = min(block_m, m)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    const = lambda i: (0, 0)  # noqa: E731 - weights resident across tiles
    row = lambda i: (i, 0)    # noqa: E731
    out = pl.pallas_call(
        _qkv_kernel,
        out_shape=[jax.ShapeDtypeStruct((m_pad, d), x.dtype)] * 3,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # ln_g
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # ln_b
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),  # wq
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # sq
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # q_b
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),  # wk
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # sk
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),  # wv
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # sv
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),  # v_b
        ],
        out_specs=[pl.BlockSpec((block_m, d), row,
                                memory_space=pltpu.VMEM)] * 3,
        interpret=interpret,
    )(x, ln_g.reshape(1, d), ln_b.reshape(1, d),
      wq["q"], wq["s"].reshape(1, d), q_b.reshape(1, d),
      wk["q"], wk["s"].reshape(1, d),
      wv["q"], wv["s"].reshape(1, d), v_b.reshape(1, d))
    return tuple(o[:m] for o in out)


def _res_o_kernel(x_ref, a_ref, w_ref, s_ref, b_ref, out_ref):
    a = a_ref[...].astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                     1e-6) / 127.0
    aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    y = jnp.dot(aq, w_ref[...], preferred_element_type=jnp.int32)
    y = (y.astype(jnp.float32) * sa * s_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32))
    out_ref[...] = (x_ref[...].astype(jnp.float32) + y).astype(
        out_ref.dtype)


def residual_o_int8(x: jnp.ndarray, a: jnp.ndarray, wo, o_b,
                    block_m: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """x + o_proj(a), one launch. x, a: (M, d); wo: int8 QTensor (d, d)."""
    m, d = x.shape
    block_m = min(block_m, m)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    const = lambda i: (0, 0)  # noqa: E731
    row = lambda i: (i, 0)    # noqa: E731
    out = pl.pallas_call(
        _res_o_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), row,
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, a, wo["q"], wo["s"].reshape(1, d), o_b.reshape(1, d))
    return out[:m]


def qkv_reference(x, ln_g, ln_b, wq, q_b, wk, wv, v_b):
    """XLA dynamic-int8 reference (the shipping path numerics)."""
    from ..models.whisper import _layer_norm
    from .quant import dense_int8_dynamic

    h = _layer_norm(x, ln_g, ln_b)
    return (dense_int8_dynamic(h, wq, q_b),
            dense_int8_dynamic(h, wk),
            dense_int8_dynamic(h, wv, v_b))


def residual_o_reference(x, a, wo, o_b):
    from .quant import dense_int8_dynamic

    return (x.astype(jnp.float32)
            + dense_int8_dynamic(a, wo, o_b).astype(jnp.float32)
            ).astype(x.dtype)
