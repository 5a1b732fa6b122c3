"""Fused decoder-MLP kernel: LN -> fc1(int8) -> GELU -> fc2(int8) -> +res.

One Pallas launch replaces ~6 XLA ops + 2 dequant matmuls in the decode
hot loop. For large-v3-turbo the int8 weights (2 x 6.5 MB) are VMEM-
resident for the single-program call, so per-step HBM traffic is exactly
one int8 weight read + the (tiny) activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_mlp_kernel(x_ref, ln_g_ref, ln_b_ref,
                      fc1q_ref, fc1s_ref, fc1b_ref,
                      fc2q_ref, fc2s_ref, fc2b_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)                  # (M, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * ln_g_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(
        jnp.float32)

    w1 = fc1q_ref[...].astype(jnp.bfloat16) * fc1s_ref[...].astype(
        jnp.bfloat16)
    a = jnp.dot(h.astype(jnp.bfloat16), w1,
                preferred_element_type=jnp.float32)
    a = a + fc1b_ref[...].astype(jnp.float32)
    # Mosaic implements neither erfc nor erf; tanh-gelu deviates from the
    # exact form by <~3e-4 — below bf16 rounding and the int8 weight noise
    # already accepted on this path
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.5 * a * (1.0 + jnp.tanh(c * (a + 0.044715 * a * a * a)))

    w2 = fc2q_ref[...].astype(jnp.bfloat16) * fc2s_ref[...].astype(
        jnp.bfloat16)
    o = jnp.dot(a.astype(jnp.bfloat16), w2,
                preferred_element_type=jnp.float32)
    o = o + fc2b_ref[...].astype(jnp.float32)
    out_ref[...] = (x + o).astype(out_ref.dtype)


def fused_mlp_q8(x: jnp.ndarray, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
                 interpret: bool = False) -> jnp.ndarray:
    """x: (M, d) with M small (decode step). fc1/fc2: int8 QTensors.
    Returns x + fc2(gelu(fc1(ln(x)))) in x.dtype."""
    m, d = x.shape
    ffn = fc1["q"].shape[-1]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fused_mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        in_specs=[vspec] * 9,
        out_specs=vspec,
        interpret=interpret,
    )(x, ln_g.reshape(1, d), ln_b.reshape(1, d),
      fc1["q"], fc1["s"].reshape(1, ffn), fc1_b.reshape(1, ffn),
      fc2["q"], fc2["s"].reshape(1, d), fc2_b.reshape(1, d))


def mlp_reference(x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b):
    """XLA reference with identical numerics contract."""
    from ..models.whisper import _gelu, _layer_norm
    from .quant import dequantize_int8

    h = _layer_norm(x, ln_g, ln_b)
    w1 = dequantize_int8(fc1, jnp.bfloat16)
    a = jnp.dot(h.astype(jnp.bfloat16), w1,
                preferred_element_type=jnp.float32) + fc1_b
    a = _gelu(a)
    w2 = dequantize_int8(fc2, jnp.bfloat16)
    o = jnp.dot(a.astype(jnp.bfloat16), w2,
                preferred_element_type=jnp.float32) + fc2_b
    return (x.astype(jnp.float32) + o).astype(x.dtype)
