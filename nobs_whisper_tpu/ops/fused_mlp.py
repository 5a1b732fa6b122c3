"""Fused MLP kernels: LN -> fc1(int8) -> GELU -> fc2(int8) -> +residual.

Two variants:

- ``fused_mlp_q8`` (decoder, small M): one program, whole weights in
  VMEM, bf16 dequant matmuls. Measured slower than XLA in the decode
  loop; kept as an op.
- ``encoder_mlp_int8`` (encoder, M = B*1500): grid-tiled with the row
  tile resident and the FFN axis streamed in chunks; BOTH matmuls run
  int8 x int8 -> int32 on the native int8 MXU with dynamic per-row
  activation scales, and the fc1 output never exists in HBM (gelu +
  requantize happen in VMEM). Per layer the HBM traffic is exactly:
  read x (bf16), read w1+w2 (int8), write out (bf16) — the elementwise
  passes XLA materializes (LN out, fc1 out, gelu out, quantized copies)
  all disappear.
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


# ---------------------------------------------------------------------------
# encoder variant: large M, int8 MXU, FFN streamed in chunks
# ---------------------------------------------------------------------------

def _enc_mlp_kernel(n_chunks,
                    x_ref, g_ref, b_ref,
                    w1q_ref, w1s_ref, b1_ref,
                    w2q_ref, w2s_ref, b2_ref,
                    out_ref,
                    acc_ref, xq_ref, sx_ref):
    """Grid (m_tiles, n_chunks), FFN chunks innermost: the x row-tile and
    its LN+quantized form stay resident across the whole FFN sweep; w1/w2
    chunks stream through VMEM (double-buffered by the Pallas pipeline)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        x = x_ref[...].astype(jnp.float32)               # (bm, d)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (h * g_ref[...].astype(jnp.float32)
             + b_ref[...].astype(jnp.float32))
        sx = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                         1e-6) / 127.0
        xq_ref[...] = jnp.clip(jnp.round(h / sx), -127, 127).astype(
            jnp.int8)
        sx_ref[...] = sx
        # residual + fc2 bias seeded once; chunk partials accumulate below
        acc_ref[...] = x + b2_ref[...].astype(jnp.float32)

    h1 = jnp.dot(xq_ref[...], w1q_ref[...],
                 preferred_element_type=jnp.int32)       # (bm, bf) int8 MXU
    a = (h1.astype(jnp.float32) * sx_ref[...] *
         w1s_ref[...].astype(jnp.float32)
         + b1_ref[...].astype(jnp.float32))
    # tanh-gelu (Mosaic has no erf); < ~3e-4 off exact, below int8 noise
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.5 * a * (1.0 + jnp.tanh(c * (a + 0.044715 * a * a * a)))

    sa = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                     1e-6) / 127.0
    aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    p = jnp.dot(aq, w2q_ref[...],
                preferred_element_type=jnp.int32)        # (bm, d) int8 MXU
    acc_ref[...] += (p.astype(jnp.float32) * sa *
                     w2s_ref[...].astype(jnp.float32))

    @pl.when(j == n_chunks - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def encoder_mlp_int8(x: jnp.ndarray, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b,
                     block_m: int = 256, block_f: int = 640,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (M, d), M large (encoder: B*1500). fc1/fc2: int8 QTensors
    ((d, F) and (F, d) with per-output-channel scales). Returns
    x + fc2(gelu(fc1(ln(x)))) in x.dtype.

    Numerics: dynamic per-row int8 activations on both matmuls (fc2's
    input is quantized per (row, chunk), finer than the XLA path's
    per-row-over-F), tanh gelu.
    """
    import functools

    m, d = x.shape
    ffn = fc1["q"].shape[-1]
    # snap block_f to the largest 128-multiple divisor of ffn <= block_f
    # (ffn varies by model: 1536 tiny ... 5120 large)
    block_f = min(block_f, ffn)
    while ffn % block_f or block_f % 128:
        block_f -= 128
        if block_f <= 0:
            block_f = ffn
            break
    n_chunks = ffn // block_f
    block_m = min(block_m, m)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // block_m, n_chunks)

    out = pl.pallas_call(
        functools.partial(_enc_mlp_kernel, n_chunks),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),       # x (resident / i)
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),       # ln_g
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),       # ln_b
            pl.BlockSpec((d, block_f), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),       # w1 chunk
            pl.BlockSpec((1, block_f), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),       # w1 scales
            pl.BlockSpec((1, block_f), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),       # b1 chunk
            pl.BlockSpec((block_f, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),       # w2 chunk
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),       # w2 scales
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),       # b2
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),       # acc
            pltpu.VMEM((block_m, d), jnp.int8),          # xq
            pltpu.VMEM((block_m, 1), jnp.float32),       # sx
        ],
        interpret=interpret,
    )(x, ln_g.reshape(1, d), ln_b.reshape(1, d),
      fc1["q"], fc1["s"].reshape(1, ffn), fc1_b.reshape(1, ffn),
      fc2["q"], fc2["s"].reshape(1, d), fc2_b.reshape(1, d))
    return out[:m]


def _enc_mlp_res_kernel(n_chunks, block_f,
                        x_ref, g_ref, b_ref,
                        w1q_ref, w1s_ref, b1_ref,
                        w2q_ref, w2s_ref, b2_ref,
                        out_ref):
    """Resident-weight variant: grid (m_tiles,) only, the WHOLE w1/w2
    live in VMEM (their index maps are constant, so the Pallas pipeline
    fetches them once and skips the copy on every later grid step), and
    the FFN sweep is an in-kernel loop over chunks of the resident
    weights. Numerics are identical to :func:`_enc_mlp_kernel` (dynamic
    per-row x quant, per-(row, chunk) fc2-input quant, tanh gelu).

    Why: at m = B*1536 with B=40 the chunked kernel's inner-j weight
    streams re-read all ~13 MB of int8 weights per m-tile (~3 GB/layer)
    — simultaneously at the HBM floor and the int8-MXU compute floor.
    Resident weights cut per-layer HBM traffic to x in + out + 13 MB.
    The chunk loop is software-pipelined like the attention kernel:
    chunk j+1's int8 fc1 matmul is issued before chunk j's gelu/requant
    VPU phase so Mosaic can overlap the MXU and VPU streams.
    """
    x = x_ref[...].astype(jnp.float32)                   # (bm, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = (h * g_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32))
    sx = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-6) / 127.0
    xq = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)

    acc = x + b2_ref[...].astype(jnp.float32)            # (bm, d)

    def fc1_chunk(j):
        h1 = jnp.dot(xq, w1q_ref[:, j * block_f:(j + 1) * block_f],
                     preferred_element_type=jnp.int32)   # int8 MXU
        a = (h1.astype(jnp.float32) * sx *
             w1s_ref[:, j * block_f:(j + 1) * block_f].astype(jnp.float32)
             + b1_ref[:, j * block_f:(j + 1) * block_f].astype(
                 jnp.float32))
        c = 0.7978845608028654  # sqrt(2/pi); Mosaic has no erf
        return 0.5 * a * (1.0 + jnp.tanh(c * (a + 0.044715 * a * a * a)))

    w2s = w2s_ref[...].astype(jnp.float32)               # (1, d)

    def fc2_chunk(j, a):
        sa = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True),
                         1e-6) / 127.0
        aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
        p = jnp.dot(aq, w2q_ref[j * block_f:(j + 1) * block_f, :],
                    preferred_element_type=jnp.int32)    # int8 MXU
        return p.astype(jnp.float32) * sa * w2s

    a_cur = fc1_chunk(0)
    for j in range(n_chunks):
        a_next = fc1_chunk(j + 1) if j + 1 < n_chunks else None
        acc += fc2_chunk(j, a_cur)
        a_cur = a_next

    out_ref[...] = acc.astype(out_ref.dtype)


def encoder_mlp_int8_resident(x: jnp.ndarray, ln_g, ln_b, fc1, fc1_b,
                              fc2, fc2_b, block_m: int = 256,
                              block_f: int = 640,
                              interpret: bool = False) -> jnp.ndarray:
    """Resident-weight twin of :func:`encoder_mlp_int8` (same signature,
    same numerics contract). Needs ~2x the weight bytes of VMEM
    headroom (w1+w2 int8 double-buffered) — fine for every Whisper
    encoder (large-v3: 13 MB), gated by the raised vmem limit."""
    import functools

    m, d = x.shape
    ffn = fc1["q"].shape[-1]
    block_f = min(block_f, ffn)
    while ffn % block_f or block_f % 128:
        block_f -= 128
        if block_f <= 0:
            block_f = ffn
            break
    n_chunks = ffn // block_f
    block_m = min(block_m, m)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // block_m,)

    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_enc_mlp_res_kernel, n_chunks, block_f),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # x (per tile)
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ffn), const,
                         memory_space=pltpu.VMEM),       # w1 RESIDENT
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ffn), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ffn, d), const,
                         memory_space=pltpu.VMEM),       # w2 RESIDENT
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_g.reshape(1, d), ln_b.reshape(1, d),
      fc1["q"], fc1["s"].reshape(1, ffn), fc1_b.reshape(1, ffn),
      fc2["q"], fc2["s"].reshape(1, d), fc2_b.reshape(1, d))
    return out[:m]


def encoder_mlp_reference(x, ln_g, ln_b, fc1, fc1_b, fc2, fc2_b):
    """XLA dynamic-int8 reference (the shipping encoder path numerics,
    models/whisper.py::block) for parity-testing the fused kernel."""
    from ..models.whisper import _gelu, _layer_norm
    from .quant import dense_int8_dynamic

    h = _layer_norm(x, ln_g, ln_b)
    a = _gelu(dense_int8_dynamic(h, fc1, fc1_b))
    o = dense_int8_dynamic(a, fc2, fc2_b)
    return (x.astype(jnp.float32) + o.astype(jnp.float32)).astype(x.dtype)
