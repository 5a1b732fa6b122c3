"""Int8 weight quantization + Pallas dequantizing matmul.

The decode hot loop is HBM-bandwidth-bound: every token step streams the
decoder weights (and the 66M-row logit projection) from HBM. Storing
weights as int8 with per-output-channel fp scales halves (vs bf16) the
bytes per step; the Pallas kernel dequantizes tiles in VMEM on the way
into the MXU so full-precision weights never exist in HBM.

This is also the serving-side analog of the reference registry's quantized
GGML entries (small-q5_1 / medium-q5_0 / large-v3-q5_0,
src-tauri/src/model.rs:150-188): q5/q8 checkpoints load through
core.ggml dequant and can be re-quantized here for the TPU int8 path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QTensor = Dict[str, jnp.ndarray]   # {"q": int8 (..., K, N), "s": f32 (..., 1, N)}


def quantize_int8(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric int8: w ~= q * s, s = absmax/127.

    Works on (K, N) and stacked (L, K, N) weights (channel = last axis).
    """
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def dequantize_int8(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    return (qt["q"].astype(jnp.float32) * qt["s"]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


# ---------------------------------------------------------------------------
# Pallas kernel: x (M, K) bf16/f32 @ dequant(w) -> (M, N) f32
# ---------------------------------------------------------------------------

def _q8_matmul_kernel(x_ref, q_ref, s_ref, out_ref):
    w = q_ref[...].astype(jnp.bfloat16) * s_ref[...].astype(jnp.bfloat16)
    out_ref[...] = jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)


def q8_matmul(x: jnp.ndarray, qt: QTensor, block_m: int = 256,
              block_n: int = 512, interpret: bool = False) -> jnp.ndarray:
    """(M, K) @ int8 (K, N) with per-channel scales -> (M, N) fp32.

    M and N are tiled; K (the contraction) rides whole into VMEM —
    decoder K is <= 5120, i.e. <= 2.6 MB int8 per 512-wide tile.
    """
    m, k = x.shape
    k2, n = qt["q"].shape
    assert k == k2, (k, k2)
    block_n = min(block_n, n)
    block_m = min(block_m, m)
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n))

    return pl.pallas_call(
        _q8_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, qt["q"], qt["s"])


def dense(x: jnp.ndarray, w: Union[jnp.ndarray, QTensor],
          use_kernel: bool = False) -> jnp.ndarray:
    """REFERENCE linear dispatch for the kernel A/B tests: plain arrays
    use `@`; quantized weights dequantize (XLA) or run the Pallas kernel.
    The PRODUCTION dispatcher is models/whisper.py::_dense, which adds
    bias handling and the measured kernel threshold gating — this
    simpler twin exists so test_quant.py can exercise the kernel path
    unconditionally."""
    if not is_quantized(w):
        return x @ w
    if use_kernel and x.ndim == 2 and w["q"].ndim == 2:
        return q8_matmul(x, w).astype(x.dtype)
    return x @ (w["q"].astype(x.dtype) * w["s"].astype(x.dtype))


# ---------------------------------------------------------------------------
# param-tree quantization
# ---------------------------------------------------------------------------

_QUANT_KEYS = {
    "q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w",
    "xq_w", "xk_w", "xv_w", "xo_w",
}


def dense_int8_dynamic(x: jnp.ndarray, w: QTensor,
                       b=None) -> jnp.ndarray:
    """Dynamic-activation int8 matmul on the native int8 MXU.

    v5e runs int8xint8->int32 at ~2x bf16 throughput (measured 361 TOPS vs
    193 TFLOPS). Activations are quantized per-row (absmax/127) on the
    fly; the output rescales by row and column scales. Compute-bound
    encoder layers get most of the 2x; accuracy holds because whisper's
    activations are well-conditioned per token position.
    """
    s_x = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                  keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w["q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_x * w["s"]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


_ENC_QUANT_KEYS = {"q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w"}


def quantize_encoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the encoder's linear weights for the int8-MXU path
    (conv stem, norms, and positional tables stay fp)."""
    out = dict(params)
    enc = dict(params["encoder"])
    blocks = dict(enc["blocks"])
    for key in list(blocks.keys()):
        if key in _ENC_QUANT_KEYS:
            blocks[key] = quantize_int8(blocks[key])
    enc["blocks"] = blocks
    out["encoder"] = enc
    return out


def fuse_qkv(params: Dict[str, Any]) -> Dict[str, Any]:
    """Merge the decoder's self-attention q/k/v projections into one
    (d, 3d) matmul per layer (k has no bias; a zero slot keeps the fused
    bias layout uniform). Works on plain or int8-quantized trees; the
    decoder forward splits the fused output. Fewer, wider matmuls = less
    per-step op overhead in the decode loop."""
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])

    def cat(ws, axis=-1):
        if is_quantized(ws[0]):
            return {"q": jnp.concatenate([w["q"] for w in ws], axis=axis),
                    "s": jnp.concatenate([w["s"] for w in ws], axis=axis)}
        return jnp.concatenate(ws, axis=axis)

    blocks["qkv_w"] = cat([blocks.pop("q_w"), blocks.pop("k_w"),
                           blocks.pop("v_w")])
    q_b = blocks.pop("q_b")
    v_b = blocks.pop("v_b")
    blocks["qkv_b"] = jnp.concatenate(
        [q_b, jnp.zeros_like(q_b), v_b], axis=-1)
    dec["blocks"] = blocks
    out["decoder"] = dec
    return out


def quantize_decoder_params(params: Dict[str, Any],
                            quantize_tok_emb: bool = True) -> Dict[str, Any]:
    """Quantize the decoder's linear weights (the HBM-bound decode path).

    The encoder runs once per window and is compute-bound — it stays in its
    original dtype. tok_emb doubles as the logit projection (the single
    largest per-step read) and is quantized by default.
    """
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    for key in list(blocks.keys()):
        if key in _QUANT_KEYS:
            blocks[key] = quantize_int8(blocks[key])
    dec["blocks"] = blocks
    if quantize_tok_emb:
        # stored (V, d); logits use it transposed -> scale per d-channel
        dec["tok_emb_q"] = quantize_int8(dec["tok_emb"].T)  # (d, V)
    out["decoder"] = dec
    return out
