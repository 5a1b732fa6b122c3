"""Whisper encoder/decoder as pure-functional JAX.

TPU-native rebuild of the inference core the reference delegates to
whisper.cpp (GGML graph executed per chunk at src-tauri/src/whisper.rs:128).
Design choices for XLA/TPU rather than a translation of the C++ graph:

- Per-layer parameters are *stacked* along a leading layer axis and the
  block stack runs under ``lax.scan`` — one trace regardless of depth, fast
  compiles for 32-layer models, and a natural axis for pipeline sharding.
- All shapes are static: mel windows are always (n_mels, 3000), the decoder
  KV cache is always (L, B, n_text_ctx, H, Dh), prefills are padded and
  masked. Nothing recompiles across utterances.
- Batches are ragged-aware via LEFT-padding: elements share uniform cache
  write positions (sliced updates, not scatters) while masks and position
  indices respect each element's own prompt length — so concurrent
  streaming sessions share one jitted step (the TPU analog of the
  reference's chunk-worker overlap, src-tauri/src/state.rs:549-607).
- Matmuls run in the param dtype (bf16 on TPU), layernorm/softmax/logits
  accumulate in fp32.

Weight layout: linear weights are stored (d_in, d_out) so ``x @ w`` feeds
the MXU directly.

Env knobs (NWT_NO_FLASH, NWT_LIB_FLASH, NWT_ATTN_BQ,
NWT_NO_INT8_MLP, NWT_INT8_QKV, NWT_XATTN_KERNEL,
NWT_Q8_KV_PALLAS, NWT_DEEP_DECODER, the *_BM/*_BF/*_BQ/*_BK block sizes,
NWT_Q8_KERNEL_MIN_BYTES) are A/B experiment toggles read at TRACE time
inside jitted callers and are NOT part of any jit cache key: set them
before the first call of the process (bench.py does), or call
``.clear_cache()`` on the jitted entry point after toggling. The
production-facing knobs (packed cross-K layout, q8 KV) are instead
derived at call level and passed as static args — see
decode/greedy.py::kt_xattn_default.
"""

from __future__ import annotations

import contextlib
import math
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import WhisperConfig

Params = Dict[str, Any]


def _precision_scope(compute_dtype):
    """fp32 compute means *real* fp32: JAX's default fp32 matmul/conv on
    TPU (and oneDNN CPU) decomposes into bf16 passes, which breaks numeric
    parity with the reference. bf16 compute keeps the fast default."""
    if compute_dtype == jnp.float32:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


# ---------------------------------------------------------------------------
# SPMD kernel override (parallel/spmd.py)
# ---------------------------------------------------------------------------

_KERNEL_OVERRIDE = threading.local()   # per-thread trace-time stack: the
                                       # override must not leak into a
                                       # concurrent trace on another thread
                                       # (e.g. a GSPMD batcher tracing while
                                       # a shard_map body compiles — the
                                       # poisoned trace would be cached
                                       # without the override in its key)


def spmd_kernel_mode() -> Optional[str]:
    """Current kernel-override mode (this thread's trace scope).

    ``None``        — default gating (single-chip Pallas kernels only when
                      the process owns exactly one TPU device; under a
                      GSPMD mesh a pallas_call has no partition rule, so
                      the gates fall back to XLA paths that shard cleanly).
    ``"tpu"``       — tracing inside a shard_map shard: each shard IS one
                      chip, so the single-chip kernels are re-enabled.
    ``"interpret"`` — force the Pallas kernels in interpret mode on any
                      backend (the CPU virtual-mesh test path).
    """
    stack = getattr(_KERNEL_OVERRIDE, "stack", None)
    return stack[-1] if stack else None


@contextlib.contextmanager
def kernel_override(mode: Optional[str]):
    """Scope a kernel-override mode around tracing (see spmd_kernel_mode)."""
    stack = getattr(_KERNEL_OVERRIDE, "stack", None)
    if stack is None:
        stack = _KERNEL_OVERRIDE.stack = []
    stack.append(mode)
    try:
        yield
    finally:
        stack.pop()


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def _gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-gelu for the bf16 serving path: measured -8 ms on the B=28
    encoder stem (erf is an expensive transcendental on the VPU; the two
    stem gelus cover 28x3000x1280 + 28x1500x1280 elements). Max deviation
    from exact gelu ~3e-4 — below bf16 rounding; same approximation the
    int8 MLP kernel already uses. The f32 oracle path keeps exact erf."""
    return jax.nn.gelu(x, approximate=True)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    # (..., T, d) -> (..., n_head, T, d_head)
    *lead, t, d = x.shape
    x = x.reshape(*lead, t, n_head, d // n_head)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    # (..., n_head, T, d_head) -> (..., T, d)
    x = jnp.moveaxis(x, -3, -2)
    *lead, t, h, dh = x.shape
    return x.reshape(*lead, t, h * dh)


def _attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Heads-first attention. q,k,v: (..., H, T, Dh); mask broadcastable to
    (..., H, Tq, Tk), True = attend."""
    dh = q.shape[-1]
    scale = dh ** -0.25
    scores = jnp.einsum(
        "...htd,...hsd->...hts", q * scale, k * scale,
        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e9))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("...hts,...hsd->...htd", probs.astype(v.dtype), v)


def _attention_kt(q: jnp.ndarray, kT: jnp.ndarray, v: jnp.ndarray,
                  mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Attention over a PRE-TRANSPOSED K (..., H, Dh, Tk) — the decode
    self-cache layout: scores contract the sublane Dh axis with Tk on
    lanes, no per-step transpose. Same math as :func:`_attention`
    (contraction dim identical, so accumulation order matches)."""
    dh = q.shape[-1]
    scale = dh ** -0.25
    scores = jnp.einsum(
        "...htd,...hds->...hts", q * scale, kT * scale,
        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e9))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("...hts,...hsd->...htd", probs.astype(v.dtype), v)


def _attention_kt_ancestry(q: jnp.ndarray, kT: jnp.ndarray,
                           v: jnp.ndarray, mask, ancestry: jnp.ndarray,
                           beam_k: int) -> jnp.ndarray:
    """Beam self-attention THROUGH ancestry pointers: the cache is
    never permuted; ``ancestry[i, t]`` names the within-element beam
    row whose written KV at position t belongs to row i's history.
    Scores/PV become grouped contractions over the K source rows with
    a one-hot ancestry mask (extra MACs = K x the tiny self-attention
    flops; the win is the DELETED per-step whole-cache permutation —
    scripts/beam_ancestry_probe.py). Exact modulo f32 reassociation
    (the mask contributes only exact-zero terms; test_beam pins token
    equality).

    q (BK, H, 1, Dh); kT (BK, H, Dh, T); v (BK, H, T, Dh);
    mask (BK, 1, 1, T); ancestry (BK, T) int32 in [0, beam_k)."""
    bk, h, s, dh = q.shape
    assert s == 1, "ancestry attention is the single-token step path"
    b = bk // beam_k
    t = kT.shape[-1]
    scale = dh ** -0.25
    qg = (q * scale).reshape(b, beam_k, h, dh)
    kg = (kT * scale).reshape(b, beam_k, h, dh, t)
    vg = v.reshape(b, beam_k, h, t, dh)
    hot = jax.nn.one_hot(ancestry.reshape(b, beam_k, t), beam_k,
                         dtype=jnp.float32, axis=-1)   # (B, Kq, T, Ks)
    s_all = jnp.einsum("bqhd,bkhdt->bqkht", qg, kg,
                       preferred_element_type=jnp.float32)
    scores = jnp.einsum("bqkht,bqtk->bqht", s_all, hot)
    if mask is not None:
        scores = jnp.where(mask.reshape(b, beam_k, 1, t), scores,
                           jnp.float32(-1e9))
    probs = jax.nn.softmax(scores, axis=-1)
    psel = jnp.einsum("bqht,bqtk->bqkht", probs.astype(v.dtype),
                      hot.astype(v.dtype))
    out = jnp.einsum("bqkht,bkhtd->bqhd", psel, vg)
    return out.reshape(bk, h, 1, dh)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            stride: int) -> jnp.ndarray:
    """x: (B, T, C_in); w: (K, C_in, C_out); SAME-style pad=1 for K=3."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig,
           compute_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """mel: (B, n_mels, 3000) -> (B, 1500, d) encoder states."""
    with _precision_scope(compute_dtype):
        return _encode(params, mel, cfg, compute_dtype)


# Jitted alias (params must be traced arguments, never closed over — a
# closure embeds the weights as HLO constants and wrecks compile time).
encode_jit = None  # assigned after definition below


def _encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig,
            compute_dtype: jnp.dtype) -> jnp.ndarray:
    enc = params["encoder"]
    gelu = _gelu_fast if compute_dtype == jnp.bfloat16 else _gelu
    # NB the conv stem runs BELOW, after the kernel gates — the fused
    # stem kernel needs them (and the attention kernels' T padding).

    n_head = cfg.n_audio_head
    # Pallas attention is the measured win here (XLA's unfused softmax
    # materializes ~1.4 GB of f32 scores per layer). Two kernels:
    # - default: the software-pipelined whole-KV kernel
    #   (ops/encoder_attention.py) — measured 543 -> 526 ms full encode
    #   at B=28 vs the tuned library flash (the library kernel's
    #   whole-sequence blocks serialize softmax against the matmuls);
    #   NWT_LIB_FLASH=1 selects the library kernel instead.
    # - library flash with TUNED blocks (whole padded sequence; the
    #   library DEFAULT blocks lose to XLA 2x — the tuning is the point).
    # NWT_NO_FLASH=1 falls back to XLA attention entirely.
    import os
    # shard_map override: inside a shard each device runs the full
    # single-chip program, so the kernels the GSPMD gates disable come
    # back on; "interpret" additionally forces them on CPU (tests).
    ko = spmd_kernel_mode()
    interp = ko == "interpret"
    use_flash = (((jax.default_backend() == "tpu"
                   and compute_dtype == jnp.bfloat16
                   and (jax.device_count() == 1 or ko == "tpu")) or interp)
                 and not os.environ.get("NWT_NO_FLASH"))
    use_lib_flash = bool(os.environ.get("NWT_LIB_FLASH")) and not interp
    # fused int8 MLP kernel (default-on for quantized encoders on TPU):
    # both matmuls on the int8 MXU, LN/gelu/requant in VMEM, fc1 output
    # never in HBM. Measured (B=16, turbo, v5e): encode 381.6 -> 319.2 ms
    # at bm=256/bf=1280; accuracy vs the XLA int8 path is at int8-noise
    # level (rel max err 1.4%, scripts/mlp_kernel_check.py).
    # (single-device only: a pallas_call under GSPMD has no partition
    # rule, so a mesh would all-gather its operands — multi-chip via
    # GSPMD keeps the XLA int8 path, which shards cleanly. The
    # shard_map serving path (parallel/spmd.py) re-enables the kernel
    # per shard via kernel_override("tpu").)
    use_int8_mlp = (((jax.default_backend() == "tpu"
                      and (jax.device_count() == 1 or ko == "tpu")
                      # the kernels' m/f tiles assume a lane-aligned
                      # model width (every real Whisper size: 384..1280,
                      # all 128-multiples); tiny-random test models
                      # (d=64) take the XLA path on a real TPU
                      and cfg.n_audio_state % 128 == 0)
                     or interp)
                    and not os.environ.get("NWT_NO_INT8_MLP"))
    # experiment flag (trace-time): fused int8 QKV + residual-o kernels.
    # MEASURED SLOWER (B=16 turbo encode 318.3 -> 370.3 ms): unlike the
    # MLP kernel, which amortizes its VPU phase (LN+quant) over 4 FFN
    # chunk steps, each QKV grid step strictly alternates VPU and MXU
    # work — XLA's split kernels pipeline the projections better. Kept
    # opt-in for re-measurement on other topologies.
    use_int8_qkv = (jax.default_backend() == "tpu"
                    and (jax.device_count() == 1 or ko == "tpu")
                    and bool(os.environ.get("NWT_INT8_QKV")))
    # flat-layout head-pair attention (ops/encoder_attention.py::
    # encoder_attention_btd): q/k/v stay in the projections' native
    # (B, T, d) layout, the residual stream is padded ONCE to the
    # kernel's T multiple before the layer scan, and the per-layer head
    # split/merge transposes + per-tensor pads disappear entirely.
    # NWT_ATTN_BHTD=1 falls back to the per-head (B, H, T, dh) kernel.
    use_btd = (use_flash and not use_lib_flash and not use_int8_qkv
               and n_head % 2 == 0
               # the head-pair blocks are 2*dh lanes wide — Mosaic needs
               # exactly 128 (every real Whisper size has dh=64; odd
               # custom models fall back to the per-head kernel, whose
               # full-dh minor blocks lower for any dh). interpret mode
               # is exempt: the CPU test path runs tiny-random models
               # (dh=16) through these kernels for coverage.
               and (2 * (cfg.n_audio_state // n_head) == 128 or interp)
               and not os.environ.get("NWT_ATTN_BHTD"))
    attn_bq = int(os.environ.get("NWT_ATTN_BQ", 0)) or 256
    # experiment knob (trace-time, like the others): int8 QK^T inside the
    # flat attention kernel — 2x MXU rate on scores, ~0.5% score noise
    attn_i8 = bool(os.environ.get("NWT_ATTN_I8"))
    # experiment knob (trace-time): int8 probs@V in the same kernel — the
    # PV half of the matmul work at the 2x int8 rate (probs quantize with
    # a fixed 127 scale, V per-head-scalar). Accuracy-priced like
    # NWT_ATTN_I8; the two compose.
    attn_i8pv = bool(os.environ.get("NWT_ATTN_I8PV"))
    # fuse LN + the q/k/v projections INTO the flat attention kernel
    # (ops/encoder_attention.py::encoder_attention_fused_qkv) — the
    # projection outputs never exist in HBM (~940 MB/layer deleted at
    # B=40 turbo) and LN+quant runs once per row instead of once per
    # projection. DEFAULT 1 since 2026-08-19: measured 1149.7 -> 1170.5x
    # RTF (B=40 turbo serving loop), composes with speculative decode
    # (k3p32: 1273.5 -> 1300.6x); numerics parity-tested vs the unfused
    # path and exercised under the dp shard_map mesh path.
    # NWT_ATTN_FUSED=0 opts out. "2" additionally fuses the o projection
    # + residual add — measured SLOWER (1143.0x: the in-kernel per-row
    # requant + row-block o matmul cost more than the (B, T, d) write
    # they delete); "3" (whole-layer, + the MLP under pl.when) measured
    # far slower (871.8x). Both kept opt-in. Quantized encoders only
    # (the consumer gates on is_quantized + head-pair dh=128 + use_btd).
    attn_fused = int(os.environ.get("NWT_ATTN_FUSED", "1") or "0")
    # experiment knob (trace-time): the whole conv stem (conv1 -> gelu ->
    # conv2 s2 -> gelu -> +pos) as ONE kernel per batch row — the
    # (B, 3000, d) conv1 output never exists in HBM and the output comes
    # out already padded for the flat attention kernels. tanh-gelu (the
    # bf16 serving stem's gelu already).
    use_fused_stem = (compute_dtype == jnp.bfloat16
                      and ((jax.default_backend() == "tpu"
                            and (jax.device_count() == 1 or ko == "tpu"))
                           or interp)
                      and bool(os.environ.get("NWT_STEM_FUSED"))
                      and enc["conv1_w"].shape[-1] % 128 == 0
                      and mel.shape[-1] % 2 == 0
                      # the stem kernel streams the full pos table; a
                      # truncated audio_ctx window takes the plain path
                      and enc["pos"].shape[0] * 2 == mel.shape[-1])
    if use_fused_stem:
        import math
        from ..ops.conv_stem import encoder_stem_fused
        t_real = mel.shape[-1] // 2
        # satisfy BOTH the attention kernels' T % block_q == 0 and the
        # stem kernel's 8-row alignment (an odd NWT_ATTN_BQ would
        # otherwise produce a non-8-aligned pad)
        align = math.lcm(attn_bq, 8) if use_btd else 8
        tp = -(-t_real // align) * align
        x = encoder_stem_fused(mel, enc["conv1_w"], enc["conv1_b"],
                               enc["conv2_w"], enc["conv2_b"],
                               enc["pos"], tp, out_dtype=compute_dtype,
                               interpret=interp)
        if not use_btd and x.shape[1] != t_real:
            x = x[:, :t_real]
    else:
        x = jnp.swapaxes(mel, -1, -2).astype(compute_dtype)  # (B,T,mels)
        x = gelu(_conv1d(x, enc["conv1_w"], enc["conv1_b"], stride=1))
        x = gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], stride=2))
        # audio_ctx truncation (whisper.cpp wparams.audio_ctx analog): a
        # shortened mel window uses the FIRST T rows of the position
        # table — a static slice, free under jit. Full-length windows
        # slice [:1500] == identity.
        x = x + enc["pos"][: x.shape[1]].astype(compute_dtype)
        t_real = x.shape[1]
        if use_btd:
            tp_btd = -(-t_real // attn_bq) * attn_bq
            if tp_btd != t_real:
                x = jnp.pad(x, ((0, 0), (0, tp_btd - t_real), (0, 0)))

    def block(x, p):
        from ..ops.quant import dense_int8_dynamic, is_quantized

        def lin(h, w, bias=None):
            # quantized encoder: dynamic-int8 activations on the int8 MXU
            # (2x bf16 matmul throughput on v5e)
            if is_quantized(w):
                return dense_int8_dynamic(h, w, bias)
            y = h @ w
            return y if bias is None else y + bias

        if use_btd and attn_fused >= 3 \
                and all(is_quantized(p[k]) for k in
                        ("q_w", "o_w", "fc1_w", "fc2_w")) \
                and 2 * (x.shape[-1] // n_head) == 128 \
                and use_int8_mlp:
            # whole-layer kernel: the attention half's output never
            # exists in HBM (ops/fused_layer.py)
            from ..ops.fused_layer import encoder_layer_fused
            dh = x.shape[-1] // n_head
            x = encoder_layer_fused(
                x, p["ln1_g"], p["ln1_b"],
                p["q_w"], p["q_b"], p["k_w"], p["v_w"], p["v_b"],
                p["o_w"], p["o_b"], p["ln2_g"], p["ln2_b"],
                p["fc1_w"], p["fc1_b"], p["fc2_w"], p["fc2_b"],
                t_real, float(dh) ** -0.5, n_head, block_q=attn_bq,
                block_f=int(os.environ.get("NWT_MLP_BF", 0)) or 1280,
                int8_scores=attn_i8, int8_pv=attn_i8pv,
                interpret=interp)
            return x, None
        if use_btd and attn_fused and is_quantized(p["q_w"]) \
                and 2 * (x.shape[-1] // n_head) == 128:
            from ..ops.encoder_attention import encoder_attention_fused_qkv
            dh = x.shape[-1] // n_head
            fuse_o = attn_fused >= 2 and is_quantized(p["o_w"])
            res = encoder_attention_fused_qkv(
                x, p["ln1_g"], p["ln1_b"],
                p["q_w"], p["q_b"], p["k_w"], p["v_w"], p["v_b"],
                t_real, float(dh) ** -0.5, n_head, block_q=attn_bq,
                int8_scores=attn_i8, int8_pv=attn_i8pv,
                wo=p["o_w"] if fuse_o else None,
                bo=p["o_b"] if fuse_o else None, interpret=interp)
            if fuse_o:
                x, a = res, None   # residual + o projection already done
            else:
                a = res
            q = k = v = None
        elif use_btd:
            # flat path: projections feed the head-pair kernel in their
            # native (B, T, d) layout — no split/merge, no per-layer pad
            # (x was padded once to the kernel's T multiple above)
            hn = _layer_norm(x, p["ln1_g"], p["ln1_b"])
            qf = lin(hn, p["q_w"], p["q_b"])
            kf = lin(hn, p["k_w"])
            vf = lin(hn, p["v_w"], p["v_b"])
            from ..ops.encoder_attention import encoder_attention_btd
            dh = qf.shape[-1] // n_head
            a = encoder_attention_btd(qf, kf, vf, t_real,
                                      float(dh) ** -0.5, n_head,
                                      block_q=attn_bq,
                                      int8_scores=attn_i8,
                                      int8_pv=attn_i8pv,
                                      interpret=interp)
            q = k = v = None
        elif use_int8_qkv and is_quantized(p["q_w"]):
            from ..ops.fused_qkv import encoder_qkv_int8
            bsz, t, d = x.shape
            bm = int(os.environ.get("NWT_QKV_BM", 0)) or 256
            qf, kf, vf = encoder_qkv_int8(
                x.reshape(bsz * t, d), p["ln1_g"], p["ln1_b"],
                p["q_w"], p["q_b"], p["k_w"], p["v_w"], p["v_b"],
                block_m=bm)
            q = _split_heads(qf.reshape(bsz, t, d), n_head)
            k = _split_heads(kf.reshape(bsz, t, d), n_head)
            v = _split_heads(vf.reshape(bsz, t, d), n_head)
        else:
            h = _layer_norm(x, p["ln1_g"], p["ln1_b"])
            q = _split_heads(lin(h, p["q_w"], p["q_b"]), n_head)
            k = _split_heads(lin(h, p["k_w"]), n_head)
            v = _split_heads(lin(h, p["v_w"], p["v_b"]), n_head)
        if use_btd:
            pass
        elif use_flash and not use_lib_flash:
            from ..ops.encoder_attention import encoder_attention
            dh = q.shape[-1]
            bsz, _, t, _ = q.shape
            # bq sweep at B=28 (scripts/attn_kernel_check.py): 256 ->
            # 524.7 ms full encode, 512 -> 526.3, 1536 (no pipeline) ->
            # 533.5; library flash 543.0
            bq = int(os.environ.get("NWT_ATTN_BQ", 0)) or 256
            tp = -(-t // bq) * bq
            pad = tp - t
            if pad:
                padding = ((0, 0), (0, 0), (0, pad), (0, 0))
                q_, k_, v_ = (jnp.pad(z, padding) for z in (q, k, v))
            else:
                q_, k_, v_ = q, k, v
            a = encoder_attention(q_, k_, v_, t, float(dh) ** -0.5,
                                  block_q=bq, interpret=interp)[..., :t, :]
            a = _merge_heads(a.astype(x.dtype))
        elif use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)
            dh = q.shape[-1]
            bsz, _, t, _ = q.shape
            tp = -(-t // 512) * 512  # pad; blocks = whole padded sequence
            blk = min(tp, 2048)      # VMEM: scores block tp^2 f32
            # sweep hooks (bench-only; read at trace time)
            bq = int(os.environ.get("NWT_FLASH_BQ", 0)) or blk
            bk = int(os.environ.get("NWT_FLASH_BK", 0)) or blk
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_k_dkv=bk, block_q_dkv=bq,
                block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
            pad = tp - t
            if pad:
                padding = ((0, 0), (0, 0), (0, pad), (0, 0))
                q_, k_, v_ = (jnp.pad(z, padding) for z in (q, k, v))
                seg = jnp.concatenate(
                    [jnp.ones((bsz, t), jnp.int32),
                     jnp.zeros((bsz, pad), jnp.int32)], axis=-1)
                a = flash_attention(q_, k_, v_,
                                    segment_ids=SegmentIds(seg, seg),
                                    causal=False, block_sizes=bs,
                                    sm_scale=float(dh) ** -0.5)[..., :t, :]
            else:
                a = flash_attention(q, k, v, causal=False, block_sizes=bs,
                                    sm_scale=float(dh) ** -0.5)
            a = _merge_heads(a.astype(x.dtype))
        else:
            a = _merge_heads(_attention(q, k, v, mask=None))
        if a is None:
            pass   # fused-o kernel already produced the residual-added x
        elif use_int8_qkv and is_quantized(p["o_w"]):
            from ..ops.fused_qkv import residual_o_int8
            bsz, t, d = x.shape
            x = residual_o_int8(
                x.reshape(bsz * t, d), a.reshape(bsz * t, d),
                p["o_w"], p["o_b"],
                block_m=int(os.environ.get("NWT_QKV_BM", 0)) or 256,
            ).reshape(bsz, t, d)
        else:
            x = x + lin(a, p["o_w"], p["o_b"])
        if use_int8_mlp and is_quantized(p["fc1_w"]):
            from ..ops.fused_mlp import (encoder_mlp_int8,
                                         encoder_mlp_int8_resident)
            bsz, t, d = x.shape
            # resident-weight variant is the default: whole w1/w2 stay
            # in VMEM across the m-tile grid (fetched once), deleting
            # the chunked kernel's ~13 MB weight re-read per m-tile
            # (~3 GB/layer at B=40). Measured: encode 466 -> 445 ms at
            # B=40, headline 1127 -> 1149x. NWT_MLP_CHUNKED=1 opts back
            # into the streaming-chunk kernel (trace-time knob).
            chunked = bool(os.environ.get("NWT_MLP_CHUNKED"))
            mlp_fn = (encoder_mlp_int8 if chunked
                      else encoder_mlp_int8_resident)
            # block defaults re-swept 2026-08-19 under the FUSED=1
            # attention (scripts/recovery_results.jsonl bench_mlp_*):
            # resident bm 256 -> 512 = 1172.8 -> 1176.5x (confirmed
            # twice); bf 1280/5120 and bm512+bf5120 all measured below
            # bm512+bf2560
            x = mlp_fn(
                x.reshape(bsz * t, d), p["ln2_g"], p["ln2_b"],
                p["fc1_w"], p["fc1_b"], p["fc2_w"], p["fc2_b"],
                block_m=(int(os.environ.get("NWT_MLP_BM", 0))
                         or (256 if chunked else 512)),
                block_f=(int(os.environ.get("NWT_MLP_BF", 0))
                         or (1280 if chunked else 2560)),
                interpret=interp,
            ).reshape(bsz, t, d)
        else:
            h = _layer_norm(x, p["ln2_g"], p["ln2_b"])
            h = gelu(lin(h, p["fc1_w"], p["fc1_b"]))
            x = x + lin(h, p["fc2_w"], p["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    if use_btd and x.shape[1] != t_real:
        x = x[:, :t_real]
    x = _layer_norm(x, enc["ln_post_g"], enc["ln_post_b"])
    return x


encode_jit = jax.jit(encode, static_argnames=("cfg", "compute_dtype"))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def precompute_cross_kv(params: Params, xa: jnp.ndarray,
                        cfg: WhisperConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder states -> per-layer cross-attention K/V.

    Returns (xk, xv): each (L, B, H, T_audio, Dh). Computed once per window —
    the decoder token loop only reads it.
    """
    dec = params["decoder"]["blocks"]
    n_head = cfg.n_text_head

    def per_layer(_, p):
        k = _split_heads(_dense(xa, p["xk_w"]), n_head)
        v = _split_heads(_dense(xa, p["xv_w"], p["xv_b"]), n_head)
        return None, (k, v)

    with _precision_scope(xa.dtype):
        _, (xk, xv) = jax.lax.scan(per_layer, None, dec)
    return xk, xv


def precompute_cross_kv_q8(params: Params, xa: jnp.ndarray,
                           cfg: WhisperConfig):
    """Fused per-layer cross-KV projection + int8 quantization.

    Same math as ``quantize_cross_kv(precompute_cross_kv(…))`` —
    quantization is per position, independent of layer stacking (the
    only observed deviation is 1-ulp scale drift from cross-program
    matmul reassociation on XLA:CPU; see test_attention_pallas) — but
    the full-precision (L, B, H, T, Dh) stack NEVER materializes: each
    scan step holds ONE layer's fp K/V (245 MB/window/layer at large-v3)
    and emits int8 + scales. This halves the dominant term in the
    decoder's HBM footprint and is what lifts the batch cap on large-v3
    (B=32 OOMs at 17.8 GB with bf16 cross-KV; docs/ROADMAP.md round-3
    batch-knee log). Returns the same ({"q","s"}, {"q","s"}) pair the
    int8 cross-attention read path consumes.
    """
    from ..ops.attention_pallas import quant_kv_padded
    dec = params["decoder"]["blocks"]
    n_head = cfg.n_text_head

    def per_layer(_, p):
        k = _split_heads(_dense(xa, p["xk_w"]), n_head)
        v = _split_heads(_dense(xa, p["xv_w"], p["xv_b"]), n_head)
        kq, ks = quant_kv_padded(k)
        vq, vs = quant_kv_padded(v)
        return None, (jnp.swapaxes(kq, -1, -2), ks, vq, vs)

    with _precision_scope(xa.dtype):
        _, (kq, ks, vq, vs) = jax.lax.scan(per_layer, None, dec)
    return ({"q": kq, "s": ks},    # (L, B, H, Dh, T_pad)
            {"q": vq, "s": vs})    # (L, B, H, T_pad, Dh)


def init_kv_cache(cfg: WhisperConfig, batch: int,
                  dtype: jnp.dtype = jnp.float32,
                  t_ctx: Optional[int] = None) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """t_ctx defaults to the model's full text context (448). Decode loops
    that know their true horizon pass t_ctx = p_max + sample_len: the
    self-attention read (the cache's whole cost) scales with the cache
    length, so a right-sized cache reads ~2.3x less HBM per step than the
    448-slot worst case.

    Layout: K is stored PRE-TRANSPOSED (L, B, H, Dh, T) so the per-step
    scores contraction runs over the sublane Dh axis with T on lanes and
    no per-step transpose (same layout win as the packed cross-K,
    docs/ROADMAP.md); V stays (L, B, H, T, Dh). Writes remain single
    slices: a step writes a (B, H, Dh, 1) column at the uniform position.
    """
    t = t_ctx or cfg.n_text_ctx
    l, h, dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim
    return (jnp.zeros((l, batch, h, dh, t), dtype),
            jnp.zeros((l, batch, h, t, dh), dtype))


def decoder_forward(
    params: Params,
    tokens: jnp.ndarray,          # (B, S) int32 — token slice
    cache_start,                  # scalar int32 — uniform cache write index
    pad_lens: jnp.ndarray,        # (B,) int32 — left-pad per element
    kv_cache: Tuple[jnp.ndarray, jnp.ndarray],
    cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cfg: WhisperConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    pos_base: Optional[jnp.ndarray] = None,    # (B,) int32
    slot_mask: Optional[jnp.ndarray] = None,   # (B, T_cache) bool
    ancestry: Optional[jnp.ndarray] = None,    # (B, T_cache) int32
    beam_k: int = 0,                           # static group size
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One decoder pass over S tokens (S=1 for the sampling hot loop,
    S=prompt length for prefill). Returns fp32 logits (B, S, V) and the
    updated KV cache.

    Ragged batches are LEFT-padded: element b's real sequence starts at
    cache index pad_lens[b]; all elements share the same cache write
    positions [cache_start, cache_start+S) (so the KV write is one slice,
    not a scatter), position embeddings are indexed by the element's own
    sequence position (cache index - pad), and self-attention masks out
    the pad region.

    Speculative decoding (decode/speculative.py) keeps the uniform-slice
    cache writes but leaves REJECTED draft slots as garbage in place of
    rewinding (a rewind would need per-row write positions — the scatter
    this layout exists to avoid). Two optional hooks support that:
    ``pos_base`` overrides the position-embedding base per row (cache
    index minus pad no longer equals sequence position once garbage
    slots create holes), and ``slot_mask`` additionally masks cache
    slots per row (False = a rejected slot nothing may attend to). Both
    default to None = exactly the non-speculative behavior.

    Beam search's ancestry mode (decode/beam.py, NWT_BEAM_ANCESTRY)
    passes ``ancestry`` (B, T_cache) + static ``beam_k``: rows never
    permute the cache; self-attention reads each position's KV from
    its ancestor row via :func:`_attention_kt_ancestry`. S must be 1.
    """
    with _precision_scope(compute_dtype):
        return _decoder_forward(params, tokens, cache_start, pad_lens,
                                kv_cache, cross_kv, cfg, compute_dtype,
                                pos_base, slot_mask, ancestry, beam_k)


def _dense(x: jnp.ndarray, w, b=None) -> jnp.ndarray:
    """Linear that accepts plain or int8-quantized weights. On TPU the
    quantized path runs the Pallas dequantizing matmul (weights stream
    from HBM as int8); elsewhere it falls back to an XLA dequant+matmul."""
    from ..ops.quant import is_quantized, q8_matmul

    if is_quantized(w):
        lead = x.shape[:-1]
        m = int(np.prod(lead)) if lead else 1
        # the Pallas kernel pays off only when the weight read dominates
        # AND the weight is big enough to beat the kernel-launch overhead
        # (fc1/fc2/logit projection). Small matrices (qkvo, ~1.6 MB int8)
        # and large-M calls (cross-kv precompute) stay in XLA where the
        # dequant fuses into the surrounding program.
        # Measured on v5e (large-v3-turbo decode loop): XLA fuses the int8
        # dequant into its matmuls better than the standalone Pallas
        # kernel at every size (incl. the 66 MB logit projection), so the
        # kernel is opt-in via NWT_Q8_KERNEL_MIN_BYTES.
        import os
        threshold = int(os.environ.get("NWT_Q8_KERNEL_MIN_BYTES", 0) or
                        (1 << 62))
        w_bytes = int(np.prod(w["q"].shape[-2:]))
        if (jax.default_backend() == "tpu" and m <= 256
                and w_bytes >= threshold):
            y = q8_matmul(x.reshape(-1, x.shape[-1]), w)
            y = y.reshape(*lead, -1).astype(x.dtype)
        else:
            y = x @ (w["q"].astype(x.dtype) * w["s"].astype(x.dtype))
    else:
        y = x @ w
    return y if b is None else y + b


def _decoder_forward(params, tokens, cache_start, pad_lens, kv_cache,
                     cross_kv, cfg, compute_dtype,
                     pos_base=None, slot_mask=None,
                     ancestry=None, beam_k=0):
    dec = params["decoder"]
    n_head = cfg.n_text_head
    b, s = tokens.shape
    # self-attention span = the CACHE's length (may be right-sized below
    # cfg.n_text_ctx); position-embedding indices clip to the pos table
    t_ctx = kv_cache[0].shape[-1]          # ck is (L, B, H, Dh, T)

    tok_emb = dec["tok_emb"]
    cache_idx = cache_start + jnp.arange(s)                     # (S,)
    if pos_base is None:
        # position embedding index = element's own sequence position
        pos_idx = jnp.clip(cache_idx[None, :] - pad_lens[:, None], 0,
                           cfg.n_text_ctx - 1)                  # (B, S)
    else:
        # speculative path: garbage slots break the cache-index ==
        # pad + sequence-position identity; the caller tracks the true
        # per-row sequence position of the block's first token
        pos_idx = jnp.clip(pos_base[:, None] + jnp.arange(s)[None, :], 0,
                           cfg.n_text_ctx - 1)                  # (B, S)
    x = (tok_emb[tokens] + dec["pos"][pos_idx]).astype(compute_dtype)

    # self-attn mask: query at cache index i attends keys j with
    # pad_lens[b] <= j <= i (left-pad region excluded)
    key_idx = jnp.arange(t_ctx)[None, None, :]                  # (1,1,T)
    q_idx = cache_idx[None, :, None]                            # (1,S,1)
    self_mask = ((key_idx <= q_idx) &
                 (key_idx >= pad_lens[:, None, None]))[:, None]  # (B,1,S,T)
    if slot_mask is not None:
        # speculative path: rejected draft slots hold garbage KVs and
        # are masked out of every future read
        self_mask = self_mask & slot_mask[:, None, None, :]

    ck, cv = kv_cache
    xk, xv = cross_kv

    def project_qkv(x, p):
        h = _layer_norm(x, p["ln1_g"], p["ln1_b"])
        if "qkv_w" in p:  # fused projection (ops.quant.fuse_qkv)
            qkv = _dense(h, p["qkv_w"], p["qkv_b"])
            q, k, v = (_split_heads(z, n_head)
                       for z in jnp.split(qkv, 3, axis=-1))
        else:
            q = _split_heads(_dense(h, p["q_w"], p["q_b"]), n_head)
            k = _split_heads(_dense(h, p["k_w"]), n_head)
            v = _split_heads(_dense(h, p["v_w"], p["v_b"]), n_head)
        return q, k, v

    def cross_and_mlp(x, p, xk_l, xv_l):
        # cross-attention (keys precomputed; optionally int8-quantized or
        # bf16-packed for the fused single-query kernel)
        h = _layer_norm(x, p["lnx_g"], p["lnx_b"])
        q = _split_heads(_dense(h, p["xq_w"], p["xq_b"]), n_head)
        if isinstance(xk_l, dict) and "kT" in xk_l:
            import os
            from ..ops.attention_pallas import (
                cross_attention_decode_bf16, cross_attention_kt_xla,
                cross_attention_kt_xla_grouped)
            packed = {"kT": xk_l["kT"], "v": xv_l["v"]}
            bq, bkv = q.shape[0], packed["kT"].shape[0]
            if bq != bkv:
                # beam search: G beams per element share ONE cross-KV —
                # the dominant HBM read happens per element, not per beam
                g = bq // bkv
                a = cross_attention_kt_xla_grouped(
                    q.reshape(bkv, g, *q.shape[1:]), packed,
                    cfg.n_audio_ctx).reshape(bq, *q.shape[1:])
            elif (os.environ.get("NWT_XATTN_KERNEL")
                    and q.shape[-2] == 1
                    and jax.default_backend() == "tpu"):
                # opt-in Pallas single-query kernel (measured ~2x slower
                # than the XLA packed-layout einsums; kept for re-tries)
                a = cross_attention_decode_bf16(q, packed, cfg.n_audio_ctx)
            else:
                # packed-layout XLA einsums: the measured decode winner
                # (no per-step K transpose; docs/ROADMAP.md round-2 log)
                a = cross_attention_kt_xla(q, packed, cfg.n_audio_ctx)
            a = a.astype(compute_dtype)
        elif isinstance(xk_l, dict):
            import os
            from ..ops.attention_pallas import (
                cross_attention_decode_q8, cross_attention_dequant_reference)
            if (q.shape[-2] == 1 and jax.default_backend() == "tpu"
                    and os.environ.get("NWT_Q8_KV_PALLAS")):
                # opt-in: measured SLOWER than the XLA fused
                # dequant-einsum on both decoder shapes (turbo B=16:
                # 0.381 vs 0.339 s; large-v3 B=32: 161.9 vs 196.6x RTF
                # — docs/ROADMAP.md round-2/round-3 logs), kept for
                # re-tries
                a = cross_attention_decode_q8(q, xk_l, xv_l)
            else:
                a = cross_attention_dequant_reference(q, xk_l, xv_l)
            a = a.astype(compute_dtype)
        else:
            a = _attention(q, xk_l.astype(compute_dtype),
                           xv_l.astype(compute_dtype), None)
        x = x + _dense(_merge_heads(a), p["xo_w"], p["xo_b"])
        # mlp (measured: XLA's fused dequant+matmul beats a hand-fused
        # Pallas MLP kernel here — see ops/fused_mlp.py, kept as an op)
        h = _layer_norm(x, p["ln2_g"], p["ln2_b"])
        h = _gelu(_dense(h, p["fc1_w"], p["fc1_b"]))
        x = x + _dense(h, p["fc2_w"], p["fc2_b"])
        return x

    import os
    if cfg.n_text_layer <= 8 and not os.environ.get("NWT_DEEP_DECODER"):
        # Unrolled layer loop with tiny IN-PLACE writes into the stacked
        # cache. Carrying the caches through lax.scan as xs/ys re-stacks
        # the whole (L,B,H,T,Dh) K/V buffers every call — measured 1.81 ->
        # 0.33 ms/token-step for turbo's 4-layer decoder on v5e. Static
        # layer slices (ck[l], xk[l]) fuse into their consumers; the only
        # cache traffic left is the (B,H,S,Dh) write and the attention
        # read itself.
        for layer in range(cfg.n_text_layer):
            p = jax.tree.map(lambda t: t[layer], dec["blocks"])
            q, k, v = project_qkv(x, p)
            kT = jnp.swapaxes(k, -1, -2)             # (B, H, Dh, S)
            ck = jax.lax.dynamic_update_slice(
                ck, kT[None].astype(ck.dtype), (layer, 0, 0, 0, cache_start))
            cv = jax.lax.dynamic_update_slice(
                cv, v[None].astype(cv.dtype), (layer, 0, 0, cache_start, 0))
            if ancestry is not None:
                a = _attention_kt_ancestry(
                    q, ck[layer].astype(compute_dtype),
                    cv[layer].astype(compute_dtype), self_mask,
                    ancestry, beam_k)
            else:
                a = _attention_kt(q, ck[layer].astype(compute_dtype),
                                  cv[layer].astype(compute_dtype),
                                  self_mask)
            x = x + _dense(_merge_heads(a), p["o_w"], p["o_b"])
            xk_l = (jax.tree.map(lambda t: t[layer], xk)
                    if isinstance(xk, dict) else xk[layer])
            xv_l = (jax.tree.map(lambda t: t[layer], xv)
                    if isinstance(xv, dict) else xv[layer])
            x = cross_and_mlp(x, p, xk_l, xv_l)
    else:
        # deep decoders (small 12 / medium 24 / large-v3 32 layers):
        # fori_loop for compile economy, with the SAME in-place stacked-
        # cache writes as the unrolled path. Carrying the caches through
        # lax.scan as xs/ys re-stacks the whole (L,B,H,T,Dh) buffers
        # every token step (measured 1.81 vs 0.33 ms/step on turbo);
        # dynamic_update_slice at the layer index keeps the write tiny.
        def layer_body(layer, carry):
            x, ck, cv = carry
            p = jax.tree.map(
                lambda t: jax.lax.dynamic_index_in_dim(
                    t, layer, keepdims=False), dec["blocks"])
            q, k, v = project_qkv(x, p)
            kT = jnp.swapaxes(k, -1, -2)             # (B, H, Dh, S)
            ck = jax.lax.dynamic_update_slice(
                ck, kT[None].astype(ck.dtype), (layer, 0, 0, 0, cache_start))
            cv = jax.lax.dynamic_update_slice(
                cv, v[None].astype(cv.dtype), (layer, 0, 0, cache_start, 0))
            ck_l = jax.lax.dynamic_index_in_dim(ck, layer, keepdims=False)
            cv_l = jax.lax.dynamic_index_in_dim(cv, layer, keepdims=False)
            if ancestry is not None:
                a = _attention_kt_ancestry(
                    q, ck_l.astype(compute_dtype),
                    cv_l.astype(compute_dtype), self_mask,
                    ancestry, beam_k)
            else:
                a = _attention_kt(q, ck_l.astype(compute_dtype),
                                  cv_l.astype(compute_dtype), self_mask)
            x = x + _dense(_merge_heads(a), p["o_w"], p["o_b"])
            xk_l = jax.tree.map(
                lambda t: jax.lax.dynamic_index_in_dim(
                    t, layer, keepdims=False), xk)
            xv_l = jax.tree.map(
                lambda t: jax.lax.dynamic_index_in_dim(
                    t, layer, keepdims=False), xv)
            x = cross_and_mlp(x, p, xk_l, xv_l)
            return x, ck, cv

        x, ck, cv = jax.lax.fori_loop(
            0, cfg.n_text_layer, layer_body, (x, ck, cv))
    x = _layer_norm(x, dec["ln_g"], dec["ln_b"])
    if "tok_emb_q" in dec:
        # quantized logit projection: the largest per-step HBM read
        logits = _dense(x.astype(jnp.float32), dec["tok_emb_q"])
        logits = logits.astype(jnp.float32)
    else:
        logits = jnp.einsum("bsd,vd->bsv", x.astype(jnp.float32),
                            tok_emb.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    return logits, (ck, cv)


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------

def sinusoids(length: int, channels: int) -> np.ndarray:
    """Encoder positional embedding (identical to openai-whisper)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment *
                            np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


def init_params(rng: jax.Array, cfg: WhisperConfig,
                dtype: jnp.dtype = jnp.float32,
                host_rng: bool = True) -> Params:
    """Random init with whisper-like scales (for tests/benchmarks).

    host_rng=True draws on the host with NumPy: on backends with slow
    remote compilation, the dozens of tiny jitted normal() programs
    otherwise dominate startup.
    """
    d = cfg.n_audio_state
    keys = iter(jax.random.split(rng, 64))
    seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]
               % (2**31 - 1))
    np_rng = np.random.RandomState(seed)

    def nrm(shape, scale=None):
        scale = scale if scale is not None else shape[-1] ** -0.5
        if host_rng:
            arr = (np_rng.randn(*shape) * scale).astype(np.float32)
            # cast on the HOST (ml_dtypes-backed numpy dtype): shipping
            # bf16 halves the multi-GB weight upload through the remote
            # tunnel vs uploading f32 and casting on device
            return jnp.asarray(arr.astype(np.dtype(dtype)))
        return (jax.random.normal(next(keys), shape, jnp.float32) *
                scale).astype(dtype)

    def enc_blocks(n_layer):
        ffn = cfg.ffn_dim
        return {
            "ln1_g": jnp.ones((n_layer, d), dtype),
            "ln1_b": jnp.zeros((n_layer, d), dtype),
            "q_w": nrm((n_layer, d, d)), "q_b": jnp.zeros((n_layer, d), dtype),
            "k_w": nrm((n_layer, d, d)),
            "v_w": nrm((n_layer, d, d)), "v_b": jnp.zeros((n_layer, d), dtype),
            "o_w": nrm((n_layer, d, d)), "o_b": jnp.zeros((n_layer, d), dtype),
            "ln2_g": jnp.ones((n_layer, d), dtype),
            "ln2_b": jnp.zeros((n_layer, d), dtype),
            "fc1_w": nrm((n_layer, d, ffn)),
            "fc1_b": jnp.zeros((n_layer, ffn), dtype),
            "fc2_w": nrm((n_layer, ffn, d)),
            "fc2_b": jnp.zeros((n_layer, d), dtype),
        }

    dec_extra = {
        "lnx_g": jnp.ones((cfg.n_text_layer, d), dtype),
        "lnx_b": jnp.zeros((cfg.n_text_layer, d), dtype),
        "xq_w": nrm((cfg.n_text_layer, d, d)),
        "xq_b": jnp.zeros((cfg.n_text_layer, d), dtype),
        "xk_w": nrm((cfg.n_text_layer, d, d)),
        "xv_w": nrm((cfg.n_text_layer, d, d)),
        "xv_b": jnp.zeros((cfg.n_text_layer, d), dtype),
        "xo_w": nrm((cfg.n_text_layer, d, d)),
        "xo_b": jnp.zeros((cfg.n_text_layer, d), dtype),
    }

    return {
        "encoder": {
            "conv1_w": nrm((3, cfg.n_mels, d), scale=(3 * cfg.n_mels) ** -0.5),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2_w": nrm((3, d, d), scale=(3 * d) ** -0.5),
            "conv2_b": jnp.zeros((d,), dtype),
            "pos": jnp.asarray(sinusoids(cfg.n_audio_ctx, d), dtype),
            "blocks": enc_blocks(cfg.n_audio_layer),
            "ln_post_g": jnp.ones((d,), dtype),
            "ln_post_b": jnp.zeros((d,), dtype),
        },
        "decoder": {
            "tok_emb": nrm((cfg.n_vocab, d), scale=d ** -0.5),
            "pos": nrm((cfg.n_text_ctx, d), scale=0.01),
            "blocks": {**enc_blocks(cfg.n_text_layer), **dec_extra},
            "ln_g": jnp.ones((d,), dtype),
            "ln_b": jnp.zeros((d,), dtype),
        },
    }


# ---- GGML name mapping ----------------------------------------------------

def _stack(tensors, names, transpose=False):
    arrs = []
    for n in names:
        a = tensors[n]
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs))


def params_from_ggml(ckpt, dtype: jnp.dtype = jnp.float32) -> Params:
    """Map whisper.cpp GGML tensor names into the stacked param tree.

    GGML linear weights arrive in numpy layout (d_out, d_in) — transposed to
    our (d_in, d_out).
    """
    t = ckpt.tensors
    cfg: WhisperConfig = ckpt.config

    def blocks(prefix, n_layer, cross):
        def s(fmt, transpose=False):
            return _stack(t, [fmt.format(prefix=prefix, i=i)
                              for i in range(n_layer)], transpose).astype(dtype)
        out = {
            "ln1_g": s("{prefix}.blocks.{i}.attn_ln.weight"),
            "ln1_b": s("{prefix}.blocks.{i}.attn_ln.bias"),
            "q_w": s("{prefix}.blocks.{i}.attn.query.weight", True),
            "q_b": s("{prefix}.blocks.{i}.attn.query.bias"),
            "k_w": s("{prefix}.blocks.{i}.attn.key.weight", True),
            "v_w": s("{prefix}.blocks.{i}.attn.value.weight", True),
            "v_b": s("{prefix}.blocks.{i}.attn.value.bias"),
            "o_w": s("{prefix}.blocks.{i}.attn.out.weight", True),
            "o_b": s("{prefix}.blocks.{i}.attn.out.bias"),
            "ln2_g": s("{prefix}.blocks.{i}.mlp_ln.weight"),
            "ln2_b": s("{prefix}.blocks.{i}.mlp_ln.bias"),
            "fc1_w": s("{prefix}.blocks.{i}.mlp.0.weight", True),
            "fc1_b": s("{prefix}.blocks.{i}.mlp.0.bias"),
            "fc2_w": s("{prefix}.blocks.{i}.mlp.2.weight", True),
            "fc2_b": s("{prefix}.blocks.{i}.mlp.2.bias"),
        }
        if cross:
            out.update({
                "lnx_g": s("{prefix}.blocks.{i}.cross_attn_ln.weight"),
                "lnx_b": s("{prefix}.blocks.{i}.cross_attn_ln.bias"),
                "xq_w": s("{prefix}.blocks.{i}.cross_attn.query.weight", True),
                "xq_b": s("{prefix}.blocks.{i}.cross_attn.query.bias"),
                "xk_w": s("{prefix}.blocks.{i}.cross_attn.key.weight", True),
                "xv_w": s("{prefix}.blocks.{i}.cross_attn.value.weight", True),
                "xv_b": s("{prefix}.blocks.{i}.cross_attn.value.bias"),
                "xo_w": s("{prefix}.blocks.{i}.cross_attn.out.weight", True),
                "xo_b": s("{prefix}.blocks.{i}.cross_attn.out.bias"),
            })
        return out

    def g(name):
        return jnp.asarray(t[name]).astype(dtype)

    # GGML conv weight numpy layout: (d_out, c_in, k) -> ours (k, c_in, d_out)
    def conv(name):
        return jnp.asarray(np.transpose(t[name], (2, 1, 0))).astype(dtype)

    return {
        "encoder": {
            "conv1_w": conv("encoder.conv1.weight"),
            "conv1_b": g("encoder.conv1.bias").reshape(-1),
            "conv2_w": conv("encoder.conv2.weight"),
            "conv2_b": g("encoder.conv2.bias").reshape(-1),
            "pos": g("encoder.positional_embedding"),
            "blocks": blocks("encoder", cfg.n_audio_layer, cross=False),
            "ln_post_g": g("encoder.ln_post.weight"),
            "ln_post_b": g("encoder.ln_post.bias"),
        },
        "decoder": {
            "tok_emb": g("decoder.token_embedding.weight"),
            "pos": g("decoder.positional_embedding"),
            "blocks": blocks("decoder", cfg.n_text_layer, cross=True),
            "ln_g": g("decoder.ln.weight"),
            "ln_b": g("decoder.ln.bias"),
        },
    }


def params_to_ggml_tensors(params: Params,
                           cfg: WhisperConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_ggml` (numpy layout, (d_out, d_in))."""
    out: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(jnp.asarray(arr, jnp.float32))
        out[name] = a.T if transpose else a

    enc, dec = params["encoder"], params["decoder"]
    put("encoder.conv1.weight", np.transpose(
        np.asarray(jnp.asarray(enc["conv1_w"], jnp.float32)), (2, 1, 0)))
    put("encoder.conv1.bias", enc["conv1_b"])
    put("encoder.conv2.weight", np.transpose(
        np.asarray(jnp.asarray(enc["conv2_w"], jnp.float32)), (2, 1, 0)))
    put("encoder.conv2.bias", enc["conv2_b"])
    put("encoder.positional_embedding", enc["pos"])
    put("encoder.ln_post.weight", enc["ln_post_g"])
    put("encoder.ln_post.bias", enc["ln_post_b"])
    put("decoder.token_embedding.weight", dec["tok_emb"])
    put("decoder.positional_embedding", dec["pos"])
    put("decoder.ln.weight", dec["ln_g"])
    put("decoder.ln.bias", dec["ln_b"])

    mapping = [
        ("ln1_g", "{p}.blocks.{i}.attn_ln.weight", False),
        ("ln1_b", "{p}.blocks.{i}.attn_ln.bias", False),
        ("q_w", "{p}.blocks.{i}.attn.query.weight", True),
        ("q_b", "{p}.blocks.{i}.attn.query.bias", False),
        ("k_w", "{p}.blocks.{i}.attn.key.weight", True),
        ("v_w", "{p}.blocks.{i}.attn.value.weight", True),
        ("v_b", "{p}.blocks.{i}.attn.value.bias", False),
        ("o_w", "{p}.blocks.{i}.attn.out.weight", True),
        ("o_b", "{p}.blocks.{i}.attn.out.bias", False),
        ("ln2_g", "{p}.blocks.{i}.mlp_ln.weight", False),
        ("ln2_b", "{p}.blocks.{i}.mlp_ln.bias", False),
        ("fc1_w", "{p}.blocks.{i}.mlp.0.weight", True),
        ("fc1_b", "{p}.blocks.{i}.mlp.0.bias", False),
        ("fc2_w", "{p}.blocks.{i}.mlp.2.weight", True),
        ("fc2_b", "{p}.blocks.{i}.mlp.2.bias", False),
    ]
    cross_mapping = [
        ("lnx_g", "{p}.blocks.{i}.cross_attn_ln.weight", False),
        ("lnx_b", "{p}.blocks.{i}.cross_attn_ln.bias", False),
        ("xq_w", "{p}.blocks.{i}.cross_attn.query.weight", True),
        ("xq_b", "{p}.blocks.{i}.cross_attn.query.bias", False),
        ("xk_w", "{p}.blocks.{i}.cross_attn.key.weight", True),
        ("xv_w", "{p}.blocks.{i}.cross_attn.value.weight", True),
        ("xv_b", "{p}.blocks.{i}.cross_attn.value.bias", False),
        ("xo_w", "{p}.blocks.{i}.cross_attn.out.weight", True),
        ("xo_b", "{p}.blocks.{i}.cross_attn.out.bias", False),
    ]

    for prefix, blocks, n_layer, maps in (
        ("encoder", enc["blocks"], cfg.n_audio_layer, mapping),
        ("decoder", dec["blocks"], cfg.n_text_layer,
         mapping + cross_mapping),
    ):
        for key, fmt, transpose in maps:
            stacked = np.asarray(jnp.asarray(blocks[key], jnp.float32))
            for i in range(n_layer):
                put(fmt.format(p=prefix, i=i), stacked[i], transpose)
    return out
