"""Whole encoder layer (LN1+qkv+attention+o+residual, then
LN2+MLP+residual) as ONE Pallas kernel — the attention half's output
never exists in HBM.

Grid (B, n_pair + 1): steps j < n_pair run one attention head-pair each
(exactly :mod:`encoder_attention`'s fused formulation — LN1 + dynamic
per-row int8 quant once per batch row into scratch, per-pair int8 q/k/v
projections, masked-dot attention, per-pair int8 o matmul accumulated
into a persistent f32 (T, d) scratch initialized to x + b_o); the FINAL
step j == n_pair consumes the accumulator in VMEM and runs the MLP half
with the resident-weight int8 formulation (LN2 + per-row quant, FFN
chunk sweep with per-(row, chunk) fc2-input quant, tanh gelu), writing
the finished layer output. Both halves are emitted once in the kernel
body under ``pl.when`` — the per-step op count stays at the existing
kernels' scale (the compile-time lever; a flat-bodied whole-layer loop
would emit ~10x the matmuls).

Per-layer HBM traffic at B=40 turbo: one (B, T, d) read + one write +
weights — vs four (B, T, d) transfers when the fused-attention and
resident-MLP kernels run back to back (~310 MB/layer deleted on top of
their own wins). MLP weights ride constant-index blocks (fetched once
per layer, not per batch row); the qkv/o pair blocks clamp their index
on the MLP step so no extra fetch happens.

Numerics: identical by construction to
``encoder_attention_fused_qkv(..., wo=...)`` followed by
``encoder_mlp_int8_resident`` (the parity tests pin this composition).
Capability reference: one transformer layer of whisper.cpp's encoder
inside state.full (src-tauri/src/whisper.rs:128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoder_attention import _make_pv, _make_scores


def _gelu_tanh(a):
    c = 0.7978845608028654  # sqrt(2/pi); Mosaic has no erf
    return 0.5 * a * (1.0 + jnp.tanh(c * (a + 0.044715 * a * a * a)))


def _layer_kernel(x_ref, g1_ref, b1n_ref,
                  wq_ref, sq_ref, bq_ref, wk_ref, sk_ref,
                  wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
                  g2_ref, b2n_ref,
                  w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                  o_ref, hq_ref, hs_ref, acc_ref, *,
                  n_pair, n_real, block_q, scale, dh, block_f, n_chunks,
                  int8_scores, int8_pv):
    j = pl.program_id(1)
    t = x_ref.shape[1]
    n_blk = t // block_q
    mm = (((1,), (0,)), ((), ()))

    @pl.when(j == 0)
    def _ln1_quant():
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (h * g1_ref[...].astype(jnp.float32)
             + b1n_ref[...].astype(jnp.float32))
        sx = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                         1e-6) / 127.0
        hq_ref[...] = jnp.clip(jnp.round(h / sx), -127, 127).astype(
            jnp.int8)
        hs_ref[...] = sx
        acc_ref[...] = xf + bo_ref[...].astype(jnp.float32)

    @pl.when(j < n_pair)
    def _attention_pair():
        hq = hq_ref[...]
        sx = hs_ref[...]

        def proj(w_ref, s_ref, bias_ref=None):
            y = jax.lax.dot_general(hq, w_ref[...], mm,
                                    preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * sx
                 * s_ref[...].astype(jnp.float32))
            if bias_ref is not None:
                y = y + bias_ref[...].astype(jnp.float32)
            return y

        q2 = proj(wq_ref, sq_ref, bq_ref)
        k2 = proj(wk_ref, sk_ref).astype(jnp.bfloat16)
        v2 = proj(wv_ref, sv_ref, bv_ref).astype(jnp.bfloat16)

        lane_lo = jax.lax.broadcasted_iota(
            jnp.int32, (1, 2 * dh), 1) < dh
        key_pad = (jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
                   >= n_real) if n_real < t else None

        scores = _make_scores(
            lambda jb: q2[jb * block_q:(jb + 1) * block_q, :],
            k2, lane_lo, key_pad, scale, block_q, int8_scores, n_real, t)
        pv = _make_pv(v2, lane_lo, n_real, t, int8_pv)
        wo = wo_ref[...]
        so = so_ref[...].astype(jnp.float32)

        def sink(jb, s01):
            a = pv(s01)
            sa = jnp.maximum(jnp.max(jnp.abs(a), axis=-1,
                                     keepdims=True), 1e-6) / 127.0
            aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
            p = jax.lax.dot_general(aq, wo, mm,
                                    preferred_element_type=jnp.int32)
            sl = slice(jb * block_q, (jb + 1) * block_q)
            acc_ref[sl, :] += p.astype(jnp.float32) * sa * so

        s_cur = scores(0)
        for jb in range(n_blk):
            s_next = scores(jb + 1) if jb + 1 < n_blk else None
            sink(jb, s_cur)
            s_cur = s_next

    @pl.when(j == n_pair)
    def _mlp():
        # round the attention half's output through bf16 exactly like
        # the two-kernel composition (the fused-attention kernel writes
        # bf16, the MLP kernel reads it) — keeps this kernel's numerics
        # pinned to the paths the parity suite already covers
        x2 = acc_ref[...].astype(jnp.bfloat16).astype(jnp.float32)
        mean = jnp.mean(x2, axis=-1, keepdims=True)
        var = jnp.var(x2, axis=-1, keepdims=True)
        h = (x2 - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (h * g2_ref[...].astype(jnp.float32)
             + b2n_ref[...].astype(jnp.float32))
        sx2 = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                          1e-6) / 127.0
        xq2 = jnp.clip(jnp.round(h / sx2), -127, 127).astype(jnp.int8)

        out = x2 + b2_ref[...].astype(jnp.float32)
        w2s = s2_ref[...].astype(jnp.float32)

        def fc1_chunk(c):
            h1 = jnp.dot(xq2, w1_ref[:, c * block_f:(c + 1) * block_f],
                         preferred_element_type=jnp.int32)
            return _gelu_tanh(
                h1.astype(jnp.float32) * sx2
                * s1_ref[:, c * block_f:(c + 1) * block_f].astype(
                    jnp.float32)
                + b1_ref[:, c * block_f:(c + 1) * block_f].astype(
                    jnp.float32))

        def fc2_chunk(c, a):
            sa = jnp.maximum(jnp.max(jnp.abs(a), axis=-1,
                                     keepdims=True), 1e-6) / 127.0
            aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
            p = jnp.dot(aq, w2_ref[c * block_f:(c + 1) * block_f, :],
                        preferred_element_type=jnp.int32)
            return p.astype(jnp.float32) * sa * w2s

        a_cur = fc1_chunk(0)
        acc = out
        for c in range(n_chunks):
            a_next = fc1_chunk(c + 1) if c + 1 < n_chunks else None
            acc = acc + fc2_chunk(c, a_cur)
            a_cur = a_next
        o_ref[0] = acc.astype(o_ref.dtype)


def encoder_layer_fused(x: jnp.ndarray, ln1_g, ln1_b,
                        wq, bq, wk, wv, bv, wo, bo,
                        ln2_g, ln2_b, fc1, fc1_b, fc2, fc2_b,
                        n_real: int, sm_scale: float, n_head: int,
                        block_q: int = 256, block_f: int = 1280,
                        int8_scores: bool = False,
                        int8_pv: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """One whole encoder layer. ``x``: (B, T, d) residual stream, T a
    ``block_q`` multiple (pad once before the layer scan); all linear
    weights int8 QTensors (ops/quant.py layout: {"q", "s"}); returns
    (B, T, d) in x.dtype. See the module docstring for the grid design;
    numerics == encoder_attention_fused_qkv(wo=...) then
    encoder_mlp_int8_resident."""
    b, t, d = x.shape
    dh = d // n_head
    assert n_head % 2 == 0 and t % block_q == 0, (n_head, t, block_q)
    assert d % 128 == 0 and 2 * dh == 128, (d, dh)
    n_pair = n_head // 2
    ffn = fc1["q"].shape[-1]
    block_f = min(block_f, ffn)
    while ffn % block_f or block_f % 128:
        block_f -= 128
        if block_f <= 0:
            block_f = ffn
            break
    n_chunks = ffn // block_f

    xspec = pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    constd = pl.BlockSpec((1, d), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    constf = pl.BlockSpec((1, ffn), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    # pair blocks: clamp the index on the MLP step (same block as the
    # last pair — consecutive equal indices skip the re-copy)
    pidx = lambda i, j: (0, jnp.minimum(j, n_pair - 1))
    wspec = pl.BlockSpec((d, 2 * dh), pidx, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 2 * dh), pidx, memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((2 * dh, d),
                         lambda i, j: (jnp.minimum(j, n_pair - 1), 0),
                         memory_space=pltpu.VMEM)
    w1spec = pl.BlockSpec((d, ffn), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)     # RESIDENT
    w2spec = pl.BlockSpec((ffn, d), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)     # RESIDENT

    r1 = lambda z: jnp.reshape(z, (1, d))
    out = pl.pallas_call(
        functools.partial(_layer_kernel, n_pair=n_pair, n_real=n_real,
                          block_q=block_q, scale=sm_scale, dh=dh,
                          block_f=block_f, n_chunks=n_chunks,
                          int8_scores=int8_scores, int8_pv=int8_pv),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        grid=(b, n_pair + 1),
        in_specs=[xspec, constd, constd,
                  wspec, cspec, cspec,               # wq, sq, bq
                  wspec, cspec,                      # wk, sk
                  wspec, cspec, cspec,               # wv, sv, bv
                  ospec, constd, constd,             # wo, so, bo
                  constd, constd,                    # ln2
                  w1spec, constf, constf,            # w1, s1, b1
                  w2spec, constd, constd],           # w2, s2, b2
        out_specs=pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.int8),            # hq (LN1'd, quant)
            pltpu.VMEM((t, 1), jnp.float32),         # hs
            pltpu.VMEM((t, d), jnp.float32),         # attention acc
        ],
        # resident MLP weights + the f32 accumulator + pipelined FFN
        # chunk activations: ~60 MB at turbo geometry with bf=1280
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, r1(ln1_g), r1(ln1_b),
      wq["q"], r1(wq["s"]), r1(bq),
      wk["q"], r1(wk["s"]),
      wv["q"], r1(wv["s"]), r1(bv),
      wo["q"], r1(wo["s"]), r1(bo),
      r1(ln2_g), r1(ln2_b),
      fc1["q"], jnp.reshape(fc1["s"], (1, ffn)),
      jnp.reshape(fc1_b, (1, ffn)),
      fc2["q"], r1(fc2["s"]), r1(fc2_b))
    return out
