"""Batched beam-search decoding (beam_size=5 parity path).

whisper.cpp exposes beam sampling next to greedy (the reference pins greedy
via ``Greedy{best_of:1}``, src-tauri/src/whisper.rs:88, but the engine
capability includes beam=5 + temperature fallback). Semantics follow
openai-whisper's BeamSearchDecoder exactly (oracle-tested in
tests/test_decode.py): per step each beam's top-(K+1) tokens are candidates,
eot candidates retire into a finished pool that fills WITHOUT replacement
(first K finishers kept), top-K non-eot survive as the next actives; search
ends when K sequences finished or the token budget is out (then the pool is
topped up with the best actives); final pick = highest cum/len.

Everything runs on device in one jitted while_loop: beams are a flattened
batch axis (B*K) through the same decoder/rules as greedy; the KV cache is
gathered along the beam axis on reorder.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import WhisperConfig
from ..models.whisper import decoder_forward, init_kv_cache, precompute_cross_kv
from .greedy import WindowResult, kt_xattn_default, pad_prompts
from .rules import RuleTables, apply_logit_rules

NEG = jnp.float32(-1e30)


def beam_step(
    cum_logprob: jnp.ndarray,     # (B, K) active beam scores
    step_logprobs: jnp.ndarray,   # (B, K, V) masked log-softmax this step
    fin_valid: jnp.ndarray,       # (B, K) bool — filled pool slots
    eot: int,
    first_step: jnp.ndarray,      # scalar bool — only beam 0 is live
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray]:
    """Pure beam bookkeeping for one step, openai-BeamSearchDecoder exact
    (decoding.py::BeamSearchDecoder.update, which whisper.cpp mirrors):

    - active beams = best K non-eot candidates by cumulative score
    - an eot candidate finishes only if it outranks the K-th active
      candidate (openai iterates candidates best-first and STOPS once K
      actives are saved, so lower-ranked eots are never collected; that
      rank bound also implies membership in its beam's top-(K+1) topk)
    - the finished pool fills WITHOUT replacement: new finishers (best
      first) take empty slots only — once K sequences finished, later
      (even better) finishers are discarded, and the search stops

    Returns (src_beam (B,K), new_token (B,K), new_cum (B,K),
             fin_slot (B,K) pool slot for the j-th best new finisher
             (>=K = dropped), fin_src (B,K) its source beam,
             fin_score (B,K) its cumulative score incl. eot).
    """
    b, k, v = step_logprobs.shape
    # at the first step all K beams are identical clones — expand only
    # beam 0 (openai dedups identical sequences via its dict keys)
    live = jnp.where(first_step,
                     jnp.arange(k)[None, :] == 0,
                     jnp.ones((b, k), bool))
    cand = jnp.where(live[..., None], cum_logprob[..., None] + step_logprobs,
                     NEG)                                  # (B, K, V)
    flat = cand.reshape(b, k * v)

    # top 2K joint candidates: the true top-K non-eot all sit inside
    # (at most one eot per beam can outrank any of them)
    scores2k, idx2k = jax.lax.top_k(flat, 2 * k)           # (B, 2K)
    src2k = idx2k // v
    tok2k = idx2k % v
    is_eot = tok2k == eot

    # --- new active beams: best K non-eot candidates ---
    active_scores = jnp.where(is_eot, NEG, scores2k)
    a_scores, a_idx = jax.lax.top_k(active_scores, k)      # (B, K)
    src_beam = jnp.take_along_axis(src2k, a_idx, axis=1)
    new_token = jnp.take_along_axis(tok2k, a_idx, axis=1)
    new_cum = a_scores

    # --- new finishers: eot candidates outranking the K-th active ---
    eot_lp = step_logprobs[..., eot]
    eligible = live & (cum_logprob + eot_lp > a_scores[:, -1:])
    fin_cand = jnp.where(eligible, cum_logprob + eot_lp, NEG)  # (B, K)

    # append best-first into empty pool slots (no replacement)
    order = jnp.argsort(-fin_cand, axis=1)                 # (B, K) beam ids
    fin_score = jnp.take_along_axis(fin_cand, order, axis=1)
    pool_size = jnp.sum(fin_valid, axis=1, keepdims=True)  # (B, 1)
    fin_slot = pool_size + jnp.arange(k)[None, :]          # (B, K)
    fin_slot = jnp.where(fin_score > NEG / 2, fin_slot, k)  # k = dropped
    return src_beam, new_token, new_cum, fin_slot, order, fin_score


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "sample_len",
                              "compute_dtype", "packed_kv"))
def beam_decode_window_jit(
    params,
    xa: jnp.ndarray,              # (B, T_audio, d)
    prompt_tokens: jnp.ndarray,   # (B, P) LEFT-padded
    pad_lens: jnp.ndarray,        # (B,)
    sot_idx: jnp.ndarray,         # (B,) cache index of <|sot|>
    tables: RuleTables,
    cfg: WhisperConfig,
    beam_size: int,
    sample_len: int,
    compute_dtype=jnp.float32,
    packed_kv: bool = False,      # beam-shared packed (Dh,T) cross-KV;
                                  # callers derive the effective value
                                  # with greedy.kt_xattn_default() so env
                                  # toggles hit the jit cache key
):
    b, p_max = prompt_tokens.shape
    k = beam_size
    bk = b * k

    # replicate audio/prompt across beams -> flattened (B*K, ...)
    def rep(x):
        return jnp.repeat(x, k, axis=0)

    cross_kv = precompute_cross_kv(params, xa, cfg)
    if packed_kv:
        # packed (Dh,T) K layout, SHARED across beams: the decoder's
        # grouped cross-attention reads each element's K/V once per step
        # instead of once per beam (a K-fold cut of the dominant read)
        from ..ops.attention_pallas import pack_cross_kv_bf16
        cross_kv = pack_cross_kv_bf16(cross_kv)
    else:
        cross_kv = jax.tree.map(lambda t: jnp.repeat(t, k, axis=1),
                                cross_kv)
    # right-sized cache (see decode/greedy.py): attention reads scale with
    # the cache length, and the loop never writes past p_max + sample_len
    t_cache = -(-(p_max + sample_len) // 8) * 8
    cache = init_kv_cache(cfg, bk, dtype=compute_dtype,
                          t_ctx=min(t_cache, cfg.n_text_ctx))

    pad_rep = rep(pad_lens)
    logits_all, cache = decoder_forward(
        params, rep(prompt_tokens), jnp.int32(0), pad_rep, cache,
        cross_kv, cfg, compute_dtype)
    first_logits = logits_all[:, -1]                             # (BK, V)
    sot_logits = jnp.take_along_axis(
        logits_all, rep(sot_idx)[:, None, None], axis=1)[:, 0]
    no_speech_prob = jax.nn.softmax(
        sot_logits, axis=-1)[:, cfg.no_speech].reshape(b, k)[:, 0]

    import os
    ancestry_mode = bool(os.environ.get("NWT_BEAM_ANCESTRY"))
    t_cache_real = cache[0].shape[-1]

    tb = tables.timestamp_begin
    state = dict(
        step=jnp.int32(0),
        tokens=jnp.full((b, k, sample_len), tables.eot, jnp.int32),
        cum=jnp.zeros((b, k), jnp.float32),
        cache=cache,
        last=jnp.zeros((b, k), jnp.int32),
        penult=jnp.zeros((b, k), jnp.int32),
        max_ts=jnp.full((b, k), tb - 1, jnp.int32),
        logits=first_logits,                 # (BK, V)
        fin_tokens=jnp.full((b, k, sample_len), tables.eot, jnp.int32),
        fin_len=jnp.zeros((b, k), jnp.int32),
        fin_cum=jnp.full((b, k), -1e30, jnp.float32),
        fin_valid=jnp.zeros((b, k), bool),
    )
    if ancestry_mode:
        # ancestry pointers (NWT_BEAM_ANCESTRY=1): the cache never
        # permutes; anc[(b,q), t] = the within-element beam row whose
        # written KV at cache position t belongs to beam q's history.
        # Prefill wrote every row its own identical copy -> identity.
        state["anc"] = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, :, None],
            (b, k, t_cache_real))

    def cond(s):
        return (s["step"] < sample_len) & ~jnp.all(s["fin_valid"])

    def body(s):
        step = s["step"]
        logits = s["logits"].astype(jnp.float32)
        masked = apply_logit_rules(
            logits, tables,
            n_sampled=jnp.broadcast_to(step, (bk,)),
            last_token=s["last"].reshape(bk),
            penult_token=s["penult"].reshape(bk),
            max_ts_token=s["max_ts"].reshape(bk))
        logprobs = jax.nn.log_softmax(masked, axis=-1).reshape(b, k, -1)

        (src, tok, cum, fin_slot, fin_src, fin_score) = beam_step(
            s["cum"], logprobs, s["fin_valid"], tables.eot, step == 0)

        def gather_beams(x, idx):
            # x: (B, K, ...) gather along beam axis with idx (B, K)
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

        # append new finishers into empty pool slots (slot k = dropped);
        # sequences = source beam's tokens (eot not stored), len = step
        def scatter_slots(dst, val):
            return jax.vmap(
                lambda d, sl, v: d.at[sl].set(v, mode="drop"))(
                    dst, fin_slot, val)

        fin_tokens = scatter_slots(s["fin_tokens"],
                                   gather_beams(s["tokens"], fin_src))
        fin_len = scatter_slots(s["fin_len"],
                                jnp.broadcast_to(step, (b, k)))
        fin_cum = scatter_slots(s["fin_cum"], fin_score)
        fin_valid = scatter_slots(s["fin_valid"], jnp.ones((b, k), bool))

        # reorder active beams
        tokens = gather_beams(s["tokens"], src)
        tokens = jax.vmap(lambda t, s_: t.at[:, step].set(s_))(tokens, tok)
        last = tok
        penult = jnp.take_along_axis(s["last"], src, axis=1)
        max_ts = jnp.take_along_axis(s["max_ts"], src, axis=1)
        max_ts = jnp.where(tok >= tb, jnp.maximum(max_ts, tok), max_ts)

        # cache reorder along the flattened beam axis. A permutation is
        # also a matmul with a one-hot matrix — and on this TPU the
        # whole-cache gather runs at ~119 GB/s effective while the
        # (BK, BK) one-hot contraction rides the MXU at ~330 GB/s
        # (scripts/beam_reorder_probe.py, round 4: 2.31 -> 0.84 ms per
        # application on the beam5 B=8 turbo cache — the reorder was
        # ~45% of the measured 5.16 ms step). Exact: each output row is
        # 1.0 * one source row accumulated in f32, so values round-trip
        # bit-identically in both bf16 and f32 caches (test_beam pins
        # token equality). NWT_BEAM_GATHER_REORDER=1 reverts; NWT_BEAM_
        # ANCESTRY=1 skips the reorder entirely and reads through
        # ancestry pointers instead (trace time, like every knob —
        # docs/KNOBS.md).
        anc = None
        import os
        flat_src = (jnp.arange(b)[:, None] * k + src).reshape(bk)
        if ancestry_mode:
            # no cache movement: row q inherits src[q]'s history map,
            # then owns the slot the forward below writes
            cache = s["cache"]
            anc = jnp.take_along_axis(
                s["anc"], src[:, :, None], axis=1)
            own = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None, :], (b, k))
            anc = jax.lax.dynamic_update_index_in_dim(
                anc, own, p_max + step, axis=2)
        elif os.environ.get("NWT_BEAM_GATHER_REORDER"):
            cache = jax.tree.map(lambda t: t[:, flat_src], s["cache"])
        else:
            def perm(t):
                onehot = jax.nn.one_hot(flat_src, bk, dtype=t.dtype)
                moved = jnp.moveaxis(t, 1, -1)            # (..., BK)
                # HIGHEST precision for f32 caches: the TPU's default
                # matmul precision decomposes f32 dots into single bf16
                # passes, which would round every cache value per step.
                # Under HIGHEST the bf16-limb products of 1.0 x value
                # recombine exactly, so the permutation stays
                # bit-identical; bf16 caches are exact at default
                # precision (bf16 inputs, f32 accumulation).
                prec = (jax.lax.Precision.HIGHEST
                        if t.dtype == jnp.float32
                        else jax.lax.Precision.DEFAULT)
                out = jax.lax.dot_general(
                    moved, onehot,
                    (((moved.ndim - 1,), (1,)), ((), ())),
                    precision=prec,
                    preferred_element_type=jnp.float32)
                return jnp.moveaxis(out.astype(t.dtype), -1, 1)
            cache = jax.tree.map(perm, s["cache"])

        logits_next, cache = decoder_forward(
            params, tok.reshape(bk, 1), p_max + step, pad_rep, cache,
            cross_kv, cfg, compute_dtype,
            ancestry=(anc.reshape(bk, t_cache_real)
                      if anc is not None else None),
            beam_k=k if anc is not None else 0)

        out = dict(
            step=step + 1, tokens=tokens,
            cum=cum, cache=cache, last=last, penult=penult, max_ts=max_ts,
            logits=logits_next[:, 0], fin_tokens=fin_tokens,
            fin_len=fin_len, fin_cum=fin_cum, fin_valid=fin_valid,
        )
        if anc is not None:
            out["anc"] = anc
        return out

    s = jax.lax.while_loop(cond, body, state)
    return (s["fin_tokens"], s["fin_len"], s["fin_cum"], s["fin_valid"],
            s["tokens"], s["cum"], s["step"], no_speech_prob)


def beam_decode_window(
    params,
    xa: jnp.ndarray,
    prompts: Sequence[Sequence[int]],
    cfg: WhisperConfig,
    tables: RuleTables,
    beam_size: int = 5,
    sample_len: Optional[int] = None,
    compute_dtype=jnp.float32,
) -> List[WindowResult]:
    """Host wrapper: run the beam loop, rank finished by avg logprob."""
    prompt_tokens, pad_lens = pad_prompts(prompts, cfg.eot)
    p_max = prompt_tokens.shape[1]
    sot_idx = np.array([pad_lens[i] + list(p).index(cfg.sot)
                        for i, p in enumerate(prompts)], np.int32)
    sample_len = sample_len or cfg.n_text_ctx // 2
    sample_len = min(sample_len, cfg.n_text_ctx - p_max)

    (fin_tokens, fin_len, fin_cum, fin_valid, act_tokens, act_cum, n_steps,
     nsp) = beam_decode_window_jit(
        params, xa, jnp.asarray(prompt_tokens), jnp.asarray(pad_lens),
        jnp.asarray(sot_idx), tables, cfg, beam_size, sample_len,
        compute_dtype, packed_kv=kt_xattn_default(compute_dtype))

    fin_tokens = np.asarray(fin_tokens)
    fin_len = np.asarray(fin_len)
    fin_cum = np.asarray(fin_cum)
    fin_valid = np.asarray(fin_valid)
    act_tokens = np.asarray(act_tokens)
    act_cum = np.asarray(act_cum)
    n_steps = int(n_steps)
    nsp = np.asarray(nsp)

    out: List[WindowResult] = []
    for i in range(len(prompts)):
        # candidate pool = finished sequences; if the token budget ran out
        # before K finished, top up with the best active beams (openai
        # BeamSearchDecoder.finalize — their cum does NOT gain an eot
        # logprob)
        cands: List[Tuple[List[int], float]] = []
        for j in range(beam_size):
            if fin_valid[i, j]:
                cands.append((fin_tokens[i, j, : fin_len[i, j]].tolist(),
                              float(fin_cum[i, j])))
        if len(cands) < beam_size:
            for j in np.argsort(-act_cum[i]):
                if len(cands) >= beam_size:
                    break
                cands.append((act_tokens[i, j, : n_steps].tolist(),
                              float(act_cum[i, j])))
        # rank by cum/len (openai MaximumLikelihoodRanker: the eot logprob
        # is in the sum, but the penalty divisor is the TEXT length); the
        # /(len+1) value is only the *reported* avg_logprob
        toks, cum = max(cands,
                        key=lambda c: c[1] / max(len(c[0]), 1))
        out.append(WindowResult(
            tokens=toks, sum_logprob=cum,
            avg_logprob=cum / (len(toks) + 1),
            no_speech_prob=float(nsp[i]), temperature=0.0))
    return out
