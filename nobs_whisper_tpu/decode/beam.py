"""Batched beam-search decoding (beam_size=5 parity path).

whisper.cpp exposes beam sampling next to greedy (the reference pins greedy
via ``Greedy{best_of:1}``, src-tauri/src/whisper.rs:88, but the engine
capability includes beam=5 + temperature fallback). Semantics follow
openai-whisper's BeamSearchDecoder: per step expand K active beams over the
vocab, candidates ending in eot retire to a finished set (capacity K, best
kept), top-K non-eot survive; search ends when K beams finished or the
token budget is out; final pick = highest avg logprob among finished.

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
from .greedy import WindowResult, pad_prompts
from .rules import RuleTables, apply_logit_rules

NEG = jnp.float32(-1e30)


def beam_step(
    cum_logprob: jnp.ndarray,     # (B, K) active beam scores
    step_logprobs: jnp.ndarray,   # (B, K, V) masked log-softmax this step
    fin_score: jnp.ndarray,       # (B, K) finished avg-ish scores (cum)
    fin_valid: jnp.ndarray,       # (B, K) bool
    eot: int,
    first_step: jnp.ndarray,      # scalar bool — only beam 0 is live
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray]:
    """Pure beam bookkeeping for one step.

    Returns (src_beam (B,K), new_token (B,K), new_cum (B,K),
             fin_score', fin_src (B,K) source beam of newly finished,
             fin_new_mask (B,K) which finished slots were replaced).
    Finished slots store the *cumulative* logprob of sequences that just
    emitted eot; ranking by avg happens at the end on host.
    """
    b, k, v = step_logprobs.shape
    # at the first step all K beams are identical clones — expand only
    # beam 0 to avoid K duplicate candidates
    live = jnp.where(first_step,
                     jnp.arange(k)[None, :] == 0,
                     jnp.ones((b, k), bool))
    cand = jnp.where(live[..., None], cum_logprob[..., None] + step_logprobs,
                     NEG)                                  # (B, K, V)
    flat = cand.reshape(b, k * v)

    # top 2K candidates per element: enough to fill K active slots even if
    # K of them are eot
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

    # --- finished pool update: merge existing + new eot candidates ---
    eot_scores = jnp.where(is_eot, scores2k, NEG)          # (B, 2K)
    merged_scores = jnp.concatenate(
        [jnp.where(fin_valid, fin_score, NEG), eot_scores], axis=1)
    # (B, K+2K) -> keep best K. f_idx < K points into the OLD pool (it was
    # reordered by the sort); f_idx >= K points at a new finisher.
    f_scores, f_idx = jax.lax.top_k(merged_scores, k)
    from_new = f_idx >= k                                  # new finisher
    new_pos = jnp.clip(f_idx - k, 0, 2 * k - 1)
    fin_src = jnp.take_along_axis(src2k, new_pos, axis=1)
    fin_new_mask = from_new & (f_scores > NEG / 2)
    old_pos = jnp.clip(f_idx, 0, k - 1)                    # old-pool reorder
    return (src_beam, new_token, new_cum, f_scores, fin_src, fin_new_mask,
            old_pos)


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "sample_len",
                              "compute_dtype"))
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
):
    b, p_max = prompt_tokens.shape
    k = beam_size
    bk = b * k

    # replicate audio/prompt across beams -> flattened (B*K, ...)
    def rep(x):
        return jnp.repeat(x, k, axis=0)

    cross_kv = precompute_cross_kv(params, xa, cfg)
    cross_kv = jax.tree.map(lambda t: jnp.repeat(t, k, axis=1), cross_kv)
    cache = init_kv_cache(cfg, bk, dtype=compute_dtype)

    pad_rep = rep(pad_lens)
    logits_all, cache = decoder_forward(
        params, rep(prompt_tokens), jnp.int32(0), pad_rep, cache,
        cross_kv, cfg, compute_dtype)
    first_logits = logits_all[:, -1]                             # (BK, V)
    sot_logits = jnp.take_along_axis(
        logits_all, rep(sot_idx)[:, None, None], axis=1)[:, 0]
    no_speech_prob = jax.nn.softmax(
        sot_logits, axis=-1)[:, cfg.no_speech].reshape(b, k)[:, 0]

    tb = tables.timestamp_begin
    state = dict(
        step=jnp.int32(0),
        tokens=jnp.full((b, k, sample_len), tables.eot, jnp.int32),
        lengths=jnp.zeros((b, k), jnp.int32),
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

        (src, tok, cum, fin_cum, fin_src, fin_new, fin_old_pos) = beam_step(
            s["cum"], logprobs, s["fin_cum"], s["fin_valid"],
            tables.eot, step == 0)

        # finished bookkeeping: sequences = source beam's tokens (eot not
        # stored); length = current step count
        def gather_beams(x, idx):
            # x: (B, K, ...) gather along beam axis with idx (B, K)
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

        # surviving old-pool entries were reordered by the merge sort
        old_fin_tokens = gather_beams(s["fin_tokens"], fin_old_pos)
        old_fin_len = jnp.take_along_axis(s["fin_len"], fin_old_pos, axis=1)
        fin_tokens = jnp.where(
            fin_new[..., None], gather_beams(s["tokens"], fin_src),
            old_fin_tokens)
        fin_len = jnp.where(fin_new, step, old_fin_len)
        fin_valid = fin_cum > NEG / 2

        # reorder active beams
        tokens = gather_beams(s["tokens"], src)
        tokens = jax.vmap(lambda t, s_: t.at[:, step].set(s_))(tokens, tok)
        last = tok
        penult = jnp.take_along_axis(s["last"], src, axis=1)
        max_ts = jnp.take_along_axis(s["max_ts"], src, axis=1)
        max_ts = jnp.where(tok >= tb, jnp.maximum(max_ts, tok), max_ts)

        # cache reorder: gather along the flattened beam axis
        flat_src = (jnp.arange(b)[:, None] * k + src).reshape(bk)
        cache = jax.tree.map(lambda t: t[:, flat_src], s["cache"])

        logits_next, cache = decoder_forward(
            params, tok.reshape(bk, 1), p_max + step, pad_rep, cache,
            cross_kv, cfg, compute_dtype)

        return dict(
            step=step + 1, tokens=tokens, lengths=s["lengths"] + 1,
            cum=cum, cache=cache, last=last, penult=penult, max_ts=max_ts,
            logits=logits_next[:, 0], fin_tokens=fin_tokens,
            fin_len=fin_len, fin_cum=fin_cum, fin_valid=fin_valid,
        )

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
        compute_dtype)

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
        # rank by cum/len (openai MaximumLikelihoodRanker: the eot logprob
        # is in the sum, but the penalty divisor is the TEXT length); the
        # /(len+1) value is only the *reported* avg_logprob
        best: Optional[Tuple[float, List[int], float]] = None
        for j in range(beam_size):
            if fin_valid[i, j]:
                toks = fin_tokens[i, j, : fin_len[i, j]].tolist()
                rank = float(fin_cum[i, j]) / max(len(toks), 1)
                if best is None or rank > best[0]:
                    best = (rank, toks, float(fin_cum[i, j]))
        if best is None:
            # no finished beam: fall back to best active
            j = int(np.argmax(act_cum[i]))
            toks = act_tokens[i, j, : n_steps].tolist()
            best = (float(act_cum[i, j]) / max(len(toks), 1), toks,
                    float(act_cum[i, j]))
        out.append(WindowResult(
            tokens=best[1], sum_logprob=best[2],
            avg_logprob=best[2] / (len(best[1]) + 1),
            no_speech_prob=float(nsp[i]), temperature=0.0))
    return out
