"""Speculative greedy window decoding — amortize the per-step HBM reads.

The measured decode floor on this box is the per-step cross-attention K/V
read (docs/ROADMAP.md: 3.57 ms/step at B=40 vs a ~1.9 ms bytes floor —
"cross-KV read IS the step"). That read is per *pass*, not per *token*:
verifying k drafted tokens in ONE decoder pass reads the cross-KV, the
weights, and the self-cache once for k+1 token positions. Speculative
decoding is therefore the only structural lever left on the decode floor
— it attacks exactly the bytes the sequential loop cannot avoid.

Greedy speculative decoding is EXACT: the emitted sequence is token-for-
token the sequential greedy sequence, regardless of draft quality (a bad
draft only costs speed). Tests pin this in both regimes — a perfect
draft (same weights → always accepts) and an adversarial draft (random
weights → mostly rejects).

TPU-shaped design decisions:

- **No cache rewinds.** The whole decode stack rides the "uniform cache
  write positions" invariant (left-padded prompts, one slice write per
  step — see decoder_forward). Ragged per-row acceptance would normally
  rewind each row's cache to a different position — a scatter. Instead
  the cache advances in uniform (k+1)-slot blocks every pass and
  REJECTED slots simply stay as garbage, masked out of all future reads
  by a per-row slot bitmap (``slot_mask``) threaded through
  decoder_forward. Position embeddings use an explicit per-row base
  (``pos_base``) because garbage slots break the cache-index ==
  pad + position identity.
- **Drafts may be sloppy; verification may not.** The draft model can be
  anything that shares the tokenizer: a second engine (the registry's
  distil-large-v3 pairs with large-v3 — Distil-Whisper freezes the
  teacher's encoder, so the TARGET's encoder states feed the draft's
  cross-projections directly), or the target itself reading
  TIME-POOLED cross-KV ("self-draft": pool the precomputed cross K/V
  4x along audio time — the draft's dominant read shrinks 4x and no
  second checkpoint is needed). Both paths run the full logit-rule set
  while drafting so proposals are rule-legal (maximizes acceptance).

Reference capability bar: whisper.cpp's greedy sampler inside
state.full (src-tauri/src/whisper.rs:88,128) — output parity is with
that greedy semantics; speculation is a pure throughput feature.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import WhisperConfig
from .rules import RuleTables, apply_logit_rules_scored
from ..models.whisper import (decoder_forward, init_kv_cache,
                              precompute_cross_kv)


def pool_cross_kv(cross_kv: Tuple[jnp.ndarray, jnp.ndarray],
                  pool: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean-pool (xk, xv) (L, B, H, T, Dh) by ``pool`` along audio time.

    For DRAFTING only: pooled keys/values approximate full cross
    attention at 1/pool of the HBM read. 20 ms/frame * pool stays far
    below phoneme duration at pool=4 (80 ms), so draft quality holds."""
    if pool <= 1:
        return cross_kv
    xk, xv = cross_kv
    t = xk.shape[-2]
    t2 = t // pool

    def _p(a):
        a = a[..., : t2 * pool, :]
        return a.reshape(*a.shape[:-2], t2, pool, a.shape[-1]).mean(-2)

    return _p(xk), _p(xv)


def _flat_rules(logits, tables, n_s, last, penult, max_ts):
    """apply_logit_rules_scored over a (B, S, V) block: flatten rows."""
    b, s, v = logits.shape
    masked, lse, greedy_logit = apply_logit_rules_scored(
        logits.reshape(b * s, v), tables,
        n_sampled=n_s.reshape(-1), last_token=last.reshape(-1),
        penult_token=penult.reshape(-1), max_ts_token=max_ts.reshape(-1))
    tok = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    return (tok.reshape(b, s), greedy_logit.reshape(b, s),
            lse.reshape(b, s))


def decode_window_speculative_impl(
    params,
    draft_params,                # == params for self-draft
    xa: jnp.ndarray,             # (B, T_audio, d) encoder states
    prompt_tokens: jnp.ndarray,  # (B, P) int32, LEFT-padded
    pad_lens: jnp.ndarray,       # (B,) int32
    sot_idx: jnp.ndarray,        # (B,) int32
    tables: RuleTables,
    cfg: WhisperConfig,
    draft_cfg: WhisperConfig,
    sample_len: int,
    k_draft: int,
    draft_pool: int,
    compute_dtype=jnp.float32,
    xattn_bf16: bool = False,
    q8_kv: bool = False,
    self_draft: bool = True,
):
    """Greedy-only speculative twin of decode_window_impl. Returns the
    same (tokens, n_sampled, sum_logprob, no_speech_prob) tuple,
    token-exact with the sequential greedy loop (test_speculative.py).

    ``self_draft`` must be a STATIC host-level flag: under jit the
    (params, draft_params) pytrees unflatten into distinct dicts, so a
    ``draft_params is params`` identity check is always False and the
    self-draft mode would silently recompute the full target cross-KV
    precompute a second time per batch (review finding)."""
    b, p_max = prompt_tokens.shape
    K = k_draft
    tb = tables.timestamp_begin
    eot = tables.eot

    # ---- cross-attention K/V: full for verification, pooled for draft
    # (the draft pools the RAW kv; target-side q8/packing applies after)
    cross_kv = precompute_cross_kv(params, xa, cfg)
    d_cross = pool_cross_kv(
        cross_kv if self_draft
        else precompute_cross_kv(draft_params, xa, draft_cfg), draft_pool)
    if q8_kv:
        from ..ops.attention_pallas import quantize_cross_kv
        cross_kv = quantize_cross_kv(cross_kv)
    elif xattn_bf16:
        from ..ops.attention_pallas import pack_cross_kv_bf16
        cross_kv = pack_cross_kv_bf16(cross_kv)

    # ---- caches: block-aligned, no rewinds (module docstring) ----------
    # Every pass reads the whole ALLOCATED cache, so sizing it for the
    # absolute worst case (one emitted token per pass -> sample_len
    # passes of K+1 slots) would inflate the self-KV read ~60%. Instead
    # the speculative phase gets a PASS BUDGET of ceil(sample_len/2) —
    # each budgeted pass emits >= 1 token, so at most
    # sample_len - budget tokens can remain — and a sequential phase-2
    # tail (one slot per step,
    # same slot-mask machinery) finishes any stragglers exactly. With
    # healthy acceptance (>= 2 emitted/pass) phase 2 never runs.
    budget = max(1, -(-sample_len // 2))
    tail = sample_len - budget          # max tokens left for phase 2
    t_len = -(-(p_max + budget * (K + 1) + tail) // 8) * 8
    d_len = -(-(p_max + budget * K) // 8) * 8
    cache = init_kv_cache(cfg, b, dtype=compute_dtype, t_ctx=t_len)
    dcache = init_kv_cache(draft_cfg, b, dtype=compute_dtype, t_ctx=d_len)

    ones_b = jnp.ones((b,), jnp.int32)

    # ---- prefills (prompt KVs valid; pad handled by pad_lens) ----------
    logits_all, cache = decoder_forward(
        params, prompt_tokens, jnp.int32(0), pad_lens, cache, cross_kv,
        cfg, compute_dtype)
    _, dcache = decoder_forward(
        draft_params, prompt_tokens, jnp.int32(0), pad_lens, dcache,
        d_cross, draft_cfg, compute_dtype)
    sot_logits = jnp.take_along_axis(
        logits_all, sot_idx[:, None, None], axis=1)[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, cfg.no_speech]

    # first token = the sequential loop's first iteration
    t0, gl0, lse0 = _flat_rules(
        logits_all[:, -1:].astype(jnp.float32), tables,
        jnp.zeros((b, 1), jnp.int32), jnp.zeros((b, 1), jnp.int32),
        jnp.zeros((b, 1), jnp.int32), jnp.full((b, 1), tb - 1, jnp.int32))
    first = t0[:, 0]

    tokens0 = jnp.full((b, sample_len), eot, jnp.int32)
    state0 = dict(
        tokens=tokens0.at[:, 0].set(first),
        n_sampled=ones_b,                       # 'first' emitted, unconsumed
        last=first,
        penult=jnp.zeros((b,), jnp.int32),
        max_ts=jnp.where(first >= tb, first, tb - 1),
        sum_logprob=(gl0 - lse0)[:, 0],
        done=first == eot,
        cache=cache,
        dcache=dcache,
        t_mask=(jnp.arange(t_len)[None, :] < p_max)
        & (jnp.arange(t_len)[None, :] >= pad_lens[:, None]),
        d_mask=(jnp.arange(d_len)[None, :] < p_max)
        & (jnp.arange(d_len)[None, :] >= pad_lens[:, None]),
        tpos=jnp.int32(p_max),
        dpos=jnp.int32(p_max),
        passes=jnp.int32(0),
    )

    def cond(s):
        return (s["passes"] < budget) \
            & jnp.any(~s["done"] & (s["n_sampled"] < sample_len))

    def body(s):
        n = s["n_sampled"]
        active = ~s["done"] & (n < sample_len)
        # per-row sequence position of `last` (the next token consumed)
        pos_last = p_max - pad_lens + n - 1

        # ---- draft K tokens (scan; draft slots valid during the pass)
        d_pass_mask = jax.lax.dynamic_update_slice(
            s["d_mask"], jnp.ones((b, K), bool), (0, s["dpos"]))

        def draft_step(carry, i):
            # drafting d_i (emission position n+1+i): trackers are
            # last = the input just consumed (tok), penult = the one
            # before it, mts = running timestamp max incl. tok
            dc, tok, prev, mts = carry
            logits, dc = decoder_forward(
                draft_params, tok[:, None], s["dpos"] + i, pad_lens, dc,
                d_cross, draft_cfg, compute_dtype,
                pos_base=pos_last + i, slot_mask=d_pass_mask)
            nxt, _, _ = _flat_rules(
                logits.astype(jnp.float32), tables, (n + i)[:, None],
                tok[:, None], prev[:, None], mts[:, None])
            nxt = nxt[:, 0]
            mts2 = jnp.where(nxt >= tb, jnp.maximum(mts, nxt), mts)
            return (dc, nxt, tok, mts2), nxt

        (dcache, *_), drafts = jax.lax.scan(
            draft_step,
            (s["dcache"], s["last"], s["penult"], s["max_ts"]),
            jnp.arange(K))
        drafts = jnp.swapaxes(drafts, 0, 1)            # (B, K)

        # ---- verify: ONE pass over [last, d_0..d_{K-1}] ----------------
        inputs = jnp.concatenate([s["last"][:, None], drafts], 1)  # (B,K+1)
        t_pass_mask = jax.lax.dynamic_update_slice(
            s["t_mask"], jnp.ones((b, K + 1), bool), (0, s["tpos"]))
        logits, cache = decoder_forward(
            params, inputs, s["tpos"], pad_lens, s["cache"], cross_kv,
            cfg, compute_dtype, pos_base=pos_last,
            slot_mask=t_pass_mask)

        # rule trackers at each verify position j, all derived from the
        # (known) draft prefix — identical to what the sequential loop
        # would hold when sampling emission position n+1+j
        n_j = n[:, None] + jnp.arange(K + 1)[None, :]
        last_j = inputs
        penult_j = jnp.concatenate(
            [s["penult"][:, None], inputs[:, :-1]], 1)
        ts_in = jnp.where(inputs >= tb, inputs, tb - 1)
        mts_j = jax.lax.associative_scan(
            jnp.maximum,
            jnp.concatenate([s["max_ts"][:, None], ts_in[:, 1:]], 1),
            axis=1)
        targets, gl, lse = _flat_rules(
            logits.astype(jnp.float32), tables, n_j, last_j, penult_j,
            mts_j)                                      # each (B, K+1)

        # ---- acceptance (standard greedy speculation) ------------------
        match = drafts == targets[:, :K]                # (B, K)
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        is_eot = targets == eot
        eot_pos = jnp.where(
            jnp.any(is_eot, 1), jnp.argmax(is_eot, 1), K + 1)
        m_eff = jnp.minimum(m, eot_pos)                 # stop at the eot
        emit_n = jnp.where(
            active,
            jnp.minimum(m_eff + 1, sample_len - n),
            0)                                          # (B,)

        # ---- emit targets[0..emit_n-1] into the tokens buffer ----------
        jpos = n[:, None] + jnp.arange(K + 1)[None, :]  # (B, K+1)
        emit_mask = jnp.arange(K + 1)[None, :] < emit_n[:, None]
        onehot = (jpos[:, :, None]
                  == jnp.arange(sample_len)[None, None, :]) \
            & emit_mask[:, :, None]
        tokens = jnp.where(
            jnp.any(onehot, 1),
            jnp.sum(targets[:, :, None] * onehot, 1), s["tokens"])

        sum_lp = s["sum_logprob"] + jnp.sum(
            jnp.where(emit_mask, gl - lse, 0.0), axis=1)

        # trackers from the emitted tail (sequential-loop equivalents)
        lastpos = jnp.maximum(emit_n - 1, 0)
        new_last = jnp.where(
            emit_n > 0,
            jnp.take_along_axis(targets, lastpos[:, None], 1)[:, 0],
            s["last"])
        # penult after this pass = token before new_last: inputs[emit-1]
        # (= accepted d_{emit-2} for emit >= 2, = the old last for
        # emit == 1 — inputs[0] IS the old last)
        new_penult = jnp.where(
            emit_n > 0,
            jnp.take_along_axis(inputs, lastpos[:, None], 1)[:, 0],
            s["penult"])
        emitted_ts = jnp.where(
            emit_mask & (targets >= tb), targets, tb - 1)
        new_mts = jnp.maximum(s["max_ts"], jnp.max(emitted_ts, axis=1))
        # done only if the eot was actually EMITTED (not truncated away
        # by the sample_len clamp)
        new_done = s["done"] | (active & (eot_pos < emit_n))

        # ---- retroactive slot validity ---------------------------------
        # kept slots: inputs[0] (= old last, consumed) and d_j for
        # j < emit_n - 1 (the accepted prefix); everything else garbage
        keep_t = jnp.concatenate(
            [active[:, None],
             (jnp.arange(K)[None, :] < (emit_n - 1)[:, None])
             & active[:, None]], 1)                     # (B, K+1)
        t_mask = jax.lax.dynamic_update_slice(
            s["t_mask"], keep_t, (0, s["tpos"]))
        keep_d = keep_t[:, :K]                          # same prefix rule
        d_mask = jax.lax.dynamic_update_slice(
            s["d_mask"], keep_d, (0, s["dpos"]))

        return dict(
            tokens=tokens,
            n_sampled=n + emit_n,
            last=new_last,
            penult=new_penult,
            max_ts=jnp.where(active, new_mts, s["max_ts"]),
            sum_logprob=sum_lp,
            done=new_done,
            cache=cache,
            dcache=dcache,
            t_mask=t_mask,
            d_mask=d_mask,
            tpos=s["tpos"] + (K + 1),
            dpos=s["dpos"] + K,
            passes=s["passes"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state0)

    # ---- phase 2: sequential tail for pass-budget stragglers ----------
    # Each step consumes `last` (one slot, always valid), applies the
    # rules, and emits the argmax — the verify pass with K=0. Runs zero
    # iterations when phase 1 finished everything (the common case).
    def cond2(s):
        return jnp.any(~s["done"] & (s["n_sampled"] < sample_len))

    def body2(s):
        n = s["n_sampled"]
        active = ~s["done"] & (n < sample_len)
        pos_last = p_max - pad_lens + n - 1
        t_pass_mask = jax.lax.dynamic_update_slice(
            s["t_mask"], jnp.ones((b, 1), bool), (0, s["tpos"]))
        logits, cache = decoder_forward(
            params, s["last"][:, None], s["tpos"], pad_lens, s["cache"],
            cross_kv, cfg, compute_dtype, pos_base=pos_last,
            slot_mask=t_pass_mask)
        tok, gl, lse = _flat_rules(
            logits.astype(jnp.float32), tables, n[:, None],
            s["last"][:, None], s["penult"][:, None],
            s["max_ts"][:, None])
        tok, gl, lse = tok[:, 0], gl[:, 0], lse[:, 0]
        onehot = (n[:, None] == jnp.arange(sample_len)[None, :]) \
            & active[:, None]
        tokens = jnp.where(onehot, tok[:, None], s["tokens"])
        t_mask = jax.lax.dynamic_update_slice(
            s["t_mask"], active[:, None], (0, s["tpos"]))
        return dict(
            tokens=tokens,
            n_sampled=n + active.astype(jnp.int32),
            last=jnp.where(active, tok, s["last"]),
            penult=jnp.where(active, s["last"], s["penult"]),
            max_ts=jnp.where(active & (tok >= tb),
                             jnp.maximum(s["max_ts"], tok), s["max_ts"]),
            sum_logprob=s["sum_logprob"]
            + jnp.where(active, gl - lse, 0.0),
            done=s["done"] | (active & (tok == eot)),
            cache=cache,
            dcache=s["dcache"],
            t_mask=t_mask,
            d_mask=s["d_mask"],
            tpos=s["tpos"] + 1,
            dpos=s["dpos"],
            passes=s["passes"] + 1,
        )

    state = jax.lax.while_loop(cond2, body2, state)
    tokens = state["tokens"]
    n_sampled = jnp.sum(tokens != eot, axis=1)
    return (tokens, n_sampled, state["sum_logprob"], no_speech_prob,
            state["passes"])


_SPEC_STATICS = ("cfg", "draft_cfg", "sample_len", "k_draft",
                 "draft_pool", "compute_dtype", "xattn_bf16", "q8_kv",
                 "self_draft")

decode_window_speculative_jit = functools.partial(
    jax.jit, static_argnames=_SPEC_STATICS)(decode_window_speculative_impl)


def frames_encode_decode_speculative_impl(
    params, draft_params, frames, prompt_tokens, pad_lens, sot_idx,
    tables, cfg: WhisperConfig, draft_cfg: WhisperConfig,
    sample_len: int, k_draft: int, draft_pool: int,
    compute_dtype=jnp.float32, xattn_bf16: bool = False,
    q8_kv: bool = False, self_draft: bool = True,
):
    """Serving fast path twin of frames_encode_decode_window_impl:
    STFT frames -> mel -> encode -> SPECULATIVE decode, one device
    program (one tunnel dispatch per batch)."""
    from ..audio.mel import log_mel_from_frames
    from ..models.whisper import encode
    mel = log_mel_from_frames(frames, n_mels=cfg.n_mels,
                              n_frames=2 * cfg.n_audio_ctx)
    xa = encode(params, mel, cfg, compute_dtype=compute_dtype)
    return decode_window_speculative_impl(
        params, draft_params, xa, prompt_tokens, pad_lens, sot_idx,
        tables, cfg, draft_cfg, sample_len, k_draft, draft_pool,
        compute_dtype, xattn_bf16, q8_kv, self_draft)


frames_encode_decode_speculative_jit = functools.partial(
    jax.jit, static_argnames=_SPEC_STATICS)(
        frames_encode_decode_speculative_impl)


def encode_decode_speculative_impl(
    params, draft_params, mel, prompt_tokens, pad_lens, sot_idx,
    tables, cfg: WhisperConfig, draft_cfg: WhisperConfig,
    sample_len: int, k_draft: int, draft_pool: int,
    compute_dtype=jnp.float32, xattn_bf16: bool = False,
    q8_kv: bool = False, self_draft: bool = True,
):
    """mel -> encode -> SPECULATIVE decode (the batcher's mel-window
    path, incl. mixed framed/mel batches that degrade to mel)."""
    from ..models.whisper import encode
    xa = encode(params, mel, cfg, compute_dtype=compute_dtype)
    return decode_window_speculative_impl(
        params, draft_params, xa, prompt_tokens, pad_lens, sot_idx,
        tables, cfg, draft_cfg, sample_len, k_draft, draft_pool,
        compute_dtype, xattn_bf16, q8_kv, self_draft)


encode_decode_speculative_jit = functools.partial(
    jax.jit, static_argnames=_SPEC_STATICS)(encode_decode_speculative_impl)


def decode_window_speculative(
    params,
    xa: jnp.ndarray,
    prompts: Sequence[Sequence[int]],
    cfg: WhisperConfig,
    tables: RuleTables,
    sample_len: Optional[int] = None,
    k_draft: int = 3,
    draft_pool: int = 4,
    draft_params=None,
    draft_cfg: Optional[WhisperConfig] = None,
    compute_dtype=jnp.float32,
    xattn_bf16: bool = False,
    return_passes: bool = False,
):
    """Host wrapper mirroring decode_window (greedy only). With no
    draft_params the target SELF-drafts over ``draft_pool``x time-pooled
    cross-KV; with draft_params/draft_cfg a second model drafts (same
    tokenizer required; encoder states are shared — the distil pairing)."""
    from .greedy import WindowResult, pad_prompts

    prompt_tokens, pad_lens = pad_prompts(prompts, cfg.eot)
    p_max = prompt_tokens.shape[1]
    sot_idx = np.array([pad_lens[i] + list(p).index(cfg.sot)
                        for i, p in enumerate(prompts)], np.int32)
    sample_len = sample_len or cfg.n_text_ctx // 2
    sample_len = min(sample_len, cfg.n_text_ctx - p_max)
    tokens, n_sampled, sum_lp, nsp, passes = decode_window_speculative_jit(
        params,
        draft_params if draft_params is not None else params,
        xa, jnp.asarray(prompt_tokens), jnp.asarray(pad_lens),
        jnp.asarray(sot_idx), tables, cfg,
        draft_cfg if draft_cfg is not None else cfg,
        sample_len, k_draft, draft_pool, compute_dtype, xattn_bf16,
        self_draft=draft_params is None)

    from .greedy import decode_window_finalize
    out = decode_window_finalize(
        (tokens, n_sampled, sum_lp, nsp,
         np.zeros(len(prompts), np.float32)))
    if return_passes:
        return out, int(np.asarray(passes))
    return out
