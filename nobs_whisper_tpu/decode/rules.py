"""Logit-processing rules of the Whisper decode loop, as pure JAX.

Reproduces the rule set whisper.cpp applies per decode step (the reference
relies on these via ``state.full`` with suppress_blank / no_speech_thold 0.6 /
entropy_thold 2.4 / logprob_thold -1.0, src-tauri/src/whisper.rs:112-124),
which itself mirrors openai-whisper's SuppressBlank / SuppressTokens /
ApplyTimestampRules processors. Everything here is vectorized over the batch
and jit-safe: rules compile into the on-device sampling loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import WhisperConfig

NEG_INF = jnp.float32(-1e30)


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    """Sampling options (defaults = the reference's greedy configuration,
    src-tauri/src/whisper.rs:88-124)."""

    task: str = "transcribe"
    language: Optional[str] = None          # None = auto-detect
    temperature: float = 0.0
    best_of: int = 1                        # greedy parity first
    beam_size: Optional[int] = None
    timestamps: bool = True
    suppress_blank: bool = True
    suppress_non_speech: bool = False       # whisper.cpp default (off)
    max_initial_timestamp: float = 1.0
    # quality thresholds (whisper.rs:121-124)
    no_speech_threshold: float = 0.6
    logprob_threshold: float = -1.0
    entropy_threshold: float = 2.4
    compression_ratio_threshold: float = 2.4
    # temperature fallback ladder (openai/whisper.cpp: +0.2 increments)
    temperature_increment: float = 0.2
    max_temperature: float = 1.0
    sample_len: Optional[int] = None        # default n_text_ctx // 2
    # TPU serving knob: int8 cross-attention K/V (halves the dominant
    # per-token HBM read; fused Pallas kernel)
    q8_cross_kv: bool = False
    # TPU serving knob: fused bf16 single-query cross-attention kernel
    # (full precision, one K+V streaming pass per step; also settable via
    # NWT_XATTN_BF16=1)
    xattn_bf16: bool = False
    # word-level timestamps via cross-attention DTW (decode/timing.py)
    word_timestamps: bool = False
    # TPU serving knob: exact speculative greedy decode
    # (decode/speculative.py) — k>0 drafts k tokens/pass (greedy rungs
    # only; output token-identical). draft_pool = cross-KV time-pooling
    # for the self-draft.
    speculative: int = 0
    draft_pool: int = 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RuleTables:
    """Precomputed static masks/ids for one (config, options) pair.

    A pytree: the masks are traced arrays, the ids are static metadata —
    the whole table passes straight into jitted decode loops.
    """

    suppress_mask: jnp.ndarray        # (V,) bool — always-suppressed ids
    blank_mask: jnp.ndarray           # (V,) bool — first-step blank ids
    timestamp_begin: int = dataclasses.field(metadata=dict(static=True))
    eot: int = dataclasses.field(metadata=dict(static=True))
    no_timestamps: int = dataclasses.field(metadata=dict(static=True))
    n_vocab: int = dataclasses.field(metadata=dict(static=True))
    timestamps_enabled: bool = dataclasses.field(metadata=dict(static=True))
    max_initial_ts_tok: int = dataclasses.field(metadata=dict(static=True))


def build_rule_tables(cfg: WhisperConfig, opts: DecodeOptions,
                      tokenizer=None) -> RuleTables:
    """Assemble the static suppression tables.

    ``tokenizer`` supplies the blank token and non-speech ids; when absent
    (weights-only benchmarks) those rules degrade gracefully.
    """
    v = cfg.n_vocab
    suppress = np.zeros(v, bool)
    # specials never sampled (whisper.cpp whisper_process_logits /
    # openai SuppressTokens)
    for t in (cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.translate,
              cfg.transcribe, cfg.no_speech):
        if t < v:
            suppress[t] = True
    # language tokens are never sampled mid-transcript
    suppress[cfg.lang_base: cfg.lang_base + cfg.n_langs] = True
    if opts.suppress_non_speech and tokenizer is not None:
        for t in tokenizer.non_speech_tokens:
            suppress[t] = True

    blank = np.zeros(v, bool)
    if opts.suppress_blank:
        if tokenizer is not None:
            sp = tokenizer.encode(" ")
            if sp:
                blank[sp[0]] = True
        blank[cfg.eot] = True

    max_init_idx = int(round(opts.max_initial_timestamp / 0.02))
    return RuleTables(
        suppress_mask=jnp.asarray(suppress),
        blank_mask=jnp.asarray(blank),
        timestamp_begin=cfg.timestamp_begin,
        eot=cfg.eot,
        no_timestamps=cfg.no_timestamps,
        n_vocab=v,
        timestamps_enabled=opts.timestamps,
        max_initial_ts_tok=cfg.timestamp_begin + max_init_idx,
    )


def apply_logit_rules(
    logits: jnp.ndarray,        # (B, V) fp32
    tables: RuleTables,
    *,
    n_sampled: jnp.ndarray,      # (B,) int32 — tokens sampled so far
    last_token: jnp.ndarray,     # (B,) int32 — sampled[-1] (any value if none)
    penult_token: jnp.ndarray,   # (B,) int32 — sampled[-2] (any value if <2)
    max_ts_token: jnp.ndarray,   # (B,) int32 — highest ts sampled; tb-1 if none
) -> jnp.ndarray:
    """All per-step suppression rules -> masked logits (B, V).

    Semantics pinned to openai-whisper's processors (which whisper.cpp and
    transformers reproduce); see tests/test_decode.py for the oracle check.
    """
    return apply_logit_rules_scored(
        logits, tables, n_sampled=n_sampled, last_token=last_token,
        penult_token=penult_token, max_ts_token=max_ts_token)[0]


def apply_logit_rules_scored(
    logits: jnp.ndarray,        # (B, V) fp32
    tables: RuleTables,
    *,
    n_sampled: jnp.ndarray,
    last_token: jnp.ndarray,
    penult_token: jnp.ndarray,
    max_ts_token: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """apply_logit_rules + free scoring byproducts.

    Returns (masked (B,V), lse (B,), greedy_logit (B,)) where
    lse = logsumexp(masked) and greedy_logit = max(masked), both assembled
    from the SAME region-split reductions the timestamp probability-mass
    rule already computes. Measured on v5e: a logsumexp consuming the
    logits matmul output directly flips the compiled loop into a ~0.8
    ms/step slower regime, while these region-split reductions are free —
    so the decode loop gets exact greedy scoring (tok_lp = max - lse) with
    zero extra (B, V) passes.
    """
    b, v = logits.shape
    tb = tables.timestamp_begin
    ids = jnp.arange(v)[None, :]                       # (1, V)
    is_first = (n_sampled == 0)[:, None]               # (B, 1)

    # One combined boolean mask -> ONE where. All sub-rules are outer
    # products of a per-row scalar (B,1) with a per-vocab predicate (1,V),
    # which XLA fuses into a single elementwise kernel — the sequential
    # where-chain this replaces serialized ~10 kernels per decode step.
    static_mask = tables.suppress_mask[None, :]

    if not tables.timestamps_enabled:
        # no-timestamps mode: never sample timestamps (or the marker)
        mask = (static_mask
                | (is_first & tables.blank_mask[None, :])
                | (ids >= tb) | (ids == tables.no_timestamps))
        masked = jnp.where(mask, NEG_INF, logits)
        lse = jax.nn.logsumexp(jnp.where(ids >= tb, NEG_INF, masked),
                               axis=-1)
        mx = jnp.max(jnp.where(ids >= tb, NEG_INF, masked), axis=-1)
        return masked, lse, mx

    ts_region = ids >= tb                              # (1, V)

    # NB: with <2 sampled tokens the penultimate counts as a timestamp —
    # this forces text right after the initial timestamp (openai rule).
    last_is_ts = ((n_sampled >= 1) & (last_token >= tb))[:, None]
    penult_is_ts = ((n_sampled < 2) | (penult_token >= tb))[:, None]
    pair_ts = last_is_ts & penult_is_ts      # ts,ts -> next must be text
    pair_text = last_is_ts & ~penult_is_ts   # text,ts -> next ts or eot

    # monotonic timestamps: allow repeating the last timestamp only when
    # closing a pair, else require strictly greater
    has_ts = (max_ts_token >= tb)[:, None]
    floor = jnp.where(pair_text, max_ts_token[:, None],
                      max_ts_token[:, None] + 1)

    mask = (static_mask
            | (ids == tables.no_timestamps)
            | (is_first & tables.blank_mask[None, :])
            | (pair_ts & ts_region)
            | (pair_text & (ids < tables.eot))
            | (has_ts & ts_region & (ids < floor))
            # first step: must start with a timestamp, bounded by
            # max_initial_timestamp
            | (is_first & (~ts_region | (ids > tables.max_initial_ts_tok))))
    masked = jnp.where(mask, NEG_INF, logits)

    # probability-mass rule: if P(any timestamp) > max P(text token),
    # force a timestamp. The softmax normalizer cancels on both sides of
    # the comparison, so the full log_softmax is skipped: compare raw
    # logsumexp(ts) vs max(text) on the masked logits directly.
    ts_lse = jax.nn.logsumexp(
        jnp.where(ts_region, masked, NEG_INF), axis=-1)         # (B,)
    nonts_lse = jax.nn.logsumexp(
        jnp.where(ts_region, NEG_INF, masked), axis=-1)
    ts_max = jnp.max(jnp.where(ts_region, masked, NEG_INF), axis=-1)
    max_text = jnp.max(jnp.where(ts_region, NEG_INF, masked), axis=-1)
    force_ts = ts_lse > max_text                                # (B,)
    masked = jnp.where(force_ts[:, None] & ~ts_region, NEG_INF, masked)

    # exact scoring byproducts of the final masked logits: when force_ts
    # fires the non-ts region is all NEG_INF
    lse = jnp.where(force_ts, ts_lse, jnp.logaddexp(ts_lse, nonts_lse))
    greedy_logit = jnp.where(force_ts, ts_max,
                             jnp.maximum(ts_max, max_text))
    return masked, lse, greedy_logit


# ---------------------------------------------------------------------------
# segment scoring (host-side; feeds the temperature-fallback ladder)
# ---------------------------------------------------------------------------

def token_entropy(tokens: Sequence[int], window: int = 32) -> float:
    """whisper.cpp-style repetition score: Shannon entropy of the last
    ``window`` sampled token counts. Low entropy = looping output.
    (Threshold: entropy_thold 2.4, reference src-tauri/src/whisper.rs:123.)
    """
    tail = list(tokens)[-window:]
    if not tail:
        return 0.0
    _, counts = np.unique(tail, return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum())


def compression_ratio(text: str) -> float:
    """openai-whisper's zlib repetition score (alternative gate)."""
    import zlib
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def needs_fallback(avg_logprob: float, entropy: float, n_tokens: int,
                   opts: DecodeOptions, *, text: Optional[str] = None,
                   no_speech_prob: Optional[float] = None) -> bool:
    """Decide whether to retry the window at a higher temperature.

    Gates (openai-whisper transcribe(), mirrored by whisper.cpp with
    entropy_thold 2.4 / logprob_thold -1.0, src-tauri/src/whisper.rs:121-124):
    low avg logprob, low token entropy (repetition), high zlib compression
    ratio of the text (repetition). The silence override wins over all of
    them: a window whose no_speech_prob exceeds the threshold is NOT worth
    retrying at higher temperature — it gets skipped by the no-speech gate
    instead of burning the whole ladder.
    """
    if (no_speech_prob is not None
            and no_speech_prob > opts.no_speech_threshold):
        return False
    if avg_logprob < opts.logprob_threshold:
        return True
    if n_tokens >= 32 and entropy < opts.entropy_threshold:
        return True
    if (text is not None and opts.compression_ratio_threshold is not None
            and compression_ratio(text) > opts.compression_ratio_threshold):
        return True
    return False


def is_no_speech(no_speech_prob: float, avg_logprob: float,
                 opts: DecodeOptions) -> bool:
    """Silence gate: both conditions required, as in whisper.cpp/openai."""
    return (no_speech_prob > opts.no_speech_threshold
            and avg_logprob < opts.logprob_threshold)
