"""On-device batched sampling loop (greedy + temperature sampling).

The TPU rebuild of whisper.cpp's autoregressive decode (driven per chunk via
``state.full``, reference src-tauri/src/whisper.rs:128). Everything —
prefill, per-step logits, suppression rules, sampling, stop handling — runs
inside ONE jitted program with a ``lax.while_loop``; the host only sees the
final token buffer. No per-token host round-trips, static shapes throughout,
ragged batches supported (per-element prompt lengths and stop steps).
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
from .rules import (DecodeOptions, RuleTables, apply_logit_rules,
                    apply_logit_rules_scored)

_NEG = jnp.float32(-1e30)


def kt_xattn_default(compute_dtype) -> bool:
    """Call-time policy for the packed (Dh,T) cross-K decode layout.

    Env knobs are read HERE (on the host, per call) and the result is
    passed into the jitted programs as the static ``xattn_bf16`` argument
    — so toggling NWT_NO_KT_XATTN / NWT_FORCE_KT between calls takes
    effect through the jit cache key instead of silently reusing a stale
    trace. Default ON for bf16 on TPU (measured: decode 0.461 -> 0.390
    s/batch at B=24 turbo); NWT_FORCE_KT forces it on any backend (CPU
    A/B tests), NWT_NO_KT_XATTN opts out.
    """
    import os
    if os.environ.get("NWT_NO_KT_XATTN"):
        return False
    if os.environ.get("NWT_FORCE_KT"):
        return True
    return (compute_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu")


@dataclasses.dataclass
class WindowResult:
    """Per-batch-element outcome of one 30 s window decode."""

    tokens: List[int]            # sampled tokens, eot stripped
    sum_logprob: float           # includes the stop token's logprob
    avg_logprob: float           # sum / (n_text_tokens + 1), openai semantics
    no_speech_prob: float
    temperature: float
    language: Optional[str] = None   # set when the batcher auto-detected


def _pad_len(n: int) -> int:
    """Quantize prompt pad length to limit recompiles."""
    for p in (8, 32, 64, 128, 256):
        if n <= p:
            return p
    return 256


def pad_prompts(prompts: Sequence[Sequence[int]],
                eot: int) -> Tuple[np.ndarray, np.ndarray]:
    """LEFT-pad ragged prompts with eot.

    Left alignment makes every element's cache write position uniform
    (prompt ends at P_max for all), so KV-cache updates lower to sliced
    writes instead of scatters (a ~0.5 ms/step win on v5e).
    Returns (tokens (B, P_max), pad_lens (B,)).
    """
    lens = np.array([len(p) for p in prompts], np.int32)
    p_max = _pad_len(int(lens.max()))
    out = np.full((len(prompts), p_max), eot, np.int32)
    for i, p in enumerate(prompts):
        out[i, p_max - len(p):] = p
    return out, (p_max - lens).astype(np.int32)


def decode_window_impl(
    params,
    xa: jnp.ndarray,             # (B, T_audio, d) encoder states
    prompt_tokens: jnp.ndarray,  # (B, P) int32, LEFT-padded
    pad_lens: jnp.ndarray,       # (B,) int32 — left-pad per element
    sot_idx: jnp.ndarray,        # (B,) int32 — cache index of <|sot|>
    tables: RuleTables,
    temperature: jnp.ndarray,    # (B,) fp32 per element; 0 = greedy
    rng: jax.Array,
    cfg: WhisperConfig,
    sample_len: int,
    compute_dtype=jnp.float32,
    q8_kv: bool = False,
    xattn_bf16: bool = False,    # packed (Dh,T) cross-K layout; callers
                                 # derive the effective value with
                                 # kt_xattn_default() (the bf16-TPU
                                 # default) — env knobs are NOT read in
                                 # here, so the flag is honestly part of
                                 # the jit cache key
    sampling: bool = True,       # static: False skips per-step RNG work
):
    """Returns (tokens (B, sample_len), n_sampled (B,), sum_logprob (B,),
    no_speech_prob (B,))."""
    b, p_max = prompt_tokens.shape
    if q8_kv:
        # fused per-layer projection+quantization: the full fp stack
        # never materializes (models/whisper.py::precompute_cross_kv_q8)
        from ..models.whisper import precompute_cross_kv_q8
        cross_kv = precompute_cross_kv_q8(params, xa, cfg)
    elif xattn_bf16:
        cross_kv = precompute_cross_kv(params, xa, cfg)
        # Packed (Dh, T) K layout, DEFAULT on the bf16 TPU serving path:
        # the per-step scores contraction runs over the sublane Dh axis
        # with no per-step transpose of K. Measured (B=24 turbo, v5e):
        # decode 0.461 -> 0.390 s/batch, headline 774 -> 839x RTF.
        # Lossless when compute_dtype is bf16 (KV were bf16 already);
        # the f32 oracle path keeps the plain layout.
        from ..ops.attention_pallas import pack_cross_kv_bf16
        cross_kv = pack_cross_kv_bf16(cross_kv)
    else:
        cross_kv = precompute_cross_kv(params, xa, cfg)
    # Right-sized cache: the loop never writes past p_max + sample_len, so
    # don't make every step's self-attention read a full 448-slot buffer.
    # (Rounded to the sublane quantum; measured ~0.2 ms/step on v5e turbo.)
    t_cache = -(-(p_max + sample_len) // 8) * 8
    cache = init_kv_cache(cfg, b, dtype=compute_dtype,
                          t_ctx=min(t_cache, cfg.n_text_ctx))

    # ---- prefill (left-padded: everyone's prompt ends at P_max) ----
    logits_all, cache = decoder_forward(
        params, prompt_tokens, jnp.int32(0), pad_lens, cache, cross_kv,
        cfg, compute_dtype)
    first_logits = logits_all[:, -1]                             # (B, V)
    # no-speech prob from the raw logits at the <|sot|> cache index
    sot_logits = jnp.take_along_axis(
        logits_all, sot_idx[:, None, None], axis=1)[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, cfg.no_speech]

    tb = tables.timestamp_begin
    tokens0 = jnp.full((b, sample_len), tables.eot, jnp.int32)
    state0 = dict(
        step=jnp.int32(0),
        tokens=tokens0,
        cache=cache,
        sum_logprob=jnp.zeros((b,), jnp.float32),
        done=jnp.zeros((b,), bool),
        max_ts=jnp.full((b,), tb - 1, jnp.int32),
        last=jnp.zeros((b,), jnp.int32),     # last sampled (0 until step>=1)
        penult=jnp.zeros((b,), jnp.int32),
        logits=first_logits,
        rng=rng,
    )

    def cond(s):
        return (s["step"] < sample_len) & ~jnp.all(s["done"])

    def body(s, _=None):
        step = s["step"]
        logits = s["logits"].astype(jnp.float32)
        masked, lse, greedy_logit = apply_logit_rules_scored(
            logits, tables,
            n_sampled=jnp.broadcast_to(step, (b,)),
            last_token=s["last"], penult_token=s["penult"],
            max_ts_token=s["max_ts"])

        greedy_tok = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        if sampling:
            # mixed-temperature batch: per-row categorical draws
            rng, sub = jax.random.split(s["rng"])
            temp = jnp.maximum(temperature, 1e-6)[:, None]
            sampled_tok = jax.random.categorical(
                sub, masked / temp, axis=-1).astype(jnp.int32)
            tok = jnp.where(temperature > 0, sampled_tok, greedy_tok)
            # sampled token's logit via select+sum (a gather here flips
            # the compiled loop into a slower regime on v5e)
            ids = jnp.arange(masked.shape[1])[None, :]
            tok_logit = jnp.sum(
                jnp.where(ids == tok[:, None], masked, 0.0), axis=-1)
        else:
            # all-greedy (the serving common case): no threefry / gumbel
            # generation over (B, V) per step, and the token's logit is
            # the max the rules already computed
            rng = s["rng"]
            tok = greedy_tok
            tok_logit = greedy_logit
        tok = jnp.where(s["done"], tables.eot, tok)

        # log_softmax(masked)[tok] == masked[tok] - logsumexp(masked);
        # both pieces fall out of the rules' region-split reductions
        tok_lp = tok_logit - lse
        sum_logprob = s["sum_logprob"] + jnp.where(s["done"], 0.0, tok_lp)

        tokens = s["tokens"].at[:, step].set(
            jnp.where(s["done"], tables.eot, tok))
        new_done = s["done"] | (tok == tables.eot)
        max_ts = jnp.where((tok >= tb) & ~s["done"],
                           jnp.maximum(s["max_ts"], tok), s["max_ts"])

        # next forward: uniform cache position for the whole batch;
        # frozen elements keep writing eot KVs ahead of their sequence
        # (never attended — their outputs are ignored)
        logits_next, cache = decoder_forward(
            params, tok[:, None], p_max + step, pad_lens, s["cache"],
            cross_kv, cfg, compute_dtype)

        return dict(
            step=step + 1,
            tokens=tokens,
            cache=cache,
            sum_logprob=sum_logprob,
            done=new_done,
            max_ts=max_ts,
            last=jnp.where(s["done"], s["last"], tok),
            penult=jnp.where(s["done"], s["penult"], s["last"]),
            logits=logits_next[:, 0],
            rng=rng,
        ), None

    # Two-level loop: outer while_loop over chunks of steps, inner
    # lax.scan over the steps of a chunk. On this box's v5e, every
    # OUTER device-loop iteration pays a ~180 us fixed cost while
    # nested-scan iterations pay ~nothing (docs/ROADMAP.md platform
    # facts), so chunking trades early-exit granularity (<= chunk-1
    # wasted steps per window, once) for removing the fixed cost from
    # every step. Chunk must divide sample_len so the last executed
    # step is exactly sample_len - 1 (all cache writes stay in bounds).
    step_chunk = 1
    for c in (8, 4, 2):
        if sample_len % c == 0:
            step_chunk = c
            break

    if step_chunk == 1:
        state = jax.lax.while_loop(cond, lambda s: body(s)[0], state0)
    else:
        def chunk_body(s):
            s, _ = jax.lax.scan(body, s, None, length=step_chunk)
            return s

        state = jax.lax.while_loop(cond, chunk_body, state0)
    tokens = state["tokens"]
    n_sampled = jnp.sum(tokens != tables.eot, axis=1)
    return tokens, n_sampled, state["sum_logprob"], no_speech_prob


_WINDOW_STATICS = ("cfg", "sample_len", "compute_dtype", "q8_kv",
                   "xattn_bf16", "sampling")

decode_window_jit = functools.partial(
    jax.jit, static_argnames=_WINDOW_STATICS)(decode_window_impl)


def encode_decode_window_impl(
    params, mel, prompt_tokens, pad_lens, sot_idx, tables, temperature,
    rng, cfg, sample_len, compute_dtype=jnp.float32, q8_kv=False,
    xattn_bf16=False, sampling=True,
):
    """Encoder + decode loop in ONE device program.

    The serving batcher's inner step is encode-then-decode; dispatching
    them separately costs a full host<->device round trip between the two
    (measured ~27 ms each through this box's TPU tunnel). Fusing them
    into one program removes it."""
    from ..models.whisper import encode
    xa = encode(params, mel, cfg, compute_dtype=compute_dtype)
    return decode_window_impl(params, xa, prompt_tokens, pad_lens, sot_idx,
                              tables, temperature, rng, cfg, sample_len,
                              compute_dtype, q8_kv, xattn_bf16, sampling)


encode_decode_window_jit = functools.partial(
    jax.jit, static_argnames=_WINDOW_STATICS)(encode_decode_window_impl)


def frames_encode_decode_window_impl(
    params, frames, prompt_tokens, pad_lens, sot_idx, tables, temperature,
    rng, cfg, sample_len, compute_dtype=jnp.float32, q8_kv=False,
    xattn_bf16=False, sampling=True,
):
    """STFT-framed audio -> mel -> encoder -> decode loop in ONE device
    program — the serving fast path. Sessions frame the chunk on the host
    (audio/mel.py::frame_window_np, a strided memcpy) so the per-chunk
    device work is a single dispatch; the separate jitted-mel call (and
    its ~27 ms tunnel round trip + host hop) disappears."""
    from ..audio.mel import log_mel_from_frames
    from ..models.whisper import encode
    mel = log_mel_from_frames(frames, n_mels=cfg.n_mels,
                              n_frames=2 * cfg.n_audio_ctx)
    xa = encode(params, mel, cfg, compute_dtype=compute_dtype)
    return decode_window_impl(params, xa, prompt_tokens, pad_lens, sot_idx,
                              tables, temperature, rng, cfg, sample_len,
                              compute_dtype, q8_kv, xattn_bf16, sampling)


frames_encode_decode_window_jit = functools.partial(
    jax.jit, static_argnames=_WINDOW_STATICS)(frames_encode_decode_window_impl)


def decode_window_dispatch(
    params,
    xa: Optional[jnp.ndarray],
    prompts: Sequence[Sequence[int]],
    cfg: WhisperConfig,
    tables: RuleTables,
    opts: DecodeOptions,
    temperature=0.0,             # scalar or per-element sequence
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    mel: Optional[jnp.ndarray] = None,   # fuse encode into the dispatch
    frames: Optional[jnp.ndarray] = None,  # fuse mel+encode (framed audio)
    mesh=None,                   # dp-only mesh -> shard_map serving path
    speculative: int = 0,        # k>0: exact speculative greedy
                                 # (decode/speculative.py) when the whole
                                 # batch is greedy; pool = draft_pool
    draft_pool: int = 4,
    draft=None,                  # (draft_params, draft_cfg) second-model
                                 # draft (distil pairing); None = self
):
    """Pad prompts and LAUNCH the jitted window decode; returns an opaque
    handle of in-flight device arrays for :func:`decode_window_finalize`.

    JAX dispatch is asynchronous: this returns as soon as the program is
    enqueued, so a caller (pipeline/batcher.py) can overlap host work for
    the NEXT batch with the device executing this one.

    With a dp-only ``mesh`` (parallel/spmd.py::spmd_serving_enabled) the
    program is shard_mapped over the batch axis: every chip runs the full
    single-chip program — Pallas kernels included — on its batch shard
    (the batch must be divisible by dp; the batcher pads it)."""
    n = len(prompts)
    # opts may carry the speculative knobs (DecodeOptions.speculative) —
    # an explicit dispatch argument wins
    speculative = speculative or opts.speculative
    if draft_pool == 4 and opts.draft_pool != 4:
        draft_pool = opts.draft_pool
    prompt_tokens, pad_lens = pad_prompts(prompts, cfg.eot)
    p_max = prompt_tokens.shape[1]
    sot_idx = np.array([pad_lens[i] + list(p).index(cfg.sot)
                        for i, p in enumerate(prompts)], np.int32)
    sample_len = opts.sample_len or cfg.n_text_ctx // 2
    sample_len = min(sample_len, cfg.n_text_ctx - p_max)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    temps = np.broadcast_to(np.asarray(temperature, np.float32),
                            (n,)).copy()

    import os
    xattn_bf16 = (opts.xattn_bf16
                  or bool(os.environ.get("NWT_XATTN_BF16"))
                  or kt_xattn_default(compute_dtype))
    from ..parallel.spmd import spmd_serving_enabled
    if (speculative > 0 and not np.any(temps > 0)
            and not spmd_serving_enabled(mesh)):
        # exact speculative greedy (opt-in; token-identical to the
        # sequential loop — test_speculative.py). Greedy batches only:
        # ladder retries (t>0) fall through to the sampling programs.
        from .speculative import (decode_window_speculative_jit,
                                  encode_decode_speculative_jit,
                                  frames_encode_decode_speculative_jit)
        d_params, d_cfg = draft if draft is not None else (params, cfg)
        common = (jnp.asarray(prompt_tokens), jnp.asarray(pad_lens),
                  jnp.asarray(sot_idx), tables, cfg, d_cfg, sample_len,
                  speculative, draft_pool, compute_dtype, xattn_bf16,
                  opts.q8_cross_kv, draft is None)
        if frames is not None:
            tokens, n_sampled, sum_lp, nsp, passes = \
                frames_encode_decode_speculative_jit(
                    params, d_params, frames, *common)
        elif mel is not None:
            tokens, n_sampled, sum_lp, nsp, passes = \
                encode_decode_speculative_jit(params, d_params, mel,
                                              *common)
        else:
            tokens, n_sampled, sum_lp, nsp, passes = \
                decode_window_speculative_jit(params, d_params, xa,
                                              *common)
        # 6th element: pass count for acceptance observability (the
        # batcher records emitted/pass into /stats); finalize ignores
        # extras
        return (tokens, n_sampled, sum_lp, nsp, temps, passes)
    if spmd_serving_enabled(mesh):
        from ..parallel.spmd import (default_kernel_mode,
                                     window_decode_spmd_jit)
        kind, data = (("frames", frames) if frames is not None
                      else ("mel", mel) if mel is not None
                      else ("xa", xa))
        tokens, n_sampled, sum_lp, nsp = window_decode_spmd_jit(
            params, data, jnp.asarray(prompt_tokens),
            jnp.asarray(pad_lens), jnp.asarray(sot_idx), tables,
            jnp.asarray(temps), rng, mesh, cfg, sample_len, compute_dtype,
            q8_kv=opts.q8_cross_kv, xattn_bf16=xattn_bf16,
            sampling=bool(np.any(temps > 0)), kind=kind,
            kernels=default_kernel_mode(),
            speculative=speculative, draft_pool=draft_pool)
    elif frames is not None:
        tokens, n_sampled, sum_lp, nsp = frames_encode_decode_window_jit(
            params, frames, jnp.asarray(prompt_tokens),
            jnp.asarray(pad_lens), jnp.asarray(sot_idx), tables,
            jnp.asarray(temps), rng, cfg, sample_len, compute_dtype,
            q8_kv=opts.q8_cross_kv, xattn_bf16=xattn_bf16,
            sampling=bool(np.any(temps > 0)))
    elif mel is not None:
        tokens, n_sampled, sum_lp, nsp = encode_decode_window_jit(
            params, mel, jnp.asarray(prompt_tokens), jnp.asarray(pad_lens),
            jnp.asarray(sot_idx), tables,
            jnp.asarray(temps), rng, cfg, sample_len, compute_dtype,
            q8_kv=opts.q8_cross_kv, xattn_bf16=xattn_bf16,
            sampling=bool(np.any(temps > 0)))
    else:
        tokens, n_sampled, sum_lp, nsp = decode_window_jit(
            params, xa, jnp.asarray(prompt_tokens), jnp.asarray(pad_lens),
            jnp.asarray(sot_idx), tables,
            jnp.asarray(temps), rng, cfg, sample_len, compute_dtype,
            q8_kv=opts.q8_cross_kv, xattn_bf16=xattn_bf16,
            sampling=bool(np.any(temps > 0)))
    return (tokens, n_sampled, sum_lp, nsp, temps)


def decode_window_finalize(handle) -> List[WindowResult]:
    """Block on the device arrays from :func:`decode_window_dispatch` and
    score them into WindowResults."""
    tokens, n_sampled, sum_lp, nsp, temps = handle[:5]
    tokens = np.asarray(tokens)
    n_sampled = np.asarray(n_sampled)
    sum_lp = np.asarray(sum_lp)
    nsp = np.asarray(nsp)

    out = []
    for i in range(tokens.shape[0]):
        toks = tokens[i, : n_sampled[i]].tolist()
        avg = float(sum_lp[i]) / (len(toks) + 1)
        out.append(WindowResult(
            tokens=toks,
            sum_logprob=float(sum_lp[i]),
            avg_logprob=avg,
            no_speech_prob=float(nsp[i]),
            temperature=float(temps[i]),
        ))
    return out


def decode_window(
    params,
    xa: jnp.ndarray,
    prompts: Sequence[Sequence[int]],
    cfg: WhisperConfig,
    tables: RuleTables,
    opts: DecodeOptions,
    temperature=0.0,             # scalar or per-element sequence
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    mel: Optional[jnp.ndarray] = None,   # fuse encode into the dispatch
) -> List[WindowResult]:
    """Host wrapper: pad prompts, run the jitted loop, score results.

    Pass ``mel`` (and xa=None) to run mel->encode->decode as one device
    program (single dispatch — the serving fast path)."""
    return decode_window_finalize(decode_window_dispatch(
        params, xa, prompts, cfg, tables, opts, temperature, rng,
        compute_dtype, mel))


def frames_encode_detect_impl(params, frames, cfg: WhisperConfig,
                              compute_dtype=jnp.float32):
    """STFT frames -> mel -> encoder states + detected languages in ONE
    device program. The auto-language serving path (the production
    default) previously dispatched mel, encode, and language detection
    separately — three tunnel round trips (~27 ms each on this box)
    before the decode dispatch. Returns (xa, lang_idx, lang_probs); xa
    stays on device and feeds decode_window_dispatch."""
    from ..audio.mel import log_mel_from_frames
    from ..models.whisper import encode
    mel = log_mel_from_frames(frames, n_mels=cfg.n_mels,
                              n_frames=2 * cfg.n_audio_ctx)
    xa = encode(params, mel, cfg, compute_dtype=compute_dtype)
    lang_idx, lang_probs = _detect_language(params, xa, cfg, compute_dtype)
    return xa, lang_idx, lang_probs


frames_encode_detect_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype"))(
        frames_encode_detect_impl)


def frames_encode_impl(params, frames, cfg: WhisperConfig,
                       compute_dtype=jnp.float32):
    """STFT frames -> mel -> encoder states in ONE device program,
    WITHOUT language detection: the beam batcher's fixed-language stage
    needs explicit encoder states but has no auto-language rows, so the
    detect forward would be pure waste (review finding round 3)."""
    from ..audio.mel import log_mel_from_frames
    from ..models.whisper import encode
    mel = log_mel_from_frames(frames, n_mels=cfg.n_mels,
                              n_frames=2 * cfg.n_audio_ctx)
    return encode(params, mel, cfg, compute_dtype=compute_dtype)


frames_encode_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "compute_dtype"))(frames_encode_impl)


def frames_encode_dispatch(params, frames, cfg: WhisperConfig,
                           compute_dtype=jnp.float32, mesh=None):
    """Mesh-aware entry for the frames -> mel -> encode stage (no
    detect); dp-only meshes take the shard_map program."""
    from ..parallel.spmd import spmd_serving_enabled
    if spmd_serving_enabled(mesh):
        from ..parallel.spmd import (default_kernel_mode,
                                     frames_encode_spmd_jit)
        return frames_encode_spmd_jit(
            params, frames, mesh, cfg, compute_dtype,
            kernels=default_kernel_mode())
    return frames_encode_jit(params, frames, cfg, compute_dtype)


def frames_encode_detect_dispatch(params, frames, cfg: WhisperConfig,
                                  compute_dtype=jnp.float32, mesh=None):
    """Mesh-aware entry for the frames -> mel -> encode -> detect stage:
    dp-only meshes take the shard_map program (parallel/spmd.py), same as
    decode_window_dispatch does for the decode stage — callers pass
    mesh= and never branch on the spmd gate themselves."""
    from ..parallel.spmd import spmd_serving_enabled
    if spmd_serving_enabled(mesh):
        from ..parallel.spmd import (default_kernel_mode,
                                     frames_encode_detect_spmd_jit)
        return frames_encode_detect_spmd_jit(
            params, frames, mesh, cfg, compute_dtype,
            kernels=default_kernel_mode())
    return frames_encode_detect_jit(params, frames, cfg, compute_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def detect_language_jit(params, xa, tables: RuleTables, cfg: WhisperConfig,
                        compute_dtype=jnp.float32):
    """Single forward from [sot]: softmax over the language tokens.

    whisper.cpp runs this when no language is set (auto mode, reference
    src-tauri/src/whisper.rs:91-95)."""
    return _detect_language(params, xa, cfg, compute_dtype)


def _detect_language(params, xa, cfg: WhisperConfig,
                     compute_dtype=jnp.float32):
    b = xa.shape[0]
    cross_kv = precompute_cross_kv(params, xa, cfg)
    cache = init_kv_cache(cfg, b, dtype=compute_dtype, t_ctx=8)
    sot = jnp.full((b, 1), cfg.sot, jnp.int32)
    logits, _ = decoder_forward(params, sot, jnp.int32(0),
                                jnp.zeros((b,), jnp.int32),
                                cache, cross_kv, cfg, compute_dtype)
    logits = logits[:, 0]
    mask = jnp.zeros((cfg.n_vocab,), bool).at[
        cfg.lang_base: cfg.lang_base + cfg.n_langs].set(True)
    masked = jnp.where(mask[None, :], logits, _NEG)
    probs = jax.nn.softmax(masked, axis=-1)
    lang_probs = jax.lax.dynamic_slice_in_dim(
        probs, cfg.lang_base, cfg.n_langs, axis=1)
    return jnp.argmax(lang_probs, axis=-1), lang_probs
