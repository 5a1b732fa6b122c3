"""Long-form transcription: chained 30 s windows with rolling context.

Reproduces the sliding-window algorithm whisper.cpp runs inside
``state.full`` for >30 s inputs (the reference leans on it at
src-tauri/src/whisper.rs:128 with ``no_context(false)`` keeping context
between windows, whisper.rs:117), which is openai-whisper's transcribe()
loop: window decode -> temperature fallback ladder -> no-speech gate ->
timestamp-driven seek -> previous text as the next window's prompt.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (HOP_LENGTH, N_FRAMES, N_SAMPLES, SAMPLE_RATE,
                           WhisperConfig)
from ..decode.greedy import WindowResult, decode_window, detect_language_jit
from ..decode.rules import (DecodeOptions, build_rule_tables, is_no_speech,
                            needs_fallback, token_entropy)

# mel frames per timestamp step (20 ms / 10 ms-per-frame)
INPUT_STRIDE = 2
TIME_PRECISION = 0.02


@dataclasses.dataclass
class Segment:
    id: int
    seek: int                  # window start, mel frames
    start: float               # seconds
    end: float
    text: str
    tokens: List[int]          # includes timestamp tokens
    temperature: float
    avg_logprob: float
    no_speech_prob: float
    words: Optional[list] = None   # WordTiming list when word_timestamps


@dataclasses.dataclass
class TranscribeResult:
    text: str
    segments: List[Segment]
    language: str


def _submit_timeout() -> float:
    from .batcher import submit_timeout_s
    return submit_timeout_s()


def _temperature_ladder(opts: DecodeOptions) -> List[float]:
    temps = [opts.temperature]
    if opts.temperature_increment:
        t = opts.temperature + opts.temperature_increment
        while t <= opts.max_temperature + 1e-9:
            temps.append(round(t, 10))
            t += opts.temperature_increment
    return temps


def decode_with_fallback(
    params, xa, prompt: Sequence[int], cfg: WhisperConfig, tables, opts,
    rng=None, compute_dtype=jnp.float32, tokenizer=None,
) -> WindowResult:
    """Temperature ladder: retry the window while quality gates fail
    (logprob_threshold / entropy_threshold / compression_ratio —
    whisper.rs:121-124 values). A window flagged as silence
    (no_speech_prob > threshold) breaks the ladder at the first rung —
    the no-speech gate downstream will skip it (openai transcribe()).

    At temperature>0 with best_of>1 (whisper.cpp Greedy{best_of},
    whisper.rs:88), best_of candidates are sampled as ONE tiled device
    batch and the highest avg-logprob candidate wins (openai
    MaximumLikelihoodRanker semantics: rank by sum/len).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    result = None
    for temp in _temperature_ladder(opts):
        rng, sub = jax.random.split(rng)
        if temp == 0 and opts.beam_size and opts.beam_size > 1:
            # beam search at zero temperature; sampling ladder above it
            # (openai/whisper.cpp fallback semantics)
            from ..decode.beam import beam_decode_window
            result = beam_decode_window(
                params, xa, [prompt], cfg, tables,
                beam_size=opts.beam_size, sample_len=opts.sample_len,
                compute_dtype=compute_dtype)[0]
        elif temp > 0 and opts.best_of and opts.best_of > 1:
            # best_of candidates in one batch: rows sample independently
            # (categorical draws are per-row), pick the best by sum/len
            xa_rep = jnp.repeat(xa, opts.best_of, axis=0)
            cands = decode_window(params, xa_rep, [prompt] * opts.best_of,
                                  cfg, tables, opts, temperature=temp,
                                  rng=sub, compute_dtype=compute_dtype)
            result = max(cands, key=lambda r: r.sum_logprob /
                         max(len(r.tokens), 1))
        else:
            result = decode_window(params, xa, [prompt], cfg, tables, opts,
                                   temperature=temp, rng=sub,
                                   compute_dtype=compute_dtype)[0]
        entropy = token_entropy(result.tokens)
        text = (tokenizer.decode(result.tokens)
                if tokenizer is not None else None)
        if not needs_fallback(result.avg_logprob, entropy,
                              len(result.tokens), opts, text=text,
                              no_speech_prob=result.no_speech_prob):
            break
    return result


def _split_segments(
    tokens: List[int], tb: int, segment_size: int, time_offset: float,
) -> Tuple[List[dict], int]:
    """openai-whisper's timestamp bookkeeping: slice a window's tokens into
    segments and compute the next seek position (mel frames)."""
    ts = [t >= tb for t in tokens]
    single_ts_ending = len(ts) >= 2 and ts[-1] and not ts[-2]

    consecutive = [i + 1 for i in range(len(tokens) - 1)
                   if ts[i] and ts[i + 1]]
    segments = []
    if consecutive:
        slices = list(consecutive)
        if single_ts_ending:
            slices.append(len(tokens))
        last = 0
        for cur in slices:
            part = tokens[last:cur]
            start_pos = part[0] - tb
            end_pos = part[-1] - tb
            segments.append(dict(
                start=time_offset + start_pos * TIME_PRECISION,
                end=time_offset + end_pos * TIME_PRECISION,
                tokens=part,
            ))
            last = cur
        if single_ts_ending:
            advance = segment_size
        else:
            last_ts_pos = tokens[last - 1] - tb
            advance = last_ts_pos * INPUT_STRIDE
    else:
        duration = segment_size * HOP_LENGTH / SAMPLE_RATE
        ts_tokens = [t for t in tokens if t >= tb]
        if ts_tokens and ts_tokens[-1] != tb:
            duration = (ts_tokens[-1] - tb) * TIME_PRECISION
        segments.append(dict(
            start=time_offset,
            end=time_offset + duration,
            tokens=tokens,
        ))
        advance = segment_size
    return segments, advance


def transcribe_mel(
    params,
    mel: np.ndarray,               # (n_mels, content_frames [+30 s pad])
    content_frames: int,
    cfg: WhisperConfig,
    tokenizer,
    opts: DecodeOptions,
    initial_prompt_tokens: Optional[Sequence[int]] = None,
    encode_fn=None,
    compute_dtype=jnp.float32,
    rng=None,
    alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
    batcher=None,
) -> TranscribeResult:
    """Sequential window loop over a precomputed long-form mel.

    ``alignment_heads``: tuned (layer, head) list for word-timestamp DTW
    (from checkpoint metadata); falls back to the upper-half-layers
    heuristic when absent.

    ``batcher``: an optional WindowBatcher. When given, each window's
    decode is SUBMITTED to the shared batcher instead of dispatched
    directly — windows from concurrent callers (N files transcribed in
    parallel, N live sessions) pack into one device batch. The window
    chain stays sequential per call (window N+1's prompt needs window
    N's text — the algorithm, not an implementation limit), so the
    cross-caller batch is the only parallelism available, exactly the
    reference's serialized-GPU observation (whisper.rs:151) solved the
    TPU way. The batcher's opts must equal ``opts`` (its rule tables and
    strategy are baked at construction); word_timestamps and best_of>1
    need the sequential path (they consume the encoder states / tile the
    batch axis). Ladder retries above temperature 0 sample with the
    batcher's per-dispatch rng rather than this function's ``rng``."""
    if batcher is not None and (
            opts.word_timestamps or (opts.best_of or 1) > 1):
        raise ValueError("batched long-form supports neither "
                         "word_timestamps nor best_of>1; "
                         "use the sequential path")
    from ..models.whisper import encode_jit
    encode_fn = encode_fn or (
        lambda m: encode_jit(params, m, cfg, compute_dtype))

    tables = build_rule_tables(cfg, opts, tokenizer)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tb = cfg.timestamp_begin

    language = opts.language
    all_tokens: List[int] = []
    prompt_reset_since = 0
    if initial_prompt_tokens:
        # prompt_reset_since stays 0 so the initial prompt (vocabulary +
        # rolling context, whisper.rs:98-109) actually conditions the
        # first window — it is only skipped past after a high-temperature
        # fallback resets the prompt (openai semantics). Setting it to
        # len(all_tokens) here made the biasing a silent no-op.
        all_tokens.extend(initial_prompt_tokens)

    # mel frames per window: 2 frames per encoder position (3000 for the
    # real ladder; smaller for synthetic test configs)
    window_frames = 2 * cfg.n_audio_ctx

    segments: List[Segment] = []
    seek = 0
    while seek < content_frames:
        segment_size = min(window_frames, content_frames - seek)
        window = mel[:, seek: seek + window_frames]
        if window.shape[1] < window_frames:
            window = np.pad(window,
                            ((0, 0), (0, window_frames - window.shape[1])))
        from ..utils.profiling import stage_timer
        xa = None
        if batcher is None:
            with stage_timer("encode"):
                xa = encode_fn(jnp.asarray(window[None]))
            if language is None and cfg.multilingual:
                lang_idx, _ = detect_language_jit(params, xa, tables, cfg,
                                                  compute_dtype)
                from ..core.tokenizer import LANGUAGES
                language = LANGUAGES[int(np.asarray(lang_idx)[0])]
        lang = language or "en"

        # prompt: [sot_prev, rolling text...] + sot sequence. In batched
        # mode with language still unknown, "en" is a placeholder and
        # lang_slot marks the token the batcher patches after its batched
        # language-detect forward (whisper.rs:91-95 analog).
        prompt: List[int] = []
        if all_tokens[prompt_reset_since:]:
            prompt.append(cfg.sot_prev)
            prompt.extend(all_tokens[prompt_reset_since:]
                          [-(cfg.n_text_ctx // 2 - 1):])
        sot_pos = len(prompt)
        prompt.extend(tokenizer.sot_sequence(
            language=lang if cfg.multilingual else None,
            task=opts.task, timestamps=opts.timestamps))

        if batcher is None:
            rng, sub = jax.random.split(rng)
            with stage_timer("decode"):
                result = decode_with_fallback(params, xa, prompt, cfg,
                                              tables, opts, rng=sub,
                                              compute_dtype=compute_dtype,
                                              tokenizer=tokenizer)
        else:
            lang_slot = (sot_pos + 1 if language is None
                         and cfg.multilingual else None)
            # temperature ladder at this level: each rung's submit packs
            # with whatever other callers have in flight
            result = None
            for temp in _temperature_ladder(opts):
                result = batcher.submit(
                    window, prompt, temperature=temp,
                    lang_slot=lang_slot).result(timeout=_submit_timeout())
                if lang_slot is not None and result.language:
                    language = result.language
                    prompt[lang_slot] = \
                        tokenizer.language_token(language)
                    lang_slot = None
                text_chk = tokenizer.decode(result.tokens)
                if not needs_fallback(result.avg_logprob,
                                      token_entropy(result.tokens),
                                      len(result.tokens), opts,
                                      text=text_chk,
                                      no_speech_prob=result.no_speech_prob):
                    break
            lang = language or "en"

        time_offset = seek * HOP_LENGTH / SAMPLE_RATE
        if is_no_speech(result.no_speech_prob, result.avg_logprob, opts):
            seek += segment_size  # silence: skip the whole window
            continue

        raw_segments, advance = _split_segments(
            result.tokens, tb, segment_size, time_offset)

        window_words = None
        if opts.word_timestamps and result.tokens:
            from ..decode.timing import find_word_timings, merge_punctuations
            sot_seq = tokenizer.sot_sequence(
                language=lang if cfg.multilingual else None,
                task=opts.task, timestamps=opts.timestamps)
            window_words = find_word_timings(
                params, cfg, tokenizer, xa, result.tokens, sot_seq,
                num_frames=segment_size, time_offset=time_offset,
                alignment_heads=alignment_heads)
            merge_punctuations(window_words)
            from ..decode.timing import refine_word_durations
            refine_word_durations(window_words)

        # partition words over segments by TOKEN ordinal, never by time
        # (openai semantics): time-window matching duplicated words into
        # adjacent segments and let refinement overlap their bounds.
        # Words consume the window's text tokens in order, so a running
        # clean-token cursor assigns each word to the segment its first
        # token falls in.
        word_starts = None
        if window_words is not None:
            word_starts, c = [], 0
            for w in window_words:
                word_starts.append(c)
                c += len(w.tokens)

        n_before = len(segments)
        seg_tok_cursor = 0
        for rs in raw_segments:
            text = tokenizer.decode(rs["tokens"]).strip()
            n_clean = sum(1 for t in rs["tokens"] if t < cfg.eot)
            seg_lo = seg_tok_cursor
            seg_tok_cursor += n_clean
            if not text:
                continue
            words = None
            if window_words is not None:
                words = [w for w, s in zip(window_words, word_starts)
                         if seg_lo <= s < seg_tok_cursor]
            segments.append(Segment(
                id=len(segments), seek=seek,
                start=rs["start"], end=rs["end"], text=text,
                tokens=rs["tokens"], temperature=result.temperature,
                avg_logprob=result.avg_logprob,
                no_speech_prob=result.no_speech_prob,
                words=words))

        if window_words is not None:
            # segment-level refinement: snap this window's segment bounds
            # to their word anchors (openai word_timestamps adjustment)
            from ..decode.timing import refine_segments_with_words
            refine_segments_with_words(
                segments[n_before:], window_words,
                window_end=time_offset
                + segment_size * HOP_LENGTH / SAMPLE_RATE)

        # rolling context: text tokens only (whisper.cpp keeps text, not
        # timestamps, in prompt_past)
        all_tokens.extend(t for t in result.tokens if t < cfg.eot)
        if result.temperature > 0.5:
            # unreliable window: don't condition the next one on it
            prompt_reset_since = len(all_tokens)

        seek += max(advance, 1)

    text = "".join(s.text if s.text.startswith(" ") else " " + s.text
                   for s in segments).strip()
    return TranscribeResult(text=text, segments=segments,
                            language=language or "en")
