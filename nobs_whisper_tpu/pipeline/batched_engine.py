"""Engine wrapper routing window decodes through the shared batcher.

Streaming sessions call ``engine.transcribe`` per VAD chunk; chunks are
<= 25 s (the forced-split cap) so each is a single window. This wrapper
keeps the WhisperEngine API but funnels those single-window decodes into
one WindowBatcher, so N concurrent push-to-talk sessions share one jitted
device batch — the TPU replacement for the reference's serialized
chunk queue (src-tauri/src/whisper.rs:151).

Multi-window audio falls back to the sequential long-form path.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
from typing import List, Optional

import numpy as np

from ..audio.mel import HOP_LENGTH
from ..core.config import SAMPLE_RATE
from ..decode.hallucination import filter_hallucinations
from ..decode.rules import DecodeOptions
from ..pipeline.batcher import WindowBatcher
from ..pipeline.longform import (Segment, TranscribeResult,
                                 _submit_timeout)

log = logging.getLogger(__name__)


class BatchedEngine:
    """Same surface as WhisperEngine.transcribe, batched across callers."""

    def __init__(self, engine, opts: Optional[DecodeOptions] = None,
                 max_batch: int = 8, max_wait_ms: float = 5.0, mesh=None,
                 speculative: int = 0, draft_pool: Optional[int] = None,
                 draft_engine=None):
        self.engine = engine
        self.opts = opts or DecodeOptions()
        # observability: the temperature-fallback ladder multiplies device
        # work invisibly (each retry is a full batched window decode) —
        # count chunks vs submits so /stats and the live-fire bench can
        # attribute serving cost (whisper.rs's analogous ladder is the
        # dominant cost on low-confidence audio too). Scope: the
        # single-window fast path only — i.e. every session VAD chunk on
        # a real 30 s-window model (chunks are <=25 s); multi-window
        # long-form files route through transcribe_mel and are not
        # attributed here.
        self._stats_lock = threading.Lock()
        self.chunk_count = 0
        self.fallback_retries = 0
        self.tokens_emitted = 0
        self.batcher = WindowBatcher(
            engine.params, engine.cfg, engine.tokenizer, self.opts,
            max_batch=max_batch, max_wait_ms=max_wait_ms,
            compute_dtype=engine.compute_dtype, mesh=mesh,
            speculative=speculative, draft_pool=draft_pool,
            draft=(None if draft_engine is None
                   else (draft_engine.params, draft_engine.cfg)))

    # passthroughs
    @property
    def cfg(self):
        return self.engine.cfg

    @property
    def tokenizer(self):
        return self.engine.tokenizer

    @property
    def loaded(self):
        return self.engine.loaded

    @property
    def model_path(self):
        # /health reports the serving model (getattr on the engine);
        # proxy it or a batched server always shows "model": null
        return getattr(self.engine, "model_path", None)

    def close(self):
        self.batcher.close()

    def warmup(self, **kw):
        """Pre-compile the serving programs for every padded batch size
        (see WindowBatcher.warmup)."""
        return self.batcher.warmup(**kw)

    def _transcribe_longform_batched(self, audio: np.ndarray,
                                     language: Optional[str],
                                     vocabulary: Optional[str],
                                     context: Optional[str]
                                     ) -> TranscribeResult:
        """Long-form via the shared batcher (WhisperEngine.transcribe
        semantics — api.py — with every window decode submitted to the
        batcher instead of dispatched sequentially)."""
        from ..audio.mel import log_mel_longform
        from ..utils.profiling import stage_timer
        from .longform import transcribe_mel

        eng = self.engine
        if language == "auto":
            lang = None
        elif language is None:
            lang = self.opts.language
        else:
            lang = language
        opts = dataclasses.replace(self.opts, language=lang)
        with stage_timer("mel"):
            mel = log_mel_longform(audio, n_mels=eng.cfg.n_mels)
        content_frames = audio.shape[0] // HOP_LENGTH
        initial = eng.build_initial_prompt(vocabulary, context)
        result = transcribe_mel(
            eng.params, mel, content_frames, eng.cfg, eng.tokenizer,
            opts, initial_prompt_tokens=initial,
            compute_dtype=eng.compute_dtype,
            alignment_heads=eng.alignment_heads,
            batcher=self.batcher)
        filtered = filter_hallucinations(result.text)
        return TranscribeResult(text=filtered, segments=result.segments,
                                language=result.language)

    def transcribe(self, audio: np.ndarray, language: Optional[str] = None,
                   vocabulary: Optional[str] = None,
                   context: Optional[str] = None,
                   task: Optional[str] = None,
                   opts: Optional[DecodeOptions] = None) -> TranscribeResult:
        if task is not None:
            # surface parity with WhisperEngine.transcribe: fold the
            # kwarg into opts so the fast-path/fallback routing treats
            # it like any other strategy override
            opts = dataclasses.replace(opts or DecodeOptions(), task=task)
        cfg = self.engine.cfg
        audio = np.asarray(audio, dtype=np.float32)
        window_frames = 2 * cfg.n_audio_ctx
        content_frames = audio.shape[0] // HOP_LENGTH
        # callers passing opts=None mean "the server's configured
        # strategy" — the fallback must inherit self.opts, or a
        # translate/beam-configured server would silently decode
        # long-form audio with greedy-transcribe defaults
        eff = opts if opts is not None else self.opts
        if content_frames > window_frames \
                or (opts is not None and opts != self.opts) \
                or (self.opts.best_of or 1) > 1:
            if content_frames > window_frames and eff == self.opts \
                    and not eff.word_timestamps \
                    and (eff.best_of or 1) <= 1:
                # long-form with the batcher's own strategy: run the
                # window chain through the SHARED batcher, so concurrent
                # long files batch across callers (longform.transcribe_mel
                # batcher mode)
                return self._transcribe_longform_batched(
                    audio, language, vocabulary, context)
            # custom options, word timestamps, or best_of sampling (which
            # tiles the batch axis): sequential path
            return self.engine.transcribe(audio, language=language,
                                          vocabulary=vocabulary,
                                          context=context, opts=eff)

        # serving fast path: frame the chunk on the host (a strided
        # memcpy) and let the batcher's ONE device program do
        # mel -> encode -> decode — no per-chunk jitted-mel dispatch.
        # frame_window_np + log_mel_from_frames reproduce
        # log_mel_longform's first window exactly (test_mel.py).
        from ..audio.mel import frame_window_np, n_real_frames
        frames = frame_window_np(audio, n_frames=window_frames)
        # transfer only the real-frame prefix (rows past the audio tail
        # are exactly zero); the batcher buckets the batch to a common
        # length and the device program zero-pads back bit-identically
        frames = frames[: n_real_frames(len(audio), window_frames)]

        lang = language if language not in (None, "auto") else None
        prompt: List[int] = []
        initial = self.engine.build_initial_prompt(vocabulary, context)
        if initial:
            prompt.append(cfg.sot_prev)
            prompt.extend(initial[-(cfg.n_text_ctx // 2 - 1):])
        sot_pos = len(prompt)
        prompt.extend(self.engine.tokenizer.sot_sequence(
            language=(lang or "en") if cfg.multilingual else None,
            task=self.opts.task))
        # auto mode: the batcher detects the language with one extra
        # batched forward and patches the token after <|sot|>
        # (whisper.rs:91-95)
        lang_slot = (sot_pos + 1
                     if lang is None and cfg.multilingual else None)

        # temperature fallback ladder through the shared batcher: retries
        # at higher temperature batch together with other sessions' work
        from ..decode.rules import (is_no_speech, needs_fallback,
                                    token_entropy)
        from .longform import _temperature_ladder

        result, text = None, ""
        attempts = 0
        for temp in _temperature_ladder(self.opts):
            attempts += 1
            result = self.batcher.submit(
                None, prompt, temperature=temp,
                lang_slot=lang_slot, frames=frames).result(timeout=_submit_timeout())
            if lang_slot is not None and result.language:
                # reuse the detected language on retries
                lang = result.language
                prompt[lang_slot] = \
                    self.engine.tokenizer.language_token(lang)
                lang_slot = None
            text = self.engine.tokenizer.decode(result.tokens)
            if not needs_fallback(result.avg_logprob,
                                  token_entropy(result.tokens),
                                  len(result.tokens), self.opts, text=text,
                                  no_speech_prob=result.no_speech_prob):
                break

        with self._stats_lock:
            self.chunk_count += 1
            self.fallback_retries += attempts - 1
            self.tokens_emitted += len(result.tokens)

        final_lang = lang or result.language or "en"
        # no-speech gate: silent windows emit nothing, matching the
        # sequential path (longform.transcribe_mel) and the reference's
        # no_speech_thold 0.6 (whisper.rs:122)
        if is_no_speech(result.no_speech_prob, result.avg_logprob,
                        self.opts):
            return TranscribeResult(text="", segments=[],
                                    language=final_lang)

        text = filter_hallucinations(text.strip())
        seg = Segment(
            id=0, seek=0, start=0.0,
            end=content_frames * HOP_LENGTH / SAMPLE_RATE,
            text=text, tokens=result.tokens,
            temperature=result.temperature,
            avg_logprob=result.avg_logprob,
            no_speech_prob=result.no_speech_prob)
        return TranscribeResult(text=text, segments=[seg] if text else [],
                                language=final_lang)
