"""Cross-session window batcher.

The reference serializes chunks on one GPU ("GPU can only process one at a
time", src-tauri/src/whisper.rs:151). The TPU rebuild replaces that queue
with *batching*: concurrent sessions' 30 s windows are packed into one
jitted decode batch (the ragged-batch decoder handles differing prompts),
so chip utilization scales with concurrent load — the BASELINE config-#5
scenario (streaming, batch=8).

Batch sizes are padded to a small fixed set {1,2,4,8,...} to bound XLA
recompiles; padding rows replicate a real row and are dropped on return.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import WhisperConfig
from ..decode.greedy import WindowResult, decode_window
from ..decode.rules import DecodeOptions, RuleTables, build_rule_tables

log = logging.getLogger(__name__)


def submit_timeout_s() -> float:
    """Submit-side future timeout for callers blocking on batcher
    results. The batcher's own watchdog (NWT_BATCH_DEADLINE_S, default
    900 s — generous because a first batch legitimately includes a
    minutes-long remote XLA compile) is the real wedge guard and fails
    the future with an error; this outer timeout is only a second line
    of defense and must stay LONGER than the watchdog or a legitimate
    slow compile aborts the caller with a raw TimeoutError first.
    """
    import os
    return float(os.environ.get("NWT_BATCH_DEADLINE_S", 900.0)) + 120.0


@dataclasses.dataclass
class _Request:
    mel: Optional[np.ndarray]   # (n_mels, 2*n_audio_ctx), or None
    prompt: List[int]
    future: Future
    temperature: float = 0.0
    # index into prompt whose token is replaced by the detected language
    # (auto-language mode, whisper.rs:91-95); None = language fixed
    lang_slot: Optional[int] = None
    # STFT-framed audio (N_FRAMES, N_FFT) — the fused mel+encode+decode
    # fast path (one device dispatch per batch, no per-chunk mel call)
    frames: Optional[np.ndarray] = None


def _pad_batch_size(n: int, max_batch: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, max_batch)


class WindowBatcher:
    """Background thread packing window-decode requests into device batches."""

    def __init__(self, params, cfg: WhisperConfig, tokenizer=None,
                 opts: Optional[DecodeOptions] = None, max_batch: int = 8,
                 max_wait_ms: float = 5.0, compute_dtype=jnp.float32,
                 encode_fn=None, mesh=None,
                 batch_deadline_s: Optional[float] = None,
                 speculative: int = 0, draft_pool: Optional[int] = None,
                 draft=None):
        """``mesh``: a (dp, tp) jax.sharding.Mesh. When given, params are
        placed with tensor-parallel shardings and every window batch is
        sharded over dp — the SURVEY §2.3 "window batch over a mesh"
        serving mode (the reference serializes chunks on one GPU,
        src-tauri/src/whisper.rs:151)."""
        from ..models.whisper import encode_jit
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import shard_params
            params = shard_params(params, mesh)
            if max_batch % mesh.shape["dp"] != 0:
                raise ValueError(
                    f"max_batch ({max_batch}) must be divisible by dp "
                    f"({mesh.shape['dp']})")
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # exact speculative greedy decode (decode/speculative.py) for
        # all-greedy batches; 0 = off. An EXPLICIT constructor value
        # wins; NWT_SPECULATIVE/NWT_DRAFT_POOL only fill the defaults
        # (so an exported experiment knob cannot silently flip a
        # batcher that was configured the other way). Malformed env
        # values are ignored, not fatal at serve startup.
        import os as _os

        def _env_int(name, default):
            try:
                return int(_os.environ.get(name, "") or default)
            except ValueError:
                log.warning("ignoring malformed %s=%r", name,
                            _os.environ.get(name))
                return default
        self.speculative = (speculative if speculative
                            else _env_int("NWT_SPECULATIVE", 0))
        # None = unset (a real sentinel: an explicit draft_pool=4 must
        # NOT be silently overridden by an exported NWT_DRAFT_POOL)
        self.draft_pool = (draft_pool if draft_pool is not None
                           else _env_int("NWT_DRAFT_POOL", 4))
        # optional second-model draft (draft_params, draft_cfg) — the
        # distil pairing. Must share the vocab (acceptance compares
        # token ids) and the encoder width (the target's xa feeds the
        # draft's cross projections; Distil-Whisper freezes the teacher
        # encoder so this holds for the registry pairs).
        self.draft = draft
        if draft is not None and mesh is not None:
            # the shard_map serving program self-drafts; a configured
            # second-model draft would be silently ignored there
            log.warning("mesh serving self-drafts; the configured "
                        "second-model draft is ignored under a mesh")
        if draft is not None:
            d_cfg = draft[1]
            if (d_cfg.n_vocab != cfg.n_vocab
                    or d_cfg.n_audio_state != cfg.n_audio_state):
                raise ValueError(
                    f"draft model incompatible: vocab "
                    f"{d_cfg.n_vocab} vs {cfg.n_vocab}, encoder width "
                    f"{d_cfg.n_audio_state} vs {cfg.n_audio_state}")
        self.opts = opts or DecodeOptions()
        self.tables: RuleTables = build_rule_tables(cfg, self.opts, tokenizer)
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.compute_dtype = compute_dtype
        self._custom_encode = encode_fn is not None
        self._encode = encode_fn or (
            lambda m: encode_jit(self.params, m, cfg, compute_dtype))
        # Watchdog deadline for one in-flight batch. The TPU tunnel on
        # this platform occasionally wedges a dispatch indefinitely
        # (process idle, no output — transient, documented in CLAUDE.md);
        # without a deadline every session whose window sits in that
        # batch hangs forever. Reference analog: the non-blocking
        # stuck-thread cleanup + recv_timeout hard cap
        # (src-tauri/src/state.rs:61-95,622-631). Default is generous
        # because the FIRST batch legitimately includes a remote XLA
        # compile (minutes on this box).
        import os
        if batch_deadline_s is None:
            batch_deadline_s = float(
                os.environ.get("NWT_BATCH_DEADLINE_S", 900.0))
        self.batch_deadline_s = batch_deadline_s
        self.watchdog_trips = 0             # observability
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._running = True
        self.batch_sizes: List[int] = []    # observability
        # host->device bytes dispatched (audio/mel payloads): /stats
        # observability, and the denominator for judging this box's
        # per-transfer platform RSS leak (scripts/transfer_leak_probe.py)
        self.transferred_bytes: int = 0
        self.spec_stats: List[tuple] = []   # (passes, rows, emitted)
        self._thread.start()

    def _frame_buckets(self) -> List[int]:
        """The static frame-row shapes the batcher dispatches: a coarse
        {512, 1024, 2048, full} ladder (capped at the engine window).
        Coarse on purpose — every bucket is a separate remote compile
        per padded batch size, so warmup() warms this exact set and
        live traffic can never hit an unwarmed frames shape."""
        nf_full = 2 * self.cfg.n_audio_ctx
        return sorted({min(b, nf_full) for b in (512, 1024, 2048,
                                                 nf_full)})

    def _frame_bucket(self, n_real: int) -> int:
        for b in self._frame_buckets():
            if n_real <= b:
                return b
        return self._frame_buckets()[-1]

    # ------------------------------------------------------------------
    def submit(self, mel_window: Optional[np.ndarray], prompt: Sequence[int],
               temperature: float = 0.0,
               lang_slot: Optional[int] = None,
               frames: Optional[np.ndarray] = None
               ) -> "Future[WindowResult]":
        """Submit either a mel window or STFT ``frames`` (the fused fast
        path — see audio/mel.py::frame_window_np)."""
        if (mel_window is None) == (frames is None):
            raise ValueError("pass exactly one of mel_window / frames")
        if not self._running:
            # fail fast instead of parking the request in a queue no
            # thread will ever drain (a session can hold a hot-swap-
            # retired engine past its close)
            raise RuntimeError("batcher closed")
        fut: Future = Future()
        self._q.put(_Request(
            mel=(None if mel_window is None
                 else np.asarray(mel_window, np.float32)),
            prompt=list(prompt), future=fut,
            temperature=float(temperature),
            lang_slot=lang_slot,
            frames=(None if frames is None
                    else np.asarray(frames, np.float32))))
        return fut

    def warmup(self, auto_language: bool = True,
               timeout_s: float = 3600.0) -> List[int]:
        """Pre-compile the serving programs for every padded batch size
        the batcher can dispatch ({1,2,4,...,max_batch}, dp-rounded
        under a mesh) by pushing synthetic silent windows through the
        PRODUCTION submit path. Without this, the first live request of
        each size pays the remote compile (minutes fresh on this box's
        tunnel; seconds when the persistent jax cache is warm) inside
        its own latency budget. ``auto_language`` additionally warms the
        frames->encode->detect program (the production default path).
        Returns the list of warmed batch sizes."""
        if self.tokenizer is None:
            raise ValueError("warmup needs the batcher's tokenizer")
        cfg = self.cfg
        from ..audio.mel import frame_window_np
        wf = 2 * cfg.n_audio_ctx
        frames = frame_window_np(
            np.zeros(wf * 160, np.float32), n_frames=wf)
        sizes, k = [], 1
        while k < self.max_batch:
            sizes.append(k)
            k *= 2
        sizes.append(self.max_batch)
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            sizes = sorted({max(s, dp) + (-max(s, dp)) % dp
                            for s in sizes})
        sizes = sorted(set(sizes))
        lang = "en" if cfg.multilingual else None
        variants = [(self.tokenizer.sot_sequence(language=lang,
                                                 task=self.opts.task),
                     None)]
        if auto_language and cfg.multilingual:
            p = self.tokenizer.sot_sequence(language="en",
                                            task=self.opts.task)
            variants.append((p, 1))       # lang token sits after <|sot|>

        def padded(n):
            m = _pad_batch_size(n, self.max_batch)
            if self.mesh is not None:
                dp = self.mesh.shape["dp"]
                m = max(m, dp)
                m += (-m) % dp
            return m

        # the collector can wake mid-submission and split a group into
        # two smaller (still on-schedule) batches — track the padded
        # sizes actually dispatched and retry missing ones once
        for attempt in range(2):
            todo = sizes if attempt == 0 else [
                s for s in sizes
                if s not in {padded(n) for n in self.batch_sizes}]
            if not todo:
                break
            for n in todo:
                for prompt, lang_slot in variants:
                    # warm EVERY frame bucket live traffic can produce
                    # (submitters send real-frame prefixes that
                    # _dispatch pads to the _frame_buckets ladder — an
                    # unwarmed bucket would pay its remote compile
                    # inside a live request's latency budget)
                    for b in self._frame_buckets():
                        futs = [self.submit(None, prompt,
                                            lang_slot=lang_slot,
                                            frames=frames[:b])
                                for _ in range(n)]
                        for f in futs:
                            f.result(timeout=timeout_s)
        log.info("batcher warmup compiled sizes %s", sizes)
        return sizes

    def close(self):
        self._running = False
        self._q.put(None)
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------
    def _collect(self) -> List[_Request]:
        """Block for one request, then sweep whatever arrives within the
        batching window (or until max_batch)."""
        import time
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        # shrinking deadline: the FIRST request's wait is bounded by
        # max_wait_s even under a steady trickle of arrivals
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # propagate shutdown after this batch
                break
            batch.append(nxt)
        return batch

    def _loop(self):
        """Two-deep pipeline: JAX dispatch is async, so batch N+1 is
        collected, packed, and ENQUEUED while the device still executes
        batch N; N's results are then synced (the TPU analog of the
        reference's capture/transcribe worker overlap, state.rs:549-607).
        Idle queue = finalize immediately (no added latency).

        Shutdown is sentinel-driven (None in the queue), NOT flag-driven:
        requests already submitted when close() is called are still
        decoded and delivered (drain semantics)."""
        pending = None   # (batch, finalize_thunk) in flight on the device
        while True:
            if pending is not None and self._q.empty():
                pending = self._finalize(pending)
            batch = self._collect()
            if not batch:
                break
            # _run_batch calls back the moment batch N+1's device programs
            # are ENQUEUED and before any host sync it needs (the
            # auto-language path blocks on lang_idx): batch N's futures
            # resolve then, instead of waiting out N+1's encode+detect.
            prev = [pending]
            pending = None

            def finalize_prev(prev=prev):
                if prev[0] is not None:
                    self._finalize(prev[0])
                    prev[0] = None

            try:
                thunk = self._run_batch(batch, on_dispatched=finalize_prev)
                new_pending = (batch, thunk)
            except Exception as e:  # fail the whole batch, keep serving
                log.exception("batch decode failed")
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                new_pending = None
            finalize_prev()   # no-op if _run_batch already called it
            pending = new_pending
        if pending is not None:
            self._finalize(pending)
        # requests that raced past close() (queued after the shutdown
        # sentinel) would otherwise hang their futures forever
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None and not r.future.done():
                r.future.set_exception(RuntimeError("batcher closed"))

    def _finalize(self, pending):
        """Resolve one in-flight batch, under the watchdog deadline.

        The finalize thunk blocks on a device->host transfer; if the
        dispatch is wedged (see batch_deadline_s above) that block never
        returns. Running it in a sacrificial thread lets the batcher
        fail this batch's futures at the deadline and KEEP SERVING —
        sessions see an error instead of hanging; the stuck daemon
        thread is abandoned (state.rs:61-95 semantics). If the device is
        truly wedged, subsequent batches trip the watchdog too and the
        degradation is visible in /stats (watchdog_trips)."""
        batch, thunk = pending
        done = threading.Event()
        err: List[BaseException] = []

        def run():
            try:
                thunk()
            except BaseException as e:
                err.append(e)
            finally:
                done.set()

        t = threading.Thread(target=run, daemon=True,
                             name="nwt-batch-finalize")
        t.start()
        if not done.wait(self.batch_deadline_s):
            self.watchdog_trips += 1
            log.error(
                "batch of %d not finalized after %.0fs — wedged device "
                "dispatch? failing its futures and continuing",
                len(batch), self.batch_deadline_s)
            e = TimeoutError(
                f"window batch result not ready after "
                f"{self.batch_deadline_s:.0f}s (wedged device dispatch)")
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
            return None
        if err:
            log.error("batch finalize failed", exc_info=err[0])
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(err[0])
        return None

    def _run_batch(self, batch: List[_Request], on_dispatched=None):
        """Pack and dispatch one batch; returns the finalize thunk.

        ``on_dispatched`` (optional) is invoked once this batch's device
        programs are enqueued, BEFORE any blocking host sync this method
        performs — the _loop hook that lets the previous in-flight batch
        finalize without waiting behind our encode/language-detect."""
        n = len(batch)
        padded_n = _pad_batch_size(n, self.max_batch)
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            padded_n = max(padded_n, dp)
            padded_n += (-padded_n) % dp          # divisible by dp
        # a batch mixing framed and mel requests (possible only when
        # heterogeneous callers share one batcher) degrades to the mel
        # path: framed rows get their mel from one jitted call here
        all_frames = all(r.frames is not None for r in batch)

        def pad_rows(fr_rows):
            """Submitters send only the real-frame prefix (rows past the
            audio tail are exactly zero — audio/mel.py::n_real_frames);
            pad the batch to a common bucket so jit sees a few static
            shapes, and let the device program zero-pad back to the
            full window bit-identically. Transferred (= platform-
            leaked, scripts/transfer_leak_probe.py) bytes drop ~6-10x
            for short session chunks. The bucket set matches
            _frame_buckets exactly so warmup() can pre-compile every
            shape live traffic produces."""
            bucket = self._frame_bucket(max(r.shape[0]
                                            for r in fr_rows))
            out = []
            for r in fr_rows:
                if r.shape[0] > bucket:
                    # only possible for rows LONGER than the engine's
                    # window (e.g. full 3000 frames submitted to an
                    # audio_ctx-truncated engine) — a caller bug that
                    # must fail loudly, never silently drop audio
                    raise ValueError(
                        f"frames row has {r.shape[0]} rows > the "
                        f"engine window ({bucket}); frame with "
                        "n_frames=2*cfg.n_audio_ctx")
                out.append(r if r.shape[0] == bucket else np.concatenate(
                    [r, np.zeros((bucket - r.shape[0], r.shape[1]),
                                 np.float32)]))
            return out

        if not all_frames and any(r.frames is not None for r in batch):
            # a batch mixing framed and mel requests (heterogeneous
            # callers sharing one batcher) degrades to the mel path:
            # framed rows get their mel from one jitted call here
            from ..audio.mel import log_mel_from_frames_jit
            mixed = np.stack(pad_rows([r.frames for r in batch
                                       if r.frames is not None]))
            mixed_mels = iter(np.asarray(log_mel_from_frames_jit(
                jnp.asarray(mixed), n_mels=self.cfg.n_mels,
                n_frames=2 * self.cfg.n_audio_ctx)))
            for r in batch:
                if r.frames is not None:
                    r.mel = next(mixed_mels)

        rows = [(r.frames if all_frames else r.mel) for r in batch]
        if all_frames:
            rows = pad_rows(rows)
        prompts = [list(r.prompt) for r in batch]
        temps = [r.temperature for r in batch]
        while len(rows) < padded_n:       # replicate a real row
            rows.append(rows[0])
            prompts.append(list(prompts[0]))
            temps.append(temps[0])
        self.batch_sizes.append(n)

        stacked = np.stack(rows)
        self.transferred_bytes += stacked.nbytes
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding
            stacked = jax.device_put(stacked, batch_sharding(self.mesh))
        else:
            stacked = jnp.asarray(stacked)

        langs: List[Optional[str]] = [None] * len(prompts)
        need_lang = any(r.lang_slot is not None for r in batch)
        # beam-strategy batcher (serve config beam_size > 1; strategy
        # selection analog whisper.rs:88): decode goes through the beam
        # path, which needs explicit encoder states
        use_beam = (self.opts.beam_size or 0) > 1
        from ..decode.greedy import (decode_window_dispatch,
                                     decode_window_finalize)
        if use_beam or need_lang or self._custom_encode:
            if all_frames and not self._custom_encode:
                if need_lang:
                    # auto-language framed path: mel + encode + language
                    # detection in ONE device program (3 tunnel round
                    # trips collapse to 1; the lang_idx sync is inherent
                    # — the prompt depends on the result)
                    from ..decode.greedy import \
                        frames_encode_detect_dispatch
                    xa, lang_idx, _ = frames_encode_detect_dispatch(
                        self.params, stacked, self.cfg,
                        self.compute_dtype, mesh=self.mesh)
                else:
                    # fixed-language beam batch: encoder states only —
                    # skip the wasted language-detect decoder forward
                    from ..decode.greedy import frames_encode_dispatch
                    xa = frames_encode_dispatch(
                        self.params, stacked, self.cfg,
                        self.compute_dtype, mesh=self.mesh)
                    lang_idx = None
            else:
                if all_frames:
                    from ..audio.mel import log_mel_from_frames_jit
                    # n_frames pad-back: stacked may be a bucketed
                    # real-frame prefix (pad_rows), and the custom
                    # encode_fn expects full-window mel
                    mel = log_mel_from_frames_jit(
                        stacked, n_mels=self.cfg.n_mels,
                        n_frames=2 * self.cfg.n_audio_ctx)
                else:
                    mel = stacked
                xa = self._encode(mel)
                lang_idx = None
            if on_dispatched is not None:
                # the encode/detect programs are enqueued; let the
                # previous batch's results go out before we block on
                # lang_idx below
                on_dispatched()
            if need_lang:
                # auto-language rows: ONE extra batched forward detects
                # languages for the whole batch (whisper.rs:91-95), then
                # the detected token is patched into each row's prompt
                from ..core.tokenizer import LANGUAGES
                if lang_idx is None:
                    from ..decode.greedy import detect_language_jit
                    lang_idx, _ = detect_language_jit(
                        self.params, xa, self.tables, self.cfg,
                        self.compute_dtype)
                lang_idx = np.asarray(lang_idx)
                for i, r in enumerate(batch):
                    if r.lang_slot is not None:
                        prompts[i][r.lang_slot] = (self.cfg.lang_base
                                                   + int(lang_idx[i]))
                        langs[i] = LANGUAGES[int(lang_idx[i])]
            if use_beam:
                return self._beam_finalizer(batch, xa, prompts, temps,
                                            langs, n)
            handle = decode_window_dispatch(
                self.params, xa, prompts, self.cfg, self.tables, self.opts,
                temperature=np.asarray(temps, np.float32),
                compute_dtype=self.compute_dtype, mesh=self.mesh,
                speculative=self.speculative,
                draft_pool=self.draft_pool, draft=self.draft)
        else:
            # fixed-language fast path: (frames ->) mel -> encode ->
            # decode as ONE device program per batch
            handle = decode_window_dispatch(
                self.params, None, prompts, self.cfg, self.tables,
                self.opts, temperature=np.asarray(temps, np.float32),
                compute_dtype=self.compute_dtype,
                mel=None if all_frames else stacked,
                frames=stacked if all_frames else None, mesh=self.mesh,
                speculative=self.speculative,
                draft_pool=self.draft_pool, draft=self.draft)
            if on_dispatched is not None:
                on_dispatched()

        def finalize():
            results = decode_window_finalize(handle)
            if len(handle) > 5:
                # speculative batch: record (passes, rows, emitted) for
                # the /stats acceptance metric
                emitted = sum(len(r.tokens) + 1 for r in results[:n])
                self.spec_stats.append(
                    (int(np.asarray(handle[5])), n, emitted))
                del self.spec_stats[:-200]
            for r, res, lang in zip(batch, results[:n], langs[:n]):
                res.language = lang
                # a late completion after the watchdog already failed
                # this future must not raise InvalidStateError
                if not r.future.done():
                    r.future.set_result(res)

        return finalize

    def _beam_finalizer(self, batch, xa, prompts, temps, langs, n):
        """Beam decode stage (batcher opts beam_size > 1). Rows at
        temperature 0 run beam search; rows at temperature > 0 — ladder
        retries — run the sampling path (openai/whisper.cpp fallback
        semantics: beam at zero temperature, sampling above it). Mixed
        batches split into two device calls; retries are rare."""
        from ..decode.beam import beam_decode_window
        beam_k = self.opts.beam_size

        def pad_idx(idx):
            # a temperature-ladder retry splits the batch into arbitrary
            # zero/hot subset sizes; left unpadded, every novel size
            # compiles a fresh program over the minutes-slow remote
            # compiler. Replicate a real row up to the same bounded
            # {1,2,4,8,...} schedule the batcher itself uses.
            m = _pad_batch_size(len(idx), self.max_batch)
            if self.mesh is not None:
                dp = self.mesh.shape["dp"]
                m = max(m, dp)
                m += (-m) % dp
            return idx + [idx[0]] * (m - len(idx))

        def finalize():
            zero = [i for i, t in enumerate(temps) if t == 0]
            hot = [i for i, t in enumerate(temps) if t != 0]
            results: List[Optional[WindowResult]] = [None] * len(prompts)
            if zero:
                full = pad_idx(zero)
                sub = beam_decode_window(
                    self.params, xa[np.asarray(full)],
                    [prompts[i] for i in full], self.cfg, self.tables,
                    beam_size=beam_k, sample_len=self.opts.sample_len,
                    compute_dtype=self.compute_dtype)
                for i, r in zip(zero, sub):
                    results[i] = r
            if hot:
                full = pad_idx(hot)
                sub = decode_window(
                    self.params, xa[np.asarray(full)],
                    [prompts[i] for i in full], self.cfg, self.tables,
                    self.opts,
                    temperature=np.asarray([temps[i] for i in full],
                                           np.float32),
                    compute_dtype=self.compute_dtype)
                for i, r in zip(hot, sub):
                    results[i] = r
            for r, res, lang in zip(batch, results[:n], langs[:n]):
                res.language = lang
                if not r.future.done():
                    r.future.set_result(res)

        return finalize
