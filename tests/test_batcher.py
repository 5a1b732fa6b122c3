"""Window batcher: batched results equal solo decode; concurrency packs."""

import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.decode.greedy import decode_window
from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
from nobs_whisper_tpu.models.whisper import encode
from nobs_whisper_tpu.pipeline.batcher import WindowBatcher, _pad_batch_size
from nobs_whisper_tpu.utils.testing import (tiny_test_config,
                                            write_tiny_checkpoint)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from nobs_whisper_tpu.api import WhisperEngine
    path = str(tmp_path_factory.mktemp("m") / "m.bin")
    write_tiny_checkpoint(path)
    return WhisperEngine.from_ggml(path, dtype=jnp.float32)


def test_pad_batch_size():
    assert _pad_batch_size(1, 8) == 1
    assert _pad_batch_size(3, 8) == 4
    assert _pad_batch_size(5, 8) == 8
    assert _pad_batch_size(9, 8) == 8


def test_batched_equals_solo(engine):
    cfg = engine.cfg
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, engine.tokenizer)
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer, opts,
                            max_batch=4, max_wait_ms=20)
    try:
        rng = np.random.RandomState(0)
        mels = [rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
                for _ in range(5)]
        prompt = engine.tokenizer.sot_sequence(language="en")

        futures = [batcher.submit(m, prompt) for m in mels]
        results = [f.result(timeout=120) for f in futures]

        for m, res in zip(mels, results):
            xa = encode(engine.params, jnp.asarray(m[None]), cfg)
            solo = decode_window(engine.params, xa, [prompt], cfg, tables,
                                 opts)[0]
            assert res.tokens == solo.tokens
            assert res.avg_logprob == pytest.approx(solo.avg_logprob,
                                                    abs=2e-3)
    finally:
        batcher.close()


def test_concurrent_submits_pack(engine):
    cfg = engine.cfg
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer,
                            DecodeOptions(), max_batch=8, max_wait_ms=100)
    try:
        # warm the compile path so the sweep window isn't spent compiling
        rng = np.random.RandomState(1)
        prompt = engine.tokenizer.sot_sequence(language="en")
        batcher.submit(
            rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32),
            prompt).result(timeout=120)
        batcher.batch_sizes.clear()

        barrier = threading.Barrier(6)
        futs = []
        lock = threading.Lock()

        def worker(i):
            m = rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
            barrier.wait()
            f = batcher.submit(m, prompt)
            with lock:
                futs.append(f)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in futs:
            f.result(timeout=120)
        # 6 near-simultaneous submits must land in <= 3 batches with at
        # least one multi-request batch
        assert len(batcher.batch_sizes) <= 3
        assert max(batcher.batch_sizes) >= 2
    finally:
        batcher.close()


def test_close_is_clean(engine):
    batcher = WindowBatcher(engine.params, engine.cfg, engine.tokenizer,
                            DecodeOptions())
    batcher.close()
    assert not batcher._thread.is_alive()


def test_batcher_fault_isolation(engine):
    """A failing encode fails that batch's futures but the batcher keeps
    serving subsequent requests (failure-detection semantics)."""
    from nobs_whisper_tpu.models.whisper import encode_jit

    cfg = engine.cfg
    boom = {"on": True}

    def flaky_encode(mel):
        if boom["on"]:
            raise RuntimeError("injected encoder fault")
        return encode_jit(engine.params, mel, cfg, jnp.float32)

    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer,
                            DecodeOptions(), max_batch=2, max_wait_ms=5,
                            encode_fn=flaky_encode)
    try:
        rng = np.random.RandomState(0)
        mel = rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
        prompt = engine.tokenizer.sot_sequence(language="en")
        f1 = batcher.submit(mel, prompt)
        with pytest.raises(RuntimeError, match="injected"):
            f1.result(timeout=60)
        boom["on"] = False                 # service recovers
        f2 = batcher.submit(mel, prompt)
        assert f2.result(timeout=120).tokens is not None
    finally:
        batcher.close()


def test_batcher_concurrency_stress(engine):
    """Many threads x many submits: every future resolves, no deadlock."""
    cfg = engine.cfg
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer,
                            DecodeOptions(), max_batch=8, max_wait_ms=2)
    try:
        rng = np.random.RandomState(1)
        prompt = engine.tokenizer.sot_sequence(language="en")
        mels = [rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
                for _ in range(4)]
        futs = []
        lock = threading.Lock()

        def worker(i):
            for j in range(3):
                f = batcher.submit(mels[(i + j) % 4], prompt)
                with lock:
                    futs.append(f)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert len(futs) == 18
        for f in futs:
            r = f.result(timeout=180)
            assert isinstance(r.tokens, list)
    finally:
        batcher.close()


def test_pending_batch_finalized_on_close(engine):
    """The two-deep dispatch pipeline must drain on shutdown: a result
    still in flight when close() is called is delivered, not dropped."""
    cfg = engine.cfg
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer,
                            DecodeOptions(), max_batch=2, max_wait_ms=1)
    rng = np.random.RandomState(2)
    mel = rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    prompt = engine.tokenizer.sot_sequence(language="en")
    futs = [batcher.submit(mel, prompt) for _ in range(3)]
    batcher.close()                      # may race the in-flight batch
    for f in futs:
        assert f.result(timeout=120).tokens is not None


def test_watchdog_fails_wedged_batch(engine):
    """A batch whose device result never arrives (the tunnel's known
    wedged-dispatch failure mode) must fail its futures at the deadline
    while the batcher keeps serving — sessions degrade instead of
    hanging (reference analog: stuck-thread cleanup + recv_timeout cap,
    src-tauri/src/state.rs:61-95,622-631)."""
    # the batcher resolves decode_window_finalize from the greedy module
    # at each _run_batch call — patch it there
    import nobs_whisper_tpu.decode.greedy as greedy_mod

    cfg = engine.cfg
    wedge = {"on": True}
    release = threading.Event()
    real_finalize = greedy_mod.decode_window_finalize

    def wedged_finalize(handle):
        if wedge["on"]:
            wedge["on"] = False
            release.wait(30)       # simulate the indefinite hang, bounded
        return real_finalize(handle)

    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer,
                            DecodeOptions(), max_batch=2, max_wait_ms=5,
                            batch_deadline_s=1.5)
    # warm the jit so the deadline isn't spent compiling
    rng = np.random.RandomState(4)
    mel = rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    prompt = engine.tokenizer.sot_sequence(language="en")
    batcher.submit(mel, prompt).result(timeout=120)

    greedy_mod.decode_window_finalize = wedged_finalize
    try:
        f1 = batcher.submit(mel, prompt)
        with pytest.raises(TimeoutError, match="wedged"):
            f1.result(timeout=30)
        assert batcher.watchdog_trips == 1
        release.set()              # un-wedge the abandoned thread
        f2 = batcher.submit(mel, prompt)   # service continues
        assert f2.result(timeout=120).tokens is not None
    finally:
        greedy_mod.decode_window_finalize = real_finalize
        release.set()
        batcher.close()


def test_mixed_frames_and_mel_batch(engine):
    """A batch mixing framed and mel requests degrades to the mel path:
    framed rows must decode to the same tokens as their mel twins."""
    from nobs_whisper_tpu.audio.mel import (HOP_LENGTH, frame_window_np,
                                            log_mel_longform)

    cfg = engine.cfg
    opts = DecodeOptions()
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer, opts,
                            max_batch=4, max_wait_ms=200)
    try:
        rng = np.random.RandomState(3)
        n_frames = 2 * cfg.n_audio_ctx
        audio = (rng.randn(n_frames * HOP_LENGTH) * 0.3).astype(np.float32)
        mel = log_mel_longform(audio, n_mels=cfg.n_mels,
                               padding=n_frames * HOP_LENGTH)[:, :n_frames]
        frames = frame_window_np(audio, n_frames=n_frames)
        prompt = engine.tokenizer.sot_sequence(language="en")

        # submit back-to-back so the 200 ms window packs them together
        f_mel = batcher.submit(mel, prompt)
        f_frames = batcher.submit(None, prompt, frames=frames)
        r_mel = f_mel.result(timeout=120)
        r_frames = f_frames.result(timeout=120)
        assert batcher.batch_sizes and max(batcher.batch_sizes) == 2
        assert r_frames.tokens == r_mel.tokens
        assert r_frames.avg_logprob == pytest.approx(r_mel.avg_logprob,
                                                     abs=2e-3)
    finally:
        batcher.close()


def test_beam_finalizer_pads_subsets(engine, monkeypatch):
    """A temperature-ladder retry splits a beam batch into zero/hot
    subsets; both sub-dispatches must be padded to the bounded
    {1,2,4,8,...} schedule (review finding: unpadded subsets compile a
    fresh program per novel size over the minutes-slow remote
    compiler)."""
    import nobs_whisper_tpu.decode.beam as beam_mod
    import nobs_whisper_tpu.pipeline.batcher as batcher_mod

    cfg = engine.cfg
    opts = DecodeOptions(beam_size=2)
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer, opts,
                            max_batch=8, max_wait_ms=40)
    beam_sizes, greedy_sizes = [], []
    orig_beam = beam_mod.beam_decode_window
    orig_greedy = batcher_mod.decode_window

    def spy_beam(params, xa, prompts, *a, **kw):
        beam_sizes.append(len(prompts))
        return orig_beam(params, xa, prompts, *a, **kw)

    def spy_greedy(params, xa, prompts, *a, **kw):
        greedy_sizes.append(len(prompts))
        return orig_greedy(params, xa, prompts, *a, **kw)

    monkeypatch.setattr(beam_mod, "beam_decode_window", spy_beam)
    monkeypatch.setattr(batcher_mod, "decode_window", spy_greedy)
    try:
        rng = np.random.RandomState(3)
        mels = [rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
                for _ in range(5)]
        prompt = engine.tokenizer.sot_sequence(language="en")
        # 3 zero-temp rows + 2 hot rows in one batch: subsets 3 and 2
        futures = [batcher.submit(m, prompt,
                                  temperature=0.0 if i < 3 else 0.4)
                   for i, m in enumerate(mels)]
        for f in futures:
            f.result(timeout=180)
    finally:
        batcher.close()
    assert beam_sizes and all(s in (1, 2, 4, 8) for s in beam_sizes), \
        beam_sizes
    assert greedy_sizes and all(s in (1, 2, 4, 8) for s in greedy_sizes), \
        greedy_sizes


def test_fixed_language_beam_batch_skips_detect(engine, monkeypatch):
    """A beam batch whose rows all pin a language must not run the
    language-detect decoder forward (review finding: use_beam routed
    every framed batch through frames_encode_detect)."""
    from nobs_whisper_tpu.audio.mel import frame_window_np
    import nobs_whisper_tpu.decode.greedy as g

    cfg = engine.cfg
    opts = DecodeOptions(beam_size=2)
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer, opts,
                            max_batch=4, max_wait_ms=20)
    called = {"detect": 0, "encode_only": 0}
    orig_detect = g.frames_encode_detect_dispatch
    orig_enc = g.frames_encode_dispatch

    def spy_detect(*a, **kw):
        called["detect"] += 1
        return orig_detect(*a, **kw)

    def spy_enc(*a, **kw):
        called["encode_only"] += 1
        return orig_enc(*a, **kw)

    monkeypatch.setattr(g, "frames_encode_detect_dispatch", spy_detect)
    monkeypatch.setattr(g, "frames_encode_dispatch", spy_enc)
    try:
        rng = np.random.RandomState(5)
        audio = (rng.randn(16000) * 0.2).astype(np.float32)
        frames = frame_window_np(audio, n_frames=2 * cfg.n_audio_ctx)
        prompt = engine.tokenizer.sot_sequence(language="en")
        batcher.submit(None, prompt, frames=frames).result(timeout=120)
    finally:
        batcher.close()
    assert called["encode_only"] == 1 and called["detect"] == 0, called


def test_warmup_compiles_schedule_sizes(engine):
    """warmup() dispatches synthetic windows at every padded batch size
    through the production path, so no live request pays a first-size
    compile; only on-schedule sizes are ever dispatched."""
    cfg = engine.cfg
    opts = DecodeOptions()
    batcher = WindowBatcher(engine.params, cfg, engine.tokenizer, opts,
                            max_batch=4, max_wait_ms=20)
    try:
        sizes = batcher.warmup(timeout_s=300)
        assert sizes == [1, 2, 4]
        padded = {_pad_batch_size(n, 4) for n in batcher.batch_sizes}
        assert padded <= {1, 2, 4}
        assert set(sizes) <= padded          # every size really dispatched
        # the batcher still serves real traffic afterwards
        rng = np.random.RandomState(9)
        mel = rng.randn(cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
        prompt = engine.tokenizer.sot_sequence(language="en")
        res = batcher.submit(mel, prompt).result(timeout=120)
        assert isinstance(res.tokens, list)
    finally:
        batcher.close()


def test_submit_after_close_raises(engine):
    opts = DecodeOptions()
    batcher = WindowBatcher(engine.params, engine.cfg, engine.tokenizer,
                            opts, max_batch=2, max_wait_ms=5)
    batcher.close()
    # a session holding a hot-swap-retired engine must fail fast, not
    # park its request in a queue no thread will drain
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(None, [0], frames=np.zeros((10, 400), np.float32))


def test_frame_buckets_and_oversize_rejection(engine):
    """The bucket ladder is the warmed shape set; rows longer than the
    engine window fail loudly instead of silently dropping audio
    (round-4 review finding)."""
    import numpy as np

    from nobs_whisper_tpu.pipeline.batcher import WindowBatcher
    b = WindowBatcher(engine.params, engine.cfg, engine.tokenizer,
                      max_batch=2)
    try:
        nf_full = 2 * engine.cfg.n_audio_ctx
        assert b._frame_buckets()[-1] == nf_full
        assert b._frame_bucket(1) == b._frame_buckets()[0]
        assert b._frame_bucket(nf_full) == nf_full
        for k in b._frame_buckets():
            assert b._frame_bucket(k) == k
        prompt = list(engine.tokenizer.sot_sequence(language="en",
                                                    task="transcribe"))
        too_long = np.zeros((nf_full + 8, 400), np.float32)
        fut = b.submit(None, prompt, frames=too_long)
        with pytest.raises(Exception, match="engine window"):
            fut.result(timeout=120)
    finally:
        b.close()
