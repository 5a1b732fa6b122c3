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
