"""Speculative greedy decoding: token-EXACT with the sequential loop.

Greedy speculation must emit the identical token sequence regardless of
draft quality — a perfect draft (same weights, no pooling) only changes
the pass count, an adversarial draft (different random weights) only
costs speed. Both regimes are pinned here, plus the pooled self-draft
(the production mode) and ragged prompts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.decode.greedy import decode_window
from nobs_whisper_tpu.decode.rules import DecodeOptions, build_rule_tables
from nobs_whisper_tpu.decode.speculative import decode_window_speculative
from nobs_whisper_tpu.models.whisper import encode
from nobs_whisper_tpu.utils.testing import (tiny_test_config,
                                            write_tiny_checkpoint)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from nobs_whisper_tpu.api import WhisperEngine
    d = tmp_path_factory.mktemp("m")
    path = str(d / "target.bin")
    write_tiny_checkpoint(path, seed=0)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    # adversarial draft: same architecture, DIFFERENT random weights
    path2 = str(d / "draft.bin")
    write_tiny_checkpoint(path2, seed=42)
    draft = WhisperEngine.from_ggml(path2, dtype=jnp.float32)

    cfg = eng.cfg
    opts = DecodeOptions()
    tables = build_rule_tables(cfg, opts, eng.tokenizer)
    rng = np.random.RandomState(0)
    mels = rng.randn(3, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(eng.params, jnp.asarray(mels), cfg)
    prompts = [list(eng.tokenizer.sot_sequence(language="en"))] * 3
    seq = decode_window(eng.params, xa, prompts, cfg, tables, opts)
    return eng, draft, cfg, tables, xa, prompts, seq


def _assert_exact(seq, spec):
    for a, b in zip(seq, spec):
        assert a.tokens == b.tokens
        assert a.sum_logprob == pytest.approx(b.sum_logprob, abs=2e-2)
        assert a.no_speech_prob == pytest.approx(b.no_speech_prob,
                                                 abs=1e-5)


def test_perfect_draft_exact_and_fast(setup):
    """Draft == target with no pooling: every draft accepted, so the
    pass count collapses to ~len/(k+1) — and tokens stay exact."""
    eng, _, cfg, tables, xa, prompts, seq = setup
    spec, passes = decode_window_speculative(
        eng.params, xa, prompts, cfg, tables, k_draft=3, draft_pool=1,
        return_passes=True)
    _assert_exact(seq, spec)
    longest = max(len(r.tokens) for r in seq) + 1   # + the final eot
    assert passes <= -(-longest // 4) + 1, (passes, longest)


def test_adversarial_draft_exact(setup):
    """A draft with unrelated random weights mostly mismatches — output
    must STILL be token-exact (speculation never changes results)."""
    eng, draft, cfg, tables, xa, prompts, seq = setup
    spec, passes = decode_window_speculative(
        eng.params, xa, prompts, cfg, tables, k_draft=3, draft_pool=1,
        draft_params=draft.params, draft_cfg=draft.cfg,
        return_passes=True)
    _assert_exact(seq, spec)
    # sanity: it really was adversarial (more passes than the perfect
    # draft would need), otherwise this test proves nothing
    longest = max(len(r.tokens) for r in seq) + 1
    assert passes > -(-longest // 4) + 1, (passes, longest)


def test_pooled_self_draft_exact(setup):
    """The production mode: the target drafts for itself over 4x
    time-pooled cross-KV. Exactness is unconditional."""
    eng, _, cfg, tables, xa, prompts, seq = setup
    spec = decode_window_speculative(
        eng.params, xa, prompts, cfg, tables, k_draft=3, draft_pool=4)
    _assert_exact(seq, spec)


def test_ragged_prompts_exact(setup):
    """Ragged batch: rows with different prompt lengths (vocabulary
    context on one row) stay exact through the left-pad machinery."""
    eng, _, cfg, tables, xa, prompts, _ = setup
    ragged = [list(p) for p in prompts]
    ctx = eng.tokenizer.encode(" hello world")
    ragged[1] = [cfg.sot_prev] + ctx + ragged[1]
    opts = DecodeOptions()
    seq = decode_window(eng.params, xa, ragged, cfg, tables, opts)
    spec = decode_window_speculative(
        eng.params, xa, ragged, cfg, tables, k_draft=2, draft_pool=2)
    _assert_exact(seq, spec)


def test_k1_and_k4_exact(setup):
    """Edge draft depths: k=1 (minimal) and k=4 (deep) both exact."""
    eng, _, cfg, tables, xa, prompts, seq = setup
    for k in (1, 4):
        spec = decode_window_speculative(
            eng.params, xa, prompts, cfg, tables, k_draft=k, draft_pool=2)
        _assert_exact(seq, spec)


def test_pass_budget_phase2_exact(setup):
    """When the adversarial draft burns the speculative pass budget
    (sample_len//2 passes), the sequential phase-2 tail must finish the
    stragglers exactly."""
    eng, draft, cfg, tables, xa, prompts, _ = setup
    opts = DecodeOptions(sample_len=8)   # budget 4: adversarial drafts
    seq = decode_window(eng.params, xa, prompts, cfg, tables, opts)
    spec, passes = decode_window_speculative(
        eng.params, xa, prompts, cfg, tables, sample_len=8, k_draft=3,
        draft_pool=1, draft_params=draft.params, draft_cfg=draft.cfg,
        return_passes=True)
    _assert_exact(seq, spec)
    assert passes > 4, passes            # phase 2 really ran


def test_batcher_speculative_matches_plain(setup, tmp_path):
    """A WindowBatcher with speculative=k produces byte-identical
    results to the plain batcher through the serving fast path (framed
    submit), including the auto-language route (which decodes from xa)."""
    from nobs_whisper_tpu.audio.mel import frame_window_np
    from nobs_whisper_tpu.pipeline.batcher import WindowBatcher

    eng, _, cfg, tables, _, _, _ = setup
    opts = DecodeOptions()
    rng = np.random.RandomState(7)
    audios = [(rng.randn(16000) * 0.2).astype(np.float32)
              for _ in range(3)]
    frames = [frame_window_np(a, n_frames=2 * cfg.n_audio_ctx)
              for a in audios]
    prompt = eng.tokenizer.sot_sequence(language="en")

    def run(**kw):
        b = WindowBatcher(eng.params, cfg, eng.tokenizer, opts,
                          max_batch=4, max_wait_ms=20, **kw)
        try:
            plain = [b.submit(None, prompt, frames=f).result(timeout=300)
                     for f in frames]
            # auto-language row: decodes from explicit xa (the spec
            # xa-kind path)
            auto = b.submit(None, list(prompt), frames=frames[0],
                            lang_slot=1).result(timeout=300)
            return plain, auto
        finally:
            b.close()

    base, base_auto = run()
    spec, spec_auto = run(speculative=2, draft_pool=2)
    for r0, r1 in zip(base + [base_auto], spec + [spec_auto]):
        assert r0.tokens == r1.tokens
        assert r0.sum_logprob == pytest.approx(r1.sum_logprob, abs=2e-2)


def test_mel_path_and_q8_speculative_exact(setup):
    """The batcher's mel-window path (and q8 cross-KV) go through the
    speculative program too — no silent sequential fallback."""
    from nobs_whisper_tpu.decode.greedy import (decode_window_dispatch,
                                                decode_window_finalize)

    eng, _, cfg, tables, xa, prompts, seq = setup
    opts = DecodeOptions()
    rng = np.random.RandomState(5)
    mel = rng.randn(3, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    mel_j = jnp.asarray(mel)
    base = decode_window_finalize(decode_window_dispatch(
        eng.params, None, prompts, cfg, tables, opts, mel=mel_j))
    spec = decode_window_finalize(decode_window_dispatch(
        eng.params, None, prompts, cfg, tables, opts, mel=mel_j,
        speculative=2, draft_pool=2))
    for a, b in zip(base, spec):
        assert a.tokens == b.tokens

    # q8 cross-KV option reaches the speculative program (correctness:
    # q8 changes numerics, so compare spec-q8 against SEQUENTIAL-q8)
    q8_opts = DecodeOptions(q8_cross_kv=True)
    base_q8 = decode_window_finalize(decode_window_dispatch(
        eng.params, xa, prompts, cfg, tables, q8_opts))
    spec_q8 = decode_window_finalize(decode_window_dispatch(
        eng.params, xa, prompts, cfg, tables, q8_opts,
        speculative=2, draft_pool=2))
    for a, b in zip(base_q8, spec_q8):
        assert a.tokens == b.tokens


def test_second_model_draft_through_serving(setup):
    """BatchedEngine with a second-model draft engine (the distil
    pairing shape) produces the same transcripts as the plain engine;
    an incompatible draft is rejected at construction."""
    from nobs_whisper_tpu.pipeline.batched_engine import BatchedEngine
    from nobs_whisper_tpu.pipeline.batcher import WindowBatcher
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    eng, draft, cfg, tables, _, _, _ = setup
    audio = np.asarray(speech_like_audio(0.5, seed=41))
    plain = BatchedEngine(eng, max_batch=2, max_wait_ms=20)
    spec = BatchedEngine(eng, max_batch=2, max_wait_ms=20,
                         speculative=2, draft_engine=draft)
    try:
        a = plain.transcribe(audio, language="en")
        b = spec.transcribe(audio, language="en")
        assert a.text == b.text
    finally:
        plain.close()
        spec.close()

    bad_cfg = tiny_test_config(n_vocab=2048)
    with pytest.raises(ValueError, match="draft model incompatible"):
        WindowBatcher(eng.params, cfg, eng.tokenizer,
                      speculative=2,
                      draft=(draft.params, bad_cfg))


def test_deep_decoder_path_exact(tmp_path):
    """A >8-layer decoder takes _decoder_forward's fori_loop branch
    (large-v3's shape — speculation's main target model family); the
    slot-mask/pos-base machinery must stay exact there too."""
    from nobs_whisper_tpu.api import WhisperEngine

    path = str(tmp_path / "deep.bin")
    write_tiny_checkpoint(path, cfg=tiny_test_config(dec_layers=9))
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    cfg = eng.cfg
    assert cfg.n_text_layer > 8          # really the fori_loop branch
    tables = build_rule_tables(cfg, DecodeOptions(), eng.tokenizer)
    rng = np.random.RandomState(2)
    mels = rng.randn(2, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(eng.params, jnp.asarray(mels), cfg)
    prompts = [list(eng.tokenizer.sot_sequence(language="en"))] * 2
    seq = decode_window(eng.params, xa, prompts, cfg, tables,
                        DecodeOptions())
    spec = decode_window_speculative(
        eng.params, xa, prompts, cfg, tables, k_draft=2, draft_pool=2)
    _assert_exact(seq, spec)


def test_quantized_params_exact(setup):
    """The serving default is int8 weights — speculation must match the
    sequential decode on the QUANTIZED params too."""
    eng, _, cfg, tables, xa, prompts, _ = setup
    q = eng.quantize()
    seq = decode_window(q.params, xa, prompts, cfg, tables,
                        DecodeOptions())
    spec = decode_window_speculative(
        q.params, xa, prompts, cfg, tables, k_draft=2, draft_pool=2)
    _assert_exact(seq, spec)


def test_spec_stats_in_server_stats(setup):
    """A speculative serve surfaces the acceptance rate in /stats."""
    import json as _json
    import socket
    import urllib.request
    from nobs_whisper_tpu.pipeline.batched_engine import BatchedEngine
    from nobs_whisper_tpu.serve.server import serve
    from nobs_whisper_tpu.utils.testing import speech_like_audio

    eng, _, cfg, _, _, _, _ = setup
    batched = BatchedEngine(eng, max_batch=2, max_wait_ms=20,
                            speculative=2, draft_pool=2)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    httpd = serve(batched, port=port, background=True)
    try:
        audio = np.asarray(speech_like_audio(0.5, seed=43),
                           dtype=np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe?language=en",
            data=audio.tobytes(), method="POST")
        urllib.request.urlopen(req, timeout=300).read()
        stats = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        spec = stats["batcher"]["speculative"]
        assert spec["recent_batches"] >= 1
        assert spec["emitted_per_pass"] > 0
    finally:
        httpd.shutdown()
        batched.close()
