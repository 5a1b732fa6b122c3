"""Word timestamps: DTW math, median filter, word splitting, end-to-end
monotonicity on the tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.decode.timing import (
    WordTiming, decoder_cross_attn_weights, default_alignment_heads,
    dtw_path, find_word_timings, median_filter, merge_punctuations,
    split_tokens_on_spaces)


def test_dtw_identity_diagonal():
    n = 8
    cost = np.ones((n, n)) - np.eye(n)   # cheap diagonal
    ti, fi = dtw_path(cost)
    # path visits every (i, i)
    diag = set(zip(ti.tolist(), fi.tolist()))
    for i in range(n):
        assert (i, i) in diag


def test_dtw_monotonic():
    rng = np.random.RandomState(0)
    cost = rng.rand(10, 30)
    ti, fi = dtw_path(cost)
    assert (np.diff(ti) >= 0).all()
    assert (np.diff(fi) >= 0).all()
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == 9 and fi[-1] == 29


def test_dtw_prefers_low_cost_band():
    """Tokens 0..3 aligned to frame bands [0-9],[10-19],[20-29],[30-39]."""
    cost = np.ones((4, 40))
    for t in range(4):
        cost[t, t * 10:(t + 1) * 10] = 0.0
    ti, fi = dtw_path(cost)
    starts = {t: fi[np.argmax(ti == t)] for t in range(4)}
    for t in range(4):
        assert t * 10 <= starts[t] < (t + 1) * 10 + 1


def _dtw_path_scalar(cost):
    """The classic O(N*M) scalar dp (the pre-vectorization
    implementation), kept here as the equivalence oracle."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), np.int8)
    for i in range(1, n + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        for j in range(1, m + 1):
            c0 = row_prev[j - 1]
            c1 = row_prev[j]
            c2 = row[j - 1]
            cmin, t = c0, 0
            if c1 < cmin:
                cmin, t = c1, 1
            if c2 < cmin:
                cmin, t = c2, 2
            row[j] = cost[i - 1, j - 1] + cmin
            trace[i, j] = t
    i, j = n, m
    ti, fi = [], []
    while i > 0 or j > 0:
        ti.append(i - 1)
        fi.append(j - 1)
        t = trace[i, j]
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        elif t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(fi[::-1])


def test_dtw_vectorized_matches_scalar_dp():
    rng = np.random.RandomState(7)
    for n, m in ((1, 1), (1, 17), (9, 1), (23, 57), (64, 301)):
        cost = -rng.rand(n, m)
        ti_v, fi_v = dtw_path(cost)
        ti_s, fi_s = _dtw_path_scalar(cost)
        np.testing.assert_array_equal(ti_v, ti_s)
        np.testing.assert_array_equal(fi_v, fi_s)


def test_dtw_vectorized_speedup():
    """The serving-relevant shape: ~100 tokens x 1500 mel-half frames.
    The vectorized sweep must beat the interpreted dp by >=10x."""
    import time
    rng = np.random.RandomState(8)
    cost = -rng.rand(100, 1500)
    t0 = time.perf_counter()
    path_v = dtw_path(cost)
    t_vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    path_s = _dtw_path_scalar(cost)
    t_scalar = time.perf_counter() - t0
    np.testing.assert_array_equal(path_v[0], path_s[0])
    np.testing.assert_array_equal(path_v[1], path_s[1])
    assert t_scalar / max(t_vec, 1e-9) >= 10, (t_scalar, t_vec)


def test_median_filter():
    x = np.array([[1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0]])
    f = median_filter(x, 3)
    assert f.shape == x.shape
    assert f[0, 1] == 1.0  # spikes removed
    np.testing.assert_array_equal(median_filter(x, 1), x)


def test_merge_punctuations():
    words = [
        WordTiming(" hello", 0.0, 0.5, [1], 1.0),
        WordTiming(",", 0.5, 0.6, [2], 1.0),
        WordTiming(" world", 0.6, 1.0, [3], 1.0),
    ]
    merge_punctuations(words)
    assert [w.word for w in words] == [" hello,", " world"]
    assert words[0].end == 0.6
    assert words[0].tokens == [1, 2]


def test_refine_word_durations_clamps_outliers():
    from nobs_whisper_tpu.decode.timing import refine_word_durations
    # leading pause absorbed into the first word -> truncated from its end
    words = [
        WordTiming(" hello", 0.0, 3.0, [1], 1.0),   # outlier (med dur 0.5)
        WordTiming(" there", 3.0, 3.5, [2], 1.0),
        WordTiming(".", 3.5, 4.0, [3], 1.0),
        WordTiming(" next", 4.0, 4.5, [4], 1.0),
    ]
    refine_word_durations(words)
    assert words[0].end == 3.0
    assert words[0].start == pytest.approx(3.0 - 2 * 0.5)
    # a sentence-end mark smeared across a pause is clamped at its start
    words = [
        WordTiming(" a", 0.0, 0.5, [1], 1.0),
        WordTiming(" b", 0.5, 1.0, [2], 1.0),
        WordTiming(".", 1.0, 9.0, [3], 1.0),
        WordTiming(" c", 9.0, 9.5, [4], 1.0),
    ]
    refine_word_durations(words)
    assert words[2].end == pytest.approx(1.0 + 2 * 0.5)
    # a word following a sentence end that absorbed the pause: clamped
    # from its end
    words = [
        WordTiming(" a", 0.0, 0.5, [1], 1.0),
        WordTiming(".", 0.5, 1.0, [2], 1.0),
        WordTiming(" b", 1.0, 9.0, [3], 1.0),
        WordTiming(" c", 9.0, 9.5, [4], 1.0),
    ]
    refine_word_durations(words)
    assert words[2].start == pytest.approx(9.0 - 2 * 0.5)


def test_refine_segments_with_words_snaps_bounds():
    import types
    from nobs_whisper_tpu.decode.timing import refine_segments_with_words

    def seg(start, end, words=None):
        return types.SimpleNamespace(start=start, end=end, words=words)

    s1 = seg(0.0, 5.0, [WordTiming(" a", 0.8, 1.2, [1], 1.0),
                        WordTiming(" b", 1.2, 2.1, [2], 1.0)])
    s2 = seg(5.0, 10.0, [WordTiming(" c", 1.9, 6.0, [3], 1.0)])
    s3 = seg(10.0, 12.0, None)        # no words: bounds untouched
    refine_segments_with_words([s1, s2, s3], [], window_end=30.0)
    assert s1.start == 0.8 and s1.end == 2.1
    # monotonic: s2's word starts before s1's refined end is clamped
    assert s2.start == pytest.approx(2.1) and s2.end == 6.0
    assert s3.start == 10.0 and s3.end == 12.0


def test_longform_word_timestamps_refined(tiny_engine):
    """End-to-end: word_timestamps=True through the longform loop yields
    word-anchored, monotonic segment bounds inside the window."""
    from nobs_whisper_tpu.decode.rules import DecodeOptions

    eng = tiny_engine
    audio = np.asarray(
        __import__("nobs_whisper_tpu.utils.testing",
                   fromlist=["speech_like_audio"]).speech_like_audio(
                       0.6, seed=21))
    r = eng.transcribe(audio, language="en",
                       opts=DecodeOptions(word_timestamps=True))
    for s in r.segments:
        assert s.start <= s.end
        if s.words:
            assert s.start == pytest.approx(s.words[0].start, abs=1e-6)
            assert s.end == pytest.approx(max(s.words[-1].end,
                                              s.words[0].start), abs=1e-6)
    for a, b in zip(r.segments, r.segments[1:]):
        assert b.start >= a.start - 1e-6


@pytest.fixture(scope="module")
def tiny_engine():
    import jax
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint
    import tempfile, os
    d = tempfile.mkdtemp()
    path = os.path.join(d, "m.bin")
    write_tiny_checkpoint(path)
    return WhisperEngine.from_ggml(path, dtype=jnp.float32)


def test_split_tokens_on_spaces(tiny_engine):
    tok = tiny_engine.tokenizer
    ids = tok.encode("hello world again")
    words, word_toks = split_tokens_on_spaces(tok, ids)
    assert words == ["hello", " world", " again"]
    flat = [t for ts in word_toks for t in ts]
    assert flat == ids


def test_find_word_timings_monotonic(tiny_engine):
    from nobs_whisper_tpu.models.whisper import encode
    eng = tiny_engine
    cfg = eng.cfg
    rng = np.random.RandomState(0)
    mel = rng.randn(1, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32)
    xa = encode(eng.params, jnp.asarray(mel), cfg)
    text = eng.tokenizer.encode("the thing works here")
    sot_seq = eng.tokenizer.sot_sequence(language="en")
    words = find_word_timings(
        eng.params, cfg, eng.tokenizer, xa, text, sot_seq,
        num_frames=2 * cfg.n_audio_ctx, time_offset=0.0)
    assert len(words) >= 1
    window_s = 2 * cfg.n_audio_ctx / 100
    for w in words:
        assert 0.0 <= w.start <= w.end <= window_s + 1e-6
    for a, b in zip(words, words[1:]):
        assert b.start >= a.start - 1e-6


def test_cross_attn_weights_shape(tiny_engine):
    from nobs_whisper_tpu.models.whisper import encode
    eng = tiny_engine
    cfg = eng.cfg
    mel = np.zeros((1, cfg.n_mels, 2 * cfg.n_audio_ctx), np.float32)
    xa = encode(eng.params, jnp.asarray(mel), cfg)
    toks = jnp.asarray(np.array([[cfg.sot, 5, 6, cfg.eot]], np.int32))
    probs = decoder_cross_attn_weights(eng.params, toks, xa, cfg)
    assert probs.shape == (cfg.n_text_layer, 1, cfg.n_text_head, 4,
                           cfg.n_audio_ctx)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)


def test_default_alignment_heads(tiny_engine):
    cfg = tiny_engine.cfg
    heads = default_alignment_heads(cfg)
    assert all(l >= cfg.n_text_layer // 2 for l, _ in heads)
    assert len(heads) == (cfg.n_text_layer - cfg.n_text_layer // 2) * \
        cfg.n_text_head


def test_alignment_heads_from_checkpoint_metadata(tmp_path):
    """Tuned DTW heads flow from checkpoint metadata into the engine:
    GGML sidecar JSON and HF generation_config.json."""
    import json
    import jax.numpy as jnp
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint

    path = str(tmp_path / "m.bin")
    write_tiny_checkpoint(path)

    # no sidecar -> None (heuristic fallback downstream)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    assert eng.alignment_heads is None

    with open(str(tmp_path / "m.alignment_heads.json"), "w") as f:
        json.dump([[1, 0], [1, 2]], f)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    assert eng.alignment_heads == [(1, 0), (1, 2)]

    # malformed sidecar is ignored, not fatal
    with open(str(tmp_path / "m.alignment_heads.json"), "w") as f:
        f.write("{broken")
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    assert eng.alignment_heads is None
