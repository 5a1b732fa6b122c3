"""Mel front-end parity against the transformers feature extractor.

transformers' WhisperFeatureExtractor reproduces openai-whisper's log-mel
exactly (same filters, STFT, clamps), so it is our offline numeric oracle
for what whisper.cpp computes.
"""

import numpy as np
import pytest

from nobs_whisper_tpu.audio.mel import (
    log_mel_numpy_f64, log_mel_spectrogram, mel_filter_bank, pad_or_trim)
from nobs_whisper_tpu.utils.testing import sine_audio, speech_like_audio


@pytest.mark.parametrize("n_mels", [80, 128])
def test_filterbank_matches_transformers(n_mels):
    from transformers.audio_utils import mel_filter_bank as hf_mel
    expected = hf_mel(
        num_frequency_bins=201,
        num_mel_filters=n_mels,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    ours = mel_filter_bank(n_mels)
    np.testing.assert_allclose(ours, expected.T, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_oracle_matches_transformers(n_mels):
    """The fp64 oracle must match the HF feature extractor bit-tight —
    this pins the algorithm (padding, window, drop-last-frame, clamps)."""
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=n_mels)
    audio = speech_like_audio(4.0, seed=7)
    padded = np.asarray(pad_or_trim(audio))

    expected = fe(padded, sampling_rate=16000, return_tensors="np",
                  padding="do_not_pad")["input_features"][0]
    oracle = log_mel_numpy_f64(padded, n_mels=n_mels)
    assert oracle.shape == expected.shape == (n_mels, 3000)
    np.testing.assert_allclose(oracle, expected, rtol=1e-4, atol=1e-5)


def test_log_mel_jax_matches_oracle():
    """The fp32 JAX path may deviate only by float noise in near-silent
    bins (same property as whisper.cpp's own fp32 FFT): tiny mean error,
    bounded max error."""
    audio = np.asarray(pad_or_trim(speech_like_audio(4.0, seed=7)))
    oracle = log_mel_numpy_f64(audio, n_mels=80)
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=80))
    err = np.abs(ours - oracle)
    assert err.mean() < 2e-4
    assert err.max() < 0.03


def test_log_mel_batched_matches_single():
    audio = np.stack([np.asarray(pad_or_trim(sine_audio(2.0, 300))),
                      np.asarray(pad_or_trim(speech_like_audio(3.0)))])
    batched = np.asarray(log_mel_spectrogram(audio))
    singles = np.stack([np.asarray(log_mel_spectrogram(a)) for a in audio])
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-6)


def test_pad_or_trim():
    a = np.ones(100, np.float32)
    assert pad_or_trim(a, 50).shape == (50,)
    p = np.asarray(pad_or_trim(a, 200))
    assert p.shape == (200,)
    assert p[100:].sum() == 0


def test_framed_fast_path_matches_longform_window():
    """frame_window_np + log_mel_from_frames (the serving fast path's
    host/device halves) must reproduce log_mel_longform's first window
    exactly for <=30 s chunks."""
    import numpy as np
    import jax.numpy as jnp
    from nobs_whisper_tpu.audio.mel import (HOP_LENGTH, N_FRAMES,
                                            frame_window_np,
                                            log_mel_from_frames,
                                            log_mel_longform)

    rng = np.random.RandomState(0)
    for seconds in (0.5, 5.0, 29.0, 30.0, 30.003):
        audio = (rng.randn(int(16000 * seconds)) * 0.3).astype(np.float32)
        ref = log_mel_longform(audio, n_mels=80,
                               padding=N_FRAMES * HOP_LENGTH)[:, :N_FRAMES]
        frames = frame_window_np(audio)
        assert frames.shape == (N_FRAMES, 400)
        got = np.asarray(log_mel_from_frames(
            jnp.asarray(frames)[None], n_mels=80))[0]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_real_frame_prefix_is_exact():
    """Rows past n_real_frames are exactly zero for any chunk length,
    and device-padding the prefix back (log_mel_from_frames n_frames=)
    is bit-identical to the full host-padded window — the contract the
    bucketed transfer path (pipeline/batcher.py pad_rows) rests on."""
    import numpy as np

    from nobs_whisper_tpu.audio.mel import (frame_window_np,
                                            log_mel_from_frames,
                                            n_real_frames)

    rng = np.random.default_rng(3)
    for secs in (0.05, 0.4, 3.0, 12.7, 29.99, 30.0):
        n = int(16000 * secs)
        audio = rng.standard_normal(n).astype(np.float32) * 0.1
        frames = frame_window_np(audio)
        k = n_real_frames(n)
        assert not np.any(frames[k:]), secs      # tail exactly zero
        full = np.asarray(log_mel_from_frames(frames[None]))
        # simulate the batcher: 512-bucketed prefix, device pad-back
        bucket = min(frames.shape[0], -(-max(k, 512) // 512) * 512)
        pre = np.asarray(log_mel_from_frames(
            frames[None, :bucket], n_frames=frames.shape[0]))
        np.testing.assert_array_equal(full, pre)


def test_batched_engine_prefix_transfer_token_exact():
    """The end-to-end serving fast path emits identical transcripts for
    a short chunk whether frames cross as the full padded window or as
    the real-frame prefix (the production path)."""
    import numpy as np

    import jax.numpy as jnp

    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.decode.rules import DecodeOptions
    from nobs_whisper_tpu.pipeline.batched_engine import BatchedEngine
    from nobs_whisper_tpu.utils.testing import (sine_audio,
                                                write_tiny_checkpoint)
    import tempfile
    import os

    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "m.bin")
    write_tiny_checkpoint(p)
    eng = WhisperEngine.from_ggml(p, dtype=jnp.float32)
    opts = DecodeOptions(temperature_increment=0.0, sample_len=12)
    audio = np.asarray(sine_audio(1.3), np.float32)

    from nobs_whisper_tpu.audio.mel import frame_window_np, n_real_frames
    wf = 2 * eng.cfg.n_audio_ctx
    frames_full = frame_window_np(audio, n_frames=wf)
    frames_pre = frames_full[: n_real_frames(len(audio), wf)]
    prompt = list(eng.tokenizer.sot_sequence(language="en",
                                             task="transcribe"))
    be = BatchedEngine(eng, opts=opts, max_batch=2)
    try:
        res_full = be.batcher.submit(
            None, prompt, temperature=0.0,
            frames=frames_full).result(timeout=600)
        res_pre = be.batcher.submit(
            None, prompt, temperature=0.0,
            frames=frames_pre).result(timeout=600)
    finally:
        be.close()
    assert list(res_full.tokens) == list(res_pre.tokens)
