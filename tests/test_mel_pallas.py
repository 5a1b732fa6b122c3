"""Pallas fused mel kernel vs the pure-JAX reference (interpret mode on
the CPU test mesh; compiled path exercised on TPU by bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
from nobs_whisper_tpu.ops.mel_pallas import (FRAME_BLOCK,
                                             log_mel_spectrogram_pallas)
from nobs_whisper_tpu.utils.testing import sine_audio, speech_like_audio


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_matches_reference(n_mels):
    audio = np.stack([
        np.asarray(pad_or_trim(speech_like_audio(5.0, seed=1))),
        np.asarray(pad_or_trim(sine_audio(3.0, freq=500))),
    ])
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels))
    got = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(audio), n_mels,
                                                interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_single_sample():
    audio = np.asarray(pad_or_trim(speech_like_audio(2.0, seed=3)))
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio), 80))
    got = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(audio), 80,
                                                interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_rejects_non_block_multiple():
    bad = jnp.zeros((1, (FRAME_BLOCK + 1) * 160))
    with pytest.raises(ValueError, match="not a multiple"):
        log_mel_spectrogram_pallas(bad, 80, interpret=True)
