"""audio_ctx truncation — the whisper.cpp ``wparams.audio_ctx`` analog.

The reference's inference core (whisper.cpp, SURVEY.md L0) exposes a
truncated-encoder-context knob its app never sets: run the encoder on the
first ``2*audio_ctx`` mel frames with the first ``audio_ctx`` rows of the
position table, shrinking every window to ``audio_ctx * 0.02`` seconds.
The TPU engine exposes it as ``WhisperEngine.with_audio_ctx`` (engine
level — one static window geometry per engine keeps every compiled
program and the batcher's packing uniform).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nobs_whisper_tpu.api import WhisperEngine
from nobs_whisper_tpu.models.whisper import encode, init_params
from nobs_whisper_tpu.utils.testing import (
    speech_like_audio, tiny_test_config, write_tiny_checkpoint)


def test_pos_slice_matches_native_short_table():
    """Encoding through a truncated context must equal an encoder built
    NATIVELY at that context length: the slice takes the FIRST rows of
    the position table (whisper.cpp semantics), and nothing else in the
    encoder depends on n_audio_ctx."""
    cfg_full = tiny_test_config()              # n_audio_ctx = 64
    short = 32
    cfg_short = dataclasses.replace(cfg_full, n_audio_ctx=short)

    key = jax.random.PRNGKey(7)
    p_full = init_params(key, cfg_full, dtype=jnp.float32)
    p_short = init_params(key, cfg_short, dtype=jnp.float32)

    # identical draws everywhere; pos is deterministic sinusoids, and
    # sinusoids(C) == sinusoids(full)[:C] row-for-row
    np.testing.assert_allclose(
        np.asarray(p_full["encoder"]["pos"][:short]),
        np.asarray(p_short["encoder"]["pos"]), rtol=0, atol=0)

    mel = np.random.RandomState(3).randn(
        2, cfg_full.n_mels, 2 * short).astype(np.float32)
    xa_sliced = encode(p_full, jnp.asarray(mel), cfg_short)
    xa_native = encode(p_short, jnp.asarray(mel), cfg_short)
    np.testing.assert_allclose(np.asarray(xa_sliced),
                               np.asarray(xa_native),
                               rtol=1e-6, atol=1e-6)
    assert xa_sliced.shape == (2, short, cfg_full.n_audio_state)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("actx") / "ggml-tiny-random.bin")
    write_tiny_checkpoint(path)
    return WhisperEngine.from_ggml(path, dtype=jnp.float32)


def test_with_audio_ctx_validation(engine):
    with pytest.raises(ValueError):
        engine.with_audio_ctx(0)
    with pytest.raises(ValueError):
        engine.with_audio_ctx(engine.cfg.n_audio_ctx + 1)
    # full context is the identity (no new programs compiled)
    assert engine.with_audio_ctx(engine.cfg.n_audio_ctx) is engine


def test_with_audio_ctx_transcribe_e2e(engine):
    """Long-form transcription through truncated windows: window_frames
    derives from the replaced cfg everywhere (longform seek loop, mel
    slicing, cross-KV), so 1 s of audio through a 0.64 s window splits
    into multiple windows and still produces a transcript."""
    short = engine.with_audio_ctx(32)          # 32 * 0.02 = 0.64 s windows
    assert short.cfg.n_audio_ctx == 32
    assert engine.cfg.n_audio_ctx == 64        # original untouched

    audio = speech_like_audio(1.0, seed=11)
    r = short.transcribe(audio, language="en")
    assert isinstance(r.text, str)
    assert r.language == "en"
    # the same audio through the full-context engine still works (the
    # two engines share params; programs differ only by static cfg)
    r_full = engine.transcribe(audio, language="en")
    assert isinstance(r_full.text, str)


def test_cli_audio_ctx_flag(tmp_path):
    """--audio-ctx reaches the engine through the CLI loader (subprocess,
    the test_cli.py pattern)."""
    import json
    import subprocess
    import sys

    from nobs_whisper_tpu.audio.io import write_wav

    model = str(tmp_path / "ggml-test.bin")
    write_tiny_checkpoint(model)
    wav = str(tmp_path / "u.wav")
    write_wav(wav, speech_like_audio(1.0, seed=3))
    r = subprocess.run(
        [sys.executable, "-m", "nobs_whisper_tpu.cli", "transcribe", wav,
         "--model", model, "--language", "en", "--dtype", "float32",
         "--audio-ctx", "32", "--json"],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "NOBS_WHISPER_TPU_HOME": str(tmp_path),
             "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "text" in out
