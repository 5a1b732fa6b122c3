"""The examples/ scripts run end-to-end against a live tiny server (so
the documented entry points cannot rot)."""

import socket

import numpy as np
import pytest

import jax.numpy as jnp


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.audio.io import write_wav
    from nobs_whisper_tpu.serve.server import serve
    from nobs_whisper_tpu.utils.testing import (speech_like_audio,
                                                write_tiny_checkpoint)

    root = tmp_path_factory.mktemp("examples")
    model = str(root / "m.bin")
    write_tiny_checkpoint(model)
    engine = WhisperEngine.from_ggml(model, dtype=jnp.float32)
    port = _free_port()
    httpd = serve(engine, port=port, background=True)
    wavs = []
    for i in range(2):
        p = str(root / f"a{i}.wav")
        write_wav(p, speech_like_audio(2.0, seed=i))
        wavs.append(p)
    yield f"http://127.0.0.1:{port}", model, wavs
    httpd.shutdown()


def test_local_engine_example(served):
    from examples.local_engine import main
    _, model, wavs = served
    text = main([model, wavs[0]])
    assert isinstance(text, str)


def test_transcribe_file_example(served, capsys):
    from examples.transcribe_file import main
    url, _, wavs = served
    text = main(["--url", url, wavs[0]])
    assert isinstance(text, str)
    assert text in capsys.readouterr().out


def test_streaming_session_example(served):
    from examples.streaming_session import main
    url, _, wavs = served
    text = main(["--url", url, wavs[0]])
    assert isinstance(text, str)


def test_batch_files_example(served):
    from examples.batch_files import main
    url, _, wavs = served
    results = main(["--url", url] + wavs)
    assert len(results) == 2 and all(isinstance(t, str) for _, t in results)
