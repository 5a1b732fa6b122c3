"""Offline tools: GGML quantizer script, word-timestamp transcribe option."""

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.core import ggml
from nobs_whisper_tpu.utils.testing import (speech_like_audio,
                                            write_tiny_checkpoint)


def test_quantize_script(tmp_path):
    src = str(tmp_path / "in.bin")
    dst = str(tmp_path / "out.bin")
    write_tiny_checkpoint(src)
    r = subprocess.run(
        [sys.executable, "scripts/quantize_model.py", src, dst,
         "--type", "q5_0"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "smaller" in r.stdout

    a = ggml.read_ggml(src)
    b = ggml.read_ggml(dst)
    assert set(a.tensors) == set(b.tensors)
    assert b.vocab == a.vocab
    # 2D weights quantized, error bounded; 1D untouched
    t = "decoder.blocks.0.attn.query.weight"
    assert b.tensor_types[t] == ggml.GGML_TYPE_Q5_0
    err = np.abs(a.tensors[t] - b.tensors[t]).max()
    assert err < np.abs(a.tensors[t]).max() / 8
    np.testing.assert_array_equal(a.tensors["decoder.ln.weight"],
                                  b.tensors["decoder.ln.weight"])


def test_transcribe_with_word_timestamps(tmp_path):
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.decode.rules import DecodeOptions

    path = str(tmp_path / "m.bin")
    write_tiny_checkpoint(path)
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    audio = speech_like_audio(0.6, seed=3)
    res = eng.transcribe(audio, language="en",
                         opts=DecodeOptions(word_timestamps=True))
    for seg in res.segments:
        assert seg.words is not None
        for w in seg.words:
            assert w.end >= w.start >= 0


def test_native_checkpoint_roundtrip(tmp_path):
    from nobs_whisper_tpu.api import WhisperEngine

    src = str(tmp_path / "m.bin")
    write_tiny_checkpoint(src)
    eng = WhisperEngine.from_ggml(src, dtype=jnp.float32).quantize()
    snap = str(tmp_path / "snapshot")
    eng.save_native(snap)

    eng2 = WhisperEngine.from_native(snap)
    assert eng2.cfg == eng.cfg
    assert eng2.tokenizer._vocab == eng.tokenizer._vocab
    import jax
    import numpy as np
    for a, b in zip(jax.tree.leaves(eng.params),
                    jax.tree.leaves(eng2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # quantized structure preserved
    assert "tok_emb_q" in eng2.params["decoder"]

    audio = speech_like_audio(0.5, seed=1)
    r1 = eng.transcribe(audio, language="en")
    r2 = eng2.transcribe(audio, language="en")
    assert r1.text == r2.text
