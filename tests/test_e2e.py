"""End-to-end: GGML file -> engine -> long-form transcription, offline."""

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.api import NoModelError, WhisperEngine
from nobs_whisper_tpu.decode.hallucination import filter_hallucinations
from nobs_whisper_tpu.decode.rules import DecodeOptions
from nobs_whisper_tpu.utils.testing import (
    speech_like_audio, tiny_test_config, write_tiny_checkpoint)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "ggml-tiny-random.bin")
    write_tiny_checkpoint(path)
    return WhisperEngine.from_ggml(path, dtype=jnp.float32)


def test_ggml_params_roundtrip(tmp_path):
    """params -> GGML tensors -> file -> params is the identity."""
    import jax
    from nobs_whisper_tpu.core import ggml
    from nobs_whisper_tpu.models.whisper import (
        init_params, params_from_ggml, params_to_ggml_tensors)
    from nobs_whisper_tpu.utils.testing import byte_level_vocab
    from nobs_whisper_tpu.audio.mel import mel_filter_bank

    cfg = tiny_test_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tensors = params_to_ggml_tensors(params, cfg)
    path = str(tmp_path / "rt.bin")
    ggml.write_ggml(path, cfg, mel_filter_bank(cfg.n_mels),
                    byte_level_vocab(cfg), tensors)
    reloaded = params_from_ggml(ggml.read_ggml(path))
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(reloaded)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_transcribe_128_mel_config(tmp_path):
    """End-to-end through a 128-mel-bin config (the large-v3 family's
    geometry, model.rs:104-113,176-188): the mel frontend, conv stem
    input channels, and window decode all key off cfg.n_mels."""
    path = str(tmp_path / "ggml-128mel-random.bin")
    cfg = write_tiny_checkpoint(path, cfg=tiny_test_config(n_mels=128))
    assert cfg.n_mels == 128
    eng = WhisperEngine.from_ggml(path, dtype=jnp.float32)
    assert eng.cfg.n_mels == 128
    r = eng.transcribe(speech_like_audio(0.6, seed=5), language="en")
    assert isinstance(r.text, str)
    assert r.language == "en"


def test_engine_requires_model():
    eng = WhisperEngine()
    assert not eng.loaded
    with pytest.raises(NoModelError):
        eng.transcribe(np.zeros(16000, np.float32))


def test_transcribe_short(engine):
    # The tiny model's audio ctx is 64 frames -> windows of 0.64 s
    audio = speech_like_audio(0.6, seed=3)
    res = engine.transcribe(audio, language="en")
    assert isinstance(res.text, str)
    assert res.language == "en"


def test_transcribe_long_multiwindow(engine):
    """Audio longer than one window exercises the seek loop."""
    audio = speech_like_audio(2.0, seed=5)
    res = engine.transcribe(audio, language="en")
    # seek loop must terminate and produce ordered segments
    for a, b in zip(res.segments, res.segments[1:]):
        assert b.start >= a.start - 1e-6


def test_transcribe_autodetect_language(engine):
    audio = speech_like_audio(0.5, seed=9)
    res = engine.transcribe(audio, language=None)
    assert res.language in ("en", "zh", "de", "es")  # tiny cfg has 4 langs


def test_vocabulary_context_prompt(engine):
    prompt = engine.build_initial_prompt("jax pallas", "hello there")
    assert prompt is not None
    text = engine.tokenizer.decode(prompt)
    assert text == " jax pallas hello there"
    assert engine.build_initial_prompt(None, None) is None
    assert engine.build_initial_prompt("  ", "") is None


def test_transcribe_chunked_rolls_context(engine):
    chunks = [speech_like_audio(0.5, seed=s) for s in (1, 2)]
    out = engine.transcribe_chunked(chunks, language="en")
    assert isinstance(out, str)


# ---------------------------------------------------------------------------
# hallucination filter (port of whisper.rs:233-260 semantics)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("text,expect", [
    ("Thank you for watching!", ""),
    ("thanks for watching", ""),
    ("you", ""),
    ("You.", ""),
    ("...", ""),
    ("♪♪", ""),
    ("…", ""),
    ("", ""),
    ("   ", ""),
    ("시청해 주셔서 감사합니다.", ""),
    ("ご視聴ありがとうございました", ""),
    ("感谢收看!", ""),
    ("Thank you for watching the demo, now let me explain",
     "Thank you for watching the demo, now let me explain"),
    ("hello world", "hello world"),
    ("you are great", "you are great"),
])
def test_hallucination_filter(text, expect):
    assert filter_hallucinations(text) == expect


def test_initial_prompt_reaches_first_window(engine, monkeypatch):
    """Regression: vocabulary/context biasing must actually condition the
    FIRST window's prompt (whisper.rs:98-109) — prompt_reset_since
    previously skipped the initial tokens, making the feature a no-op."""
    import nobs_whisper_tpu.pipeline.longform as lf

    seen = []
    orig = lf.decode_with_fallback

    def spy(params, xa, prompt, *a, **kw):
        seen.append(list(prompt))
        return orig(params, xa, prompt, *a, **kw)

    monkeypatch.setattr(lf, "decode_with_fallback", spy)
    engine.transcribe(speech_like_audio(0.5, seed=4), language="en",
                      vocabulary="jax pallas")
    initial = engine.build_initial_prompt("jax pallas", None)
    assert seen, "decode_with_fallback never called"
    first = seen[0]
    assert first[0] == engine.cfg.sot_prev
    # the initial prompt tokens appear, in order, before the sot sequence
    sot_pos = first.index(engine.cfg.sot)
    assert first[1:sot_pos][-len(initial):] == initial
