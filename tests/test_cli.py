"""CLI: transcribe (stdout/json/srt/vtt), models list, config, writers,
beam + task wiring through the engine."""

import json
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nobs_whisper_tpu.utils.testing import (speech_like_audio,
                                            write_tiny_checkpoint)
from nobs_whisper_tpu.utils.writers import WRITERS, write_result


@pytest.fixture(scope="module")
def wav_and_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    model = str(d / "ggml-test.bin")
    write_tiny_checkpoint(model)
    wav = str(d / "a.wav")
    from nobs_whisper_tpu.audio.io import write_wav
    write_wav(wav, speech_like_audio(0.5, seed=2))
    return wav, model


def _run(args, home):
    return subprocess.run(
        [sys.executable, "-m", "nobs_whisper_tpu.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "NOBS_WHISPER_TPU_HOME": home,
             "PYTHONPATH": "/root/repo"})


def test_cli_transcribe_json(wav_and_model, tmp_path):
    wav, model = wav_and_model
    r = _run(["transcribe", wav, "--model", model, "--language", "en",
              "--dtype", "float32", "--json"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "text" in out and out["language"] == "en"


def test_cli_transcribe_srt(wav_and_model, tmp_path):
    wav, model = wav_and_model
    r = _run(["transcribe", wav, "--model", model, "--language", "en",
              "--dtype", "float32", "--output-format", "srt",
              "--output", str(tmp_path / "out.srt")], str(tmp_path))
    assert r.returncode == 0, r.stderr
    content = (tmp_path / "out.srt").read_text()
    assert "-->" in content or content == ""


def test_cli_models_list(tmp_path):
    r = _run(["models", "list"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "large-v3-turbo" in r.stdout
    assert r.stdout.count("\n") >= 12


def test_cli_config(tmp_path):
    r = _run(["config", "set", "selected_model=small", "language=ko"],
             str(tmp_path))
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["selected_model"] == "small"
    r = _run(["config", "get"], str(tmp_path))
    assert json.loads(r.stdout)["language"] == "ko"


def test_cli_no_model_errors(tmp_path):
    r = _run(["transcribe", "/nonexistent.wav"], str(tmp_path))
    assert r.returncode == 2
    assert "no model selected" in r.stderr


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

class _Seg:
    def __init__(self, start, end, text):
        self.start, self.end, self.text = start, end, text
        self.__dict__.update(id=0, seek=0, tokens=[], temperature=0.0,
                             avg_logprob=0.0, no_speech_prob=0.0, words=None)


class _Res:
    text = "hello world again"
    language = "en"
    segments = [_Seg(0.0, 1.5, " hello world"), _Seg(1.5, 2.25, " again")]


import dataclasses  # noqa: E402


def test_writers(tmp_path):
    res = _Res()
    # srt
    p = str(tmp_path / "o.srt")
    write_result(res, p, "srt")
    srt = open(p).read()
    assert "00:00:00,000 --> 00:00:01,500" in srt
    assert "hello world" in srt
    # vtt
    p = str(tmp_path / "o.vtt")
    write_result(res, p, "vtt")
    vtt = open(p).read()
    assert vtt.startswith("WEBVTT")
    assert "00:00:01.500 --> 00:00:02.250" in vtt
    # tsv
    p = str(tmp_path / "o.tsv")
    write_result(res, p, "tsv")
    assert "0\t1500\thello world" in open(p).read()
    # txt
    p = str(tmp_path / "o.txt")
    write_result(res, p, "txt")
    assert open(p).read() == "hello world again\n"
    with pytest.raises(KeyError):
        write_result(res, str(tmp_path / "x"), "nope")


def test_beam_wired_into_transcribe(tmp_path):
    """beam_size=5 flows through the fallback ladder."""
    from nobs_whisper_tpu.api import WhisperEngine
    from nobs_whisper_tpu.decode.rules import DecodeOptions

    model = str(tmp_path / "m.bin")
    write_tiny_checkpoint(model)
    eng = WhisperEngine.from_ggml(model, dtype=jnp.float32)
    audio = speech_like_audio(0.5, seed=4)
    opts = DecodeOptions(beam_size=3, logprob_threshold=-1e9,
                         entropy_threshold=0.0, no_speech_threshold=1.1,
                         compression_ratio_threshold=1e9)
    res = eng.transcribe(audio, language="en", opts=opts)
    assert isinstance(res.text, str)


def test_translate_task(tmp_path):
    from nobs_whisper_tpu.api import WhisperEngine

    model = str(tmp_path / "m.bin")
    write_tiny_checkpoint(model)
    eng = WhisperEngine.from_ggml(model, dtype=jnp.float32)
    audio = speech_like_audio(0.4, seed=6)
    res = eng.transcribe(audio, language="en", task="translate")
    assert isinstance(res.text, str)


def test_default_batch_per_model():
    """Auto --batch picks the measured per-model knee (docs/ROADMAP.md
    round-3 sweeps); distil/quantized ids share the parent knee."""
    from nobs_whisper_tpu.cli import _default_batch
    assert _default_batch("large-v3-turbo") == 40
    assert _default_batch("large-v3") == 24
    assert _default_batch("large-v3-q5_0") == 24
    assert _default_batch("distil-large-v3") == 40
    assert _default_batch("small") == 48
    assert _default_batch("distil-small.en") == 48
    assert _default_batch("medium-q5_0") == 32
    assert _default_batch("tiny.en") == 192  # measured 2026-08-19
    assert _default_batch("base.en") == 96   # measured 2026-08-19
    assert _default_batch(None) == 40
    assert _default_batch("/models/ggml-small.bin") == 48
    # only the basename is matched — a directory component must never
    # pick the knee (48 would hard-OOM a 16 GB chip running large-v3)
    assert _default_batch("/data/smallville/ggml-large-v3.bin") == 24


def test_default_beam_batch():
    """A beam-configured server batches at the beam knee (~120 flattened
    rows, round-4 sweep), not the greedy knee — greedy-knee batching at
    beam5 meant BK=200 on turbo, past the measured HBM cliff."""
    from nobs_whisper_tpu.cli import _default_beam_batch
    assert _default_beam_batch("large-v3-turbo", 5) == 24
    assert _default_beam_batch("large-v3", 5) == 24
    assert _default_beam_batch("small", 5) == 24
    assert _default_beam_batch("large-v3-turbo", 2) == 40  # greedy cap
    assert _default_beam_batch("tiny", 10) == 12
    assert _default_beam_batch(None, 200) == 1


def test_cmd_serve_uses_beam_knee(tmp_path, monkeypatch):
    """cmd_serve's auto batch routes through the beam knee when the
    persisted config selects a beam strategy."""
    import argparse

    from nobs_whisper_tpu import cli as climod
    from nobs_whisper_tpu.serve.config import ConfigManager

    monkeypatch.setenv("NOBS_WHISPER_TPU_HOME", str(tmp_path))
    ConfigManager().update(beam_size=5)
    seen = {}

    def fake_default_beam(mid, k):
        seen["args"] = (mid, k)
        return 1          # batch<=1 -> sequential mode, no engine build

    monkeypatch.setattr(climod, "_default_beam_batch", fake_default_beam)
    monkeypatch.setattr(
        climod, "_load_engine",
        lambda *a, **kw: type("E", (), {"quantize": lambda s: s})())
    monkeypatch.setattr("nobs_whisper_tpu.serve.server.serve",
                        lambda *a, **kw: None)
    args = argparse.Namespace(
        model="large-v3-turbo", host="127.0.0.1", port=0, batch=0,
        mesh=None, dtype="float32", quant="none", warmup=False,
        speculative=0, draft_pool=None, draft_model=None, audio_ctx=0)
    climod.cmd_serve(args)
    assert seen["args"] == ("large-v3-turbo", 5)


def test_cli_transcribe_multi_file_batched(wav_and_model, tmp_path):
    """transcribe f1 f2 --batch 2: both files through one shared window
    batcher; per-file JSON records match the sequential single-file
    outputs exactly. Both files are MULTI-window so both take the
    batched long-form path (which runs the same seek algorithm as the
    sequential engine; single-window chunks take the fast path, which
    legitimately skips the seek loop's partial-window re-decodes)."""
    _, model = wav_and_model
    from nobs_whisper_tpu.audio.io import write_wav
    files = []
    for name, (secs, seed) in (("b1.wav", (2.0, 7)),
                               ("b2.wav", (1.6, 8))):
        f = str(tmp_path / name)
        write_wav(f, speech_like_audio(secs, seed=seed))
        files.append(f)

    # --temperature-increment 0 pins a single temp-0 rung: with random
    # weights every window fails the quality gates, and ladder rungs
    # above 0 sample with path-specific rngs (documented divergence)
    det = ["--temperature-increment", "0"]
    batched = _run(["transcribe", *files, "--model", model,
                    "--language", "en", "--dtype", "float32", "--json",
                    "--batch", "2", *det], str(tmp_path))
    assert batched.returncode == 0, batched.stderr
    recs = [json.loads(ln) for ln in batched.stdout.strip().splitlines()
            if ln.startswith("{")]
    assert [r["file"] for r in recs] == files

    for f, rec in zip(files, recs):
        solo = _run(["transcribe", f, "--model", model, "--language",
                     "en", "--dtype", "float32", "--json", *det],
                    str(tmp_path))
        assert solo.returncode == 0, solo.stderr
        assert json.loads(
            solo.stdout.strip().splitlines()[-1])["text"] == rec["text"]


def test_cli_transcribe_multi_file_sidecars(wav_and_model, tmp_path):
    """Multiple inputs with --output-format write per-file sidecars into
    the --output directory."""
    wav, model = wav_and_model
    from nobs_whisper_tpu.audio.io import write_wav
    wav2 = str(tmp_path / "c.wav")
    write_wav(wav2, speech_like_audio(0.4, seed=8))
    outdir = tmp_path / "subs"
    r = _run(["transcribe", wav, wav2, "--model", model, "--language",
              "en", "--dtype", "float32", "--output-format", "srt",
              "--output", str(outdir), "--batch", "2"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert (outdir / "a.srt").exists() and (outdir / "c.srt").exists()


def test_cli_transcribe_sidecar_basename_collision(wav_and_model,
                                                   tmp_path):
    """Same-basename inputs from different directories must not
    silently overwrite each other's sidecar."""
    wav, model = wav_and_model
    from nobs_whisper_tpu.audio.io import write_wav
    other = tmp_path / "elsewhere"
    other.mkdir()
    wav2 = str(other / "a.wav")          # same basename as the fixture
    write_wav(wav2, speech_like_audio(0.4, seed=9))
    outdir = tmp_path / "subs2"
    r = _run(["transcribe", wav, wav2, "--model", model, "--language",
              "en", "--dtype", "float32", "--output-format", "srt",
              "--output", str(outdir), "--batch", "2"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert (outdir / "a.srt").exists() and (outdir / "a-2.srt").exists()


def test_cli_transcribe_speculative_matches_plain(wav_and_model, tmp_path):
    """transcribe --speculative K (DecodeOptions.speculative flowing
    through the longform path) gives the same transcript as plain."""
    wav, model = wav_and_model
    base = _run(["transcribe", wav, "--model", model, "--language", "en",
                 "--dtype", "float32", "--json"], str(tmp_path))
    assert base.returncode == 0, base.stderr
    spec = _run(["transcribe", wav, "--model", model, "--language", "en",
                 "--dtype", "float32", "--json", "--speculative", "2"],
                str(tmp_path))
    assert spec.returncode == 0, spec.stderr
    a = json.loads(base.stdout.strip().splitlines()[-1])
    b = json.loads(spec.stdout.strip().splitlines()[-1])
    assert a["text"] == b["text"]


def test_cli_serve_sigterm_graceful(wav_and_model, tmp_path):
    """SIGTERM drains and exits cleanly (lib.rs:98-113 analog): the
    foreground server must shut down instead of dying mid-batch."""
    import signal
    import time
    import urllib.request
    wav, model = wav_and_model
    port = 8841
    proc = subprocess.Popen(
        [sys.executable, "-m", "nobs_whisper_tpu.cli", "serve",
         "--model", model, "--dtype", "float32", "--quant", "none",
         "--batch", "2", "--port", str(port)],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "NOBS_WHISPER_TPU_HOME": str(tmp_path),
             "PYTHONPATH": "/root/repo"})
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=2):
                    break
            except Exception:
                time.sleep(0.5)
        else:
            raise AssertionError("server never came up")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        assert rc == 0, (rc, proc.stderr.read().decode()[-500:])
    finally:
        if proc.poll() is None:
            proc.kill()
