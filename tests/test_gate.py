"""Mocked end-to-end run of the real-weight gate (scripts/
real_weight_gate.py) on the tiny-random checkpoint: every stage executes
on this zero-egress box (CPU subprocesses, injected download opener,
synthetic LibriSpeech-layout corpus) and the verdict JSON has the full
structure a networked operator will read after running it for real.
"""

import importlib.util
import io
import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_gate_module():
    spec = importlib.util.spec_from_file_location(
        "real_weight_gate", REPO / "scripts" / "real_weight_gate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """LibriSpeech-layout corpus: chapter dir with *.flac + *.trans.txt."""
    from nobs_whisper_tpu.audio.flac import write_flac
    from nobs_whisper_tpu.utils.testing import sine_audio

    root = tmp_path_factory.mktemp("corpus")
    chap = root / "19" / "198"
    chap.mkdir(parents=True)
    lines = []
    for i, freq in enumerate((220.0, 330.0, 440.0)):
        utt = f"19-198-{i:04d}"
        write_flac(str(chap / f"{utt}.flac"),
                   sine_audio(1.0 + 0.3 * i, freq=freq))
        lines.append(f"{utt} THE QUICK BROWN FOX NUMBER {i}")
    (chap / "19-198.trans.txt").write_text("\n".join(lines) + "\n")
    return root


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from nobs_whisper_tpu.utils.testing import write_tiny_checkpoint
    p = tmp_path_factory.mktemp("m") / "tiny-random.bin"
    write_tiny_checkpoint(str(p))
    return str(p)


@pytest.mark.slow
def test_gate_end_to_end_mocked(corpus, ckpt, tmp_path, monkeypatch):
    gate = _load_gate_module()
    # shrink the sweeps for CPU subprocess runtime; the structure and
    # plumbing (not the numbers) are under test here
    monkeypatch.setattr(gate, "SPEC_SWEEP", [(2, 2)])
    monkeypatch.setattr(gate, "INT8_VARIANTS",
                        {"i8_both": {"NWT_ATTN_I8": "1",
                                     "NWT_ATTN_I8PV": "1"}})

    out = tmp_path / "GATE.json"
    work = tmp_path / "work"
    rc = gate.main([
        str(corpus), "--model", ckpt, "--limit", "3", "--batch", "2",
        "--quant", "int8", "--audio-ctx-sweep", "32",
        "--vad-concat", "3",
        "--stages", "download,baseline,beam,hallucination,"
                    "vad_boundary,spec,int8_attn,audio_ctx",
        "--platform", "cpu", "--work", str(work), "--out", str(out)])

    verdict = json.loads(out.read_text())
    stages = verdict["stages"]
    # download: a local .bin path short-circuits
    assert stages["download"]["ok"]
    assert stages["download"]["models"][ckpt]["status"] == "local-path"
    # baseline ran, produced metrics + dumped hypotheses
    assert stages["baseline"]["ok"], stages["baseline"]
    assert stages["baseline"]["utterances"] == 3
    assert 0.0 <= stages["baseline"]["wer"]  # random weights: garbage ok
    assert (work / "baseline_hyp.jsonl").exists()
    # spec sweep ran its one config with acceptance measured
    row = stages["spec"]["sweep"][0]
    assert "error" not in row, row
    assert row["k"] == 2 and row["pool"] == 2
    assert row["acceptance"] is not None
    assert isinstance(stages["spec"]["flip_speculative_default"], bool)
    # int8-attn variant priced as a WER delta vs baseline
    v = stages["int8_attn"]["variants"]["i8_both"]
    assert "error" not in v, v
    assert "wer_delta_abs" in v and isinstance(v["flip"], bool)
    # audio-ctx truncation priced
    c = stages["audio_ctx"]["sweep"]["32"]
    assert "error" not in c, c
    assert "wer_delta_abs" in c and isinstance(c["flip"], bool)
    # beam5 priced as a WER delta + RTF (random weights: the delta's
    # VALUE is meaningless, the plumbing + threshold shape is the test)
    b = stages["beam"]
    assert "error" not in b, b
    assert "wer_delta_abs" in b and "rtf" in b
    assert (work / "beam5_hyp.jsonl").exists()
    # hallucination false-drop accounting from the baseline counters
    h = stages["hallucination"]
    assert "error" not in h, h
    assert h["calls"] >= 3 and "false_drop_rate" in h
    # VAD chunk-boundary WER: both long-form paths ran on the same
    # concatenated streams
    v = stages["vad_boundary"]
    assert "error" not in v, v
    assert v["streams"] == 1          # 3 utts at --vad-concat 3
    assert "wer_vad_chunked" in v and "wer_longform_control" in v
    # overall verdict structure (random weights can fail the new
    # accuracy thresholds legitimately — ok must be a bool, the
    # threshold-free stages must pass)
    assert isinstance(verdict["flips"], dict)
    assert isinstance(verdict["ok"], bool) and rc in (0, 1)
    for s in ("download", "baseline", "spec", "int8_attn", "audio_ctx"):
        assert stages[s]["ok"], (s, stages[s])


@pytest.mark.slow
def test_gate_parity_stage(corpus, ckpt, tmp_path, monkeypatch):
    """Parity vs 'whisper.cpp output': built from our own baseline dump,
    the stage must report exact_match_rate 1.0; with a corrupted
    transcript it must drop below threshold and fail the stage."""
    gate = _load_gate_module()
    out = tmp_path / "GATE.json"
    work = tmp_path / "work"
    rc = gate.main([
        str(corpus), "--model", ckpt, "--limit", "3", "--batch", "1",
        "--quant", "none", "--stages", "baseline", "--platform", "cpu",
        "--work", str(work), "--out", str(out)])
    assert rc == 0

    hyps = [json.loads(l) for l in
            (work / "baseline_hyp.jsonl").read_text().splitlines()]
    cpp = tmp_path / "cpp"
    cpp.mkdir()
    for row in hyps:
        (cpp / (Path(row["path"]).stem + ".txt")).write_text(row["hyp"])

    rc = gate.main([
        str(corpus), "--model", ckpt, "--limit", "3",
        "--cpp-transcripts", str(cpp), "--stages", "parity",
        "--platform", "cpu", "--work", str(work), "--out", str(out)])
    verdict = json.loads(out.read_text())
    par = verdict["stages"]["parity"]
    assert par["ok"] and par["exact_match_rate"] == 1.0 and rc == 0

    # corrupt one transcript: rate 2/3 < 0.9 threshold -> stage fails
    (cpp / (Path(hyps[0]["path"]).stem + ".txt")).write_text("ALTERED")
    rc = gate.main([
        str(corpus), "--model", ckpt, "--limit", "3",
        "--cpp-transcripts", str(cpp), "--stages", "parity",
        "--platform", "cpu", "--work", str(work), "--out", str(out)])
    par = json.loads(out.read_text())["stages"]["parity"]
    assert not par["ok"] and par["exact_match_rate"] < 0.9 and rc == 1


def test_gate_download_stage_injected_opener(tmp_path, monkeypatch):
    """The download stage drives the real registry machinery through an
    injected opener (the zero-egress seam)."""
    gate = _load_gate_module()
    from nobs_whisper_tpu.serve import models as registry

    monkeypatch.setenv("NOBS_WHISPER_TPU_HOME", str(tmp_path))
    payload = b"GGML-ish bytes (contents irrelevant to the download)"

    class FakeResponse:
        headers = {"Content-Length": str(len(payload))}

        def __init__(self):
            self._buf = io.BytesIO(payload)

        def read(self, n):
            return self._buf.read(n)

    real = registry.download_model
    monkeypatch.setattr(
        registry, "download_model",
        lambda mid, **kw: real(mid, _opener=lambda url: FakeResponse(),
                               **kw))

    class A:
        model = "tiny"
        draft_model = None
        download = True

    res = gate.stage_download(A)
    assert res["ok"], res
    assert res["models"]["tiny"]["status"] == "downloaded"
    assert Path(res["models"]["tiny"]["path"]).read_bytes() == payload

    # and without --download, a missing model is a clear error
    class B:
        model = "small"
        draft_model = None
        download = False

    res = gate.stage_download(B)
    assert not res["ok"]
    assert "not downloaded" in res["models"]["small"]["error"]
