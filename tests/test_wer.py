"""WER metric + eval harness plumbing."""

import numpy as np
import pytest

from nobs_whisper_tpu.utils.wer import (corpus_wer, normalize_text,
                                        word_error_rate)


def test_normalize():
    assert normalize_text("Hello, World!") == "hello world"
    assert normalize_text("I can't  do it.") == "i cannot do it"
    assert normalize_text("café") == "cafe"
    assert normalize_text("it's fine") == "its fine"


def test_wer_exact():
    r = word_error_rate("the cat sat", "The cat sat.")
    assert r.wer == 0.0
    assert r.exact_match


def test_wer_counts():
    r = word_error_rate("a b c d", "a x c")     # 1 sub (b->x), 1 del (d)
    assert r.substitutions == 1
    assert r.deletions == 1
    assert r.insertions == 0
    assert r.wer == pytest.approx(0.5)


def test_wer_insertions():
    r = word_error_rate("a b", "a x b y")
    assert r.insertions == 2
    assert r.wer == pytest.approx(1.0)


def test_wer_empty():
    assert word_error_rate("", "").wer == 0.0
    assert word_error_rate("a b", "").wer == pytest.approx(1.0)


def test_corpus_aggregation():
    agg = corpus_wer([("a b c", "a b c"), ("x y", "x z")])
    assert agg.ref_words == 5
    assert agg.wer == pytest.approx(0.2)
    assert not agg.exact_match


def test_eval_harness_pairs(tmp_path):
    from eval import find_pairs
    from nobs_whisper_tpu.audio.io import write_wav
    write_wav(str(tmp_path / "u1.wav"), np.zeros(1600, np.float32))
    (tmp_path / "u1.txt").write_text("hello world")
    write_wav(str(tmp_path / "sp-ch-u2.wav"), np.zeros(1600, np.float32))
    (tmp_path / "sp-ch.trans.txt").write_text("sp-ch-u2 SECOND UTTERANCE\n")
    # LibriSpeech-shaped: speaker/chapter dir, .flac audio, shared
    # chapter .trans.txt (the real-weight eval target's exact layout)
    from nobs_whisper_tpu.audio.flac import write_flac
    chap = tmp_path / "19" / "198"
    chap.mkdir(parents=True)
    write_flac(str(chap / "19-198-0000.flac"),
               np.zeros(1600, np.float32), 16000)
    (chap / "19-198.trans.txt").write_text("19-198-0000 THIRD UTTERANCE\n")
    pairs = find_pairs(tmp_path)
    assert len(pairs) == 3
    texts = {p.stem: t for p, t in pairs}
    assert texts["u1"] == "hello world"
    assert texts["sp-ch-u2"] == "SECOND UTTERANCE"
    assert texts["19-198-0000"] == "THIRD UTTERANCE"


def test_eval_harness_batched_matches_sequential(tmp_path):
    """eval.py --batch N routes utterances through one shared window
    batcher and must report identical WER/exact-match to the sequential
    run (greedy determinism across the batched path)."""
    import json
    import subprocess
    import sys

    from nobs_whisper_tpu.audio.io import write_wav
    from nobs_whisper_tpu.utils.testing import (speech_like_audio,
                                                write_tiny_checkpoint)

    model = str(tmp_path / "m.bin")
    write_tiny_checkpoint(model)
    for i in range(3):
        # multi-window files: both paths then run the same long-form
        # seek algorithm (single-window chunks take the batcher fast
        # path, which skips the seek loop's partial-window re-decodes)
        write_wav(str(tmp_path / f"u{i}.wav"),
                  speech_like_audio(1.5, seed=20 + i))
        (tmp_path / f"u{i}.txt").write_text(f"utterance {i}")

    def run(extra):
        r = subprocess.run(
            [sys.executable, "eval.py", str(tmp_path), "--model", model,
             "--dtype", "float32", "--json",
             "--temperature-increment", "0", *extra],
            capture_output=True, text=True, cwd="/root/repo",
            env={"PATH": "/usr/bin:/bin:/usr/local/bin",
                 "JAX_PLATFORMS": "cpu",
                 "NOBS_WHISPER_TPU_HOME": str(tmp_path),
                 "PYTHONPATH": "/root/repo"})
        assert r.returncode == 0, r.stderr
        return json.loads(r.stdout.strip().splitlines()[-1])

    seq = run([])
    bat = run(["--batch", "3"])
    assert bat["utterances"] == seq["utterances"] == 3
    assert bat["wer"] == seq["wer"]
    assert bat["exact_match_rate"] == seq["exact_match_rate"]


def test_typographic_apostrophes_normalize():
    """U+2019 contractions must score zero errors vs ASCII references."""
    from nobs_whisper_tpu.utils.wer import word_error_rate
    r = word_error_rate("don't stop", "don’t stop")
    assert r.wer == 0.0
