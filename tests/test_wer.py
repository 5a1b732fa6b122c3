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
    pairs = find_pairs(tmp_path)
    assert len(pairs) == 2
    texts = {p.stem: t for p, t in pairs}
    assert texts["u1"] == "hello world"
    assert texts["sp-ch-u2"] == "SECOND UTTERANCE"


def test_typographic_apostrophes_normalize():
    """U+2019 contractions must score zero errors vs ASCII references."""
    from nobs_whisper_tpu.utils.wer import word_error_rate
    r = word_error_rate("don't stop", "don’t stop")
    assert r.wer == 0.0
