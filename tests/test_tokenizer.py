"""Tokenizer: special-token table, BPE round-trips, timestamps."""

import numpy as np
import pytest

from nobs_whisper_tpu.core.config import get_config
from nobs_whisper_tpu.core.tokenizer import LANGUAGES, WhisperTokenizer
from nobs_whisper_tpu.utils.testing import byte_level_vocab, tiny_test_config


def test_language_order_matches_transformers():
    # transformers ships the canonical whisper language registry; ordering
    # defines token ids so it must match exactly.
    from transformers.models.whisper.tokenization_whisper import LANGUAGES as HF
    hf_codes = list(HF.keys())
    assert list(LANGUAGES[: len(hf_codes)]) == hf_codes


@pytest.mark.parametrize("name,expect", [
    # (model, (eot, sot, translate, transcribe, sot_prev, no_speech,
    #          no_timestamps, timestamp_begin))
    ("tiny", (50257, 50258, 50358, 50359, 50361, 50362, 50363, 50364)),
    ("tiny.en", (50256, 50257, 50357, 50358, 50360, 50361, 50362, 50363)),
    ("large-v3", (50257, 50258, 50359, 50360, 50362, 50363, 50364, 50365)),
    ("large-v3-turbo",
     (50257, 50258, 50359, 50360, 50362, 50363, 50364, 50365)),
])
def test_special_token_ids(name, expect):
    cfg = get_config(name)
    got = (cfg.eot, cfg.sot, cfg.translate, cfg.transcribe, cfg.sot_prev,
           cfg.no_speech, cfg.no_timestamps, cfg.timestamp_begin)
    assert got == expect
    # timestamps fill the vocab tail exactly: <|0.00|>..<|30.00|> = 1501
    assert cfg.n_vocab - cfg.timestamp_begin == 1501


def _tok():
    cfg = tiny_test_config()
    return WhisperTokenizer(byte_level_vocab(cfg), cfg), cfg


def test_encode_decode_roundtrip():
    tok, _ = _tok()
    for text in ["hello world", "the theory of things",
                 "unicode: café — ok", "  spaces  and\ttabs"]:
        ids = tok.encode(text)
        assert all(0 <= i < tok.eot for i in ids)
        assert tok.decode(ids) == text


def test_bpe_prefers_merges():
    tok, _ = _tok()
    # " the" exists as a single token in the test vocab; rank-based BPE
    # must produce it rather than byte-by-byte output.
    ids = tok.encode(" the")
    assert len(ids) == 1


def test_decode_skips_specials():
    tok, cfg = _tok()
    ids = [cfg.sot, *tok.encode("hi"), cfg.eot]
    assert tok.decode(ids) == "hi"


def test_timestamp_tokens():
    tok, cfg = _tok()
    t0 = cfg.timestamp_begin
    assert tok.timestamp_to_seconds(t0) == 0.0
    assert tok.timestamp_to_seconds(t0 + 50) == pytest.approx(1.0)
    assert tok.seconds_to_timestamp(1.0) == t0 + 50
    rendered = tok.decode_with_timestamps([t0, *tok.encode("hi"), t0 + 5])
    assert rendered == "<|0.00|>hi<|0.10|>"


def test_sot_sequence():
    tok, cfg = _tok()
    seq = tok.sot_sequence(language=LANGUAGES[1], task="transcribe")
    assert seq == [cfg.sot, cfg.lang_base + 1, cfg.transcribe]
    seq = tok.sot_sequence(language="en", task="translate", timestamps=False)
    assert seq == [cfg.sot, cfg.lang_base, cfg.translate, cfg.no_timestamps]


def test_language_token_mapping():
    tok, cfg = _tok()
    assert tok.language_token("en") == cfg.lang_base
    assert tok.token_language(cfg.lang_base) == "en"
    with pytest.raises(KeyError):
        tok.language_token("xx")


def test_non_speech_tokens_are_valid_ids():
    tok, _ = _tok()
    nst = tok.non_speech_tokens
    assert len(nst) > 0
    assert all(0 <= t < tok.eot for t in nst)
