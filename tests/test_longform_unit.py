"""Unit tests of the long-form seek bookkeeping (_split_segments) against
hand-computed expectations — the timestamp-driven advance logic that
decides how the 30 s window slides."""

import pytest

from nobs_whisper_tpu.pipeline.longform import (_split_segments,
                                                _temperature_ladder)
from nobs_whisper_tpu.decode.rules import DecodeOptions

TB = 1000   # timestamp_begin for these tests
EOT = 900


def _split(tokens, seek=0, segment_size=3000, offset=0.0):
    return _split_segments(tokens, TB, segment_size, time_offset=offset)


def test_single_segment_no_consecutive():
    # <|0.00|> text text <|2.00|>  (single trailing ts = ends mid-speech?
    # no: [t0, x, x, t100] has no CONSECUTIVE pair and doesn't end
    # [text, ts]... it does: ts[-1]=True, ts[-2]=False -> single ending)
    tokens = [TB, 5, 6, TB + 100]
    segs, advance = _split(tokens)
    # single_timestamp_ending with no consecutive pairs -> one segment,
    # advance by the whole window
    assert len(segs) == 1
    assert segs[0]["start"] == 0.0
    assert segs[0]["end"] == pytest.approx(2.0)
    assert advance == 3000


def test_consecutive_pairs_split_segments():
    # <|0.00|> a b <|1.00|><|1.00|> c <|2.00|><|2.00|>
    tokens = [TB, 1, 2, TB + 50, TB + 50, 3, TB + 100, TB + 100]
    segs, advance = _split(tokens, offset=10.0)
    assert len(segs) == 2
    assert segs[0]["start"] == pytest.approx(10.0)
    assert segs[0]["end"] == pytest.approx(11.0)
    assert segs[1]["start"] == pytest.approx(11.0)
    assert segs[1]["end"] == pytest.approx(12.0)
    # advance to the last consecutive timestamp: 2.00s = 100 ts steps
    # = 200 mel frames
    assert advance == 200


def test_pair_then_trailing_single_ts():
    # <|0.00|> a <|1.00|><|1.00|> b <|1.50|>  (ends mid-pair)
    tokens = [TB, 1, TB + 50, TB + 50, 2, TB + 75]
    segs, advance = _split(tokens)
    assert len(segs) == 2
    # trailing single ts closes the final slice and the window advances
    # fully (openai's single_timestamp_ending branch)
    assert advance == 3000
    assert segs[1]["end"] == pytest.approx(1.5)


def test_no_timestamps_at_all():
    tokens = [4, 5, 6]
    segs, advance = _split(tokens, segment_size=1500)
    assert len(segs) == 1
    # duration falls back to the window size: 1500 frames = 15s
    assert segs[0]["end"] == pytest.approx(15.0)
    assert advance == 1500


def test_short_final_window():
    tokens = [TB, 7, TB + 10, TB + 10, 8, TB + 20]
    segs, advance = _split(tokens, segment_size=100)
    assert advance == 100  # trailing single ts -> whole (short) window


def test_temperature_ladder():
    opts = DecodeOptions()
    assert _temperature_ladder(opts) == [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]
    opts = DecodeOptions(temperature=0.4, temperature_increment=0.3,
                         max_temperature=1.0)
    assert _temperature_ladder(opts) == [0.4, 0.7, 1.0]
    opts = DecodeOptions(temperature_increment=0.0)
    assert _temperature_ladder(opts) == [0.0]
