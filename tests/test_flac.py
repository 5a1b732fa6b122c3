"""FLAC codec tests: encoder round-trips + hand-crafted frames covering
every decoder path (LPC, stereo decorrelation, escape/multi-partition
residuals, odd block sizes, non-table sample rates, CRC verification).

The ingestion contract mirrors read_wav (mono f32 + rate; the reference
forces mono capture, src-tauri/src/audio.rs:263-296). LibriSpeech — the
real-weight eval target (eval.py) — ships as FLAC, so decode correctness
is pinned hard here.
"""

import io
import struct

import numpy as np
import pytest

from nobs_whisper_tpu.audio.flac import (
    FlacInfo, _BitReader, _BitWriter, _crc8, _crc16, _lpc_restore,
    _write_coded_number, _read_coded_number, read_flac, read_flac_raw,
    write_flac)


def _sine_speechish(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 513 * t)
         + 0.01 * rng.standard_normal(n))
    return np.clip(x, -1, 1).astype(np.float32)


# --------------------------------------------------------------------------
# encoder round-trips (drive the CONSTANT / FIXED / VERBATIM decode paths)

def test_roundtrip_mono_exact_int16():
    x = _sine_speechish()
    buf = io.BytesIO()
    write_flac(buf, x, 16000)
    pcm, info = read_flac_raw(buf.getvalue(), verify=True)
    expect = np.clip(np.round(x.astype(np.float64) * 32768.0),
                     -32768, 32767).astype(np.int64)
    assert info.sample_rate == 16000
    assert info.channels == 1 and info.bits == 16
    assert info.total_samples == len(x)
    np.testing.assert_array_equal(pcm[:, 0], expect)


def test_roundtrip_compresses():
    x = _sine_speechish()
    buf = io.BytesIO()
    write_flac(buf, x, 16000)
    assert len(buf.getvalue()) < 2 * len(x) * 0.9   # beats raw 16-bit PCM


def test_roundtrip_float_contract_matches_wav_reader():
    x = _sine_speechish(7001)                        # odd tail block
    buf = io.BytesIO()
    write_flac(buf, x, 16000)
    y, rate = read_flac(buf.getvalue(), verify=True)
    assert rate == 16000
    assert y.dtype == np.float32 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768.0)


def test_roundtrip_stereo_independent_to_mono():
    n = 9000
    left = _sine_speechish(n, seed=1)
    right = _sine_speechish(n, seed=2)
    buf = io.BytesIO()
    write_flac(buf, np.stack([left, right], axis=1), 16000)
    pcm, info = read_flac_raw(buf.getvalue(), verify=True)
    assert info.channels == 2
    y, _ = read_flac(buf.getvalue())
    np.testing.assert_allclose(
        y, pcm.astype(np.float32).mean(axis=1) / 32768.0, atol=1e-6)


def test_roundtrip_silence_constant_subframes():
    buf = io.BytesIO()
    write_flac(buf, np.zeros(5000, np.float32), 16000)
    blob = buf.getvalue()
    assert len(blob) < 200                           # constant blocks: tiny
    pcm, _ = read_flac_raw(blob, verify=True)
    assert pcm.shape == (5000, 1)
    assert not pcm.any()


def test_roundtrip_white_noise_verbatim():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, 6000, dtype=np.int64)
    buf = io.BytesIO()
    write_flac(buf, pcm[:, None], 16000)
    out, _ = read_flac_raw(buf.getvalue(), verify=True)
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_roundtrip_nontable_sample_rate():
    x = _sine_speechish(3000)
    buf = io.BytesIO()
    write_flac(buf, x, 12345)
    y, rate = read_flac(buf.getvalue(), verify=True)
    assert rate == 12345 and len(y) == 3000


def test_crc_detects_corruption():
    x = _sine_speechish(4000)
    buf = io.BytesIO()
    write_flac(buf, x, 16000)
    blob = bytearray(buf.getvalue())
    blob[-40] ^= 0x41                                # flip a frame-body byte
    with pytest.raises(ValueError):
        read_flac_raw(bytes(blob), verify=True)


def test_load_audio_dispatch(tmp_path):
    from nobs_whisper_tpu.audio.io import load_audio
    x = _sine_speechish(5000)
    p = tmp_path / "a.flac"
    write_flac(str(p), x, 16000)
    y, rate = load_audio(str(p))
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32768.0)


def test_roundtrip_fuzz_levels_and_lengths():
    """Varied amplitudes sweep the rice-k range; varied lengths sweep the
    tail-block sizes. Exact 16-bit round trip with CRC verification."""
    for seed in range(6):
        g = np.random.default_rng(seed)
        amp = 10 ** g.uniform(-3, 0)
        n = int(g.integers(100, 30000))
        sig = np.clip(amp * g.standard_normal(n), -1, 1).astype(np.float32)
        buf = io.BytesIO()
        write_flac(buf, sig, 16000)
        out, _ = read_flac(buf.getvalue(), verify=True)
        exp = np.clip(np.round(sig.astype(np.float64) * 32768.0),
                      -32768, 32767).astype(np.float32) / 32768.0
        np.testing.assert_allclose(out, exp, atol=1e-7, err_msg=str(seed))


def test_coded_number_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 5, (1 << 35) + 17):
        blob = _write_coded_number(v)
        r = _BitReader(blob)
        assert _read_coded_number(r) == v, hex(v)


# --------------------------------------------------------------------------
# hand-crafted frames: LPC, stereo modes, escapes, partitions, bit depths

def _file_with_frame(build_subframes, n, n_ch, bps, ch_code,
                     rate=16000, total=None):
    """Single-frame FLAC file; ``build_subframes(w)`` writes the subframes."""
    total = n if total is None else total
    si = bytearray()
    si += struct.pack(">HH", n, n)
    si += b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += bytes(16)
    head = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)                                    # reserved, fixed-block
    w.write(7, 4)                                    # 16-bit block size tail
    w.write(5, 4)                                    # 16 kHz
    w.write(ch_code, 4)
    w.write({8: 1, 16: 4, 24: 6}[bps], 3)
    w.write(0, 1)
    for b in _write_coded_number(0):
        w.write(b, 8)
    w.write(n - 1, 16)
    hdr = bytes(w.out)
    assert w.nbits == 0
    w.write(_crc8(hdr), 8)
    build_subframes(w)
    w.align()
    body = bytes(w.out)
    w.write(_crc16(body), 16)
    return head + w.bytes()


def _write_verbatim(w, x, bps):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in x:
        w.write(int(v), bps)


def test_lpc_subframe_decode():
    order, prec, shift = 2, 6, 1
    coefs = [3, -1]
    warm = [100, 105]
    res = [4, -3, 7, 0, -2, 5, 1, -6, 2, 3]
    n = order + len(res)

    def build(w):
        w.write(0, 1)
        w.write(32 | (order - 1), 6)                 # LPC, order 2
        w.write(0, 1)
        for v in warm:
            w.write(v, 16)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c, prec)
        w.write(0, 2)                                # RICE
        w.write(0, 4)                                # partition order 0
        u = [(r << 1) ^ (r >> 63) for r in np.asarray(res, np.int64)]
        k = 3
        w.write(k, 4)
        for v in u:
            w.write_unary(int(v) >> k)
            w.write(int(v), k)

    blob = _file_with_frame(build, n, 1, 16, ch_code=0)
    pcm, _ = read_flac_raw(blob, verify=True)
    expect = _lpc_restore(coefs, shift, np.asarray(warm, np.int64),
                          np.asarray(res, np.int64))
    np.testing.assert_array_equal(pcm[:, 0], expect)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    rng = np.random.default_rng(7)
    left = rng.integers(-2000, 2000, 64, dtype=np.int64)
    right = rng.integers(-2000, 2000, 64, dtype=np.int64)
    side = left - right
    if mode == "left_side":
        ch_code, chans = 8, [(left, 16), (side, 17)]
    elif mode == "right_side":
        ch_code, chans = 9, [(side, 17), (right, 16)]
    else:
        mid = (left + right) >> 1
        ch_code, chans = 10, [(mid, 16), (side, 17)]

    def build(w):
        for x, bps in chans:
            _write_verbatim(w, x, bps)

    blob = _file_with_frame(build, 64, 2, 16, ch_code=ch_code)
    pcm, _ = read_flac_raw(blob, verify=True)
    np.testing.assert_array_equal(pcm[:, 0], left)
    np.testing.assert_array_equal(pcm[:, 1], right)


def test_escape_partition_and_multi_partition_residual():
    n = 64                                           # 4 partitions of 16
    rng = np.random.default_rng(9)
    res = rng.integers(-40, 40, n, dtype=np.int64)

    def build(w):
        w.write(0, 1)
        w.write(8 | 0, 6)                            # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)                                # RICE
        w.write(2, 4)                                # partition order 2
        for p in range(4):
            part = res[p * 16:(p + 1) * 16]
            if p == 1:                               # escape: raw 7-bit
                w.write(15, 4)
                w.write(7, 5)
                for v in part:
                    w.write(int(v), 7)
            elif p == 2:                             # escape: 0-bit (zeros)
                w.write(15, 4)
                w.write(0, 5)
            else:
                u = [(int(v) << 1) ^ (int(v) >> 63) for v in part]
                k = 4
                w.write(k, 4)
                for v in u:
                    w.write_unary(v >> k)
                    w.write(v, k)

    expect = res.copy()
    expect[32:48] = 0
    blob = _file_with_frame(build, n, 1, 16, ch_code=0)
    pcm, _ = read_flac_raw(blob, verify=True)
    np.testing.assert_array_equal(pcm[:, 0], expect)


def test_rice2_residual_method():
    n = 32
    res = np.arange(-16, 16, dtype=np.int64)

    def build(w):
        w.write(0, 1)
        w.write(8 | 0, 6)
        w.write(0, 1)
        w.write(1, 2)                                # RICE2: 5-bit params
        w.write(0, 4)
        u = [(int(v) << 1) ^ (int(v) >> 63) for v in res]
        k = 2
        w.write(k, 5)
        for v in u:
            w.write_unary(v >> k)
            w.write(v, k)

    blob = _file_with_frame(build, n, 1, 16, ch_code=0)
    pcm, _ = read_flac_raw(blob, verify=True)
    np.testing.assert_array_equal(pcm[:, 0], res)


def test_wasted_bits_shift():
    x = np.asarray([64, -128, 256, 0, 192, -64], np.int64)  # all /64

    def build(w):
        w.write(0, 1)
        w.write(1, 6)                                # VERBATIM
        w.write(1, 1)                                # wasted-bits flag
        w.write(0, 5)                                # unary 5 -> wasted = 6
        w.write(1, 1)
        for v in x >> 6:
            w.write(int(v), 10)                      # 16 - 6 effective bits

    blob = _file_with_frame(build, len(x), 1, 16, ch_code=0)
    pcm, _ = read_flac_raw(blob, verify=True)
    np.testing.assert_array_equal(pcm[:, 0], x)


@pytest.mark.parametrize("bps", [8, 24])
def test_other_bit_depths(bps):
    rng = np.random.default_rng(11)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, 48, dtype=np.int64)

    def build(w):
        _write_verbatim(w, x, bps)

    blob = _file_with_frame(build, 48, 1, bps, ch_code=0)
    pcm, info = read_flac_raw(blob, verify=True)
    assert info.bits == bps
    np.testing.assert_array_equal(pcm[:, 0], x)
    y, _ = read_flac(blob)
    np.testing.assert_allclose(y, x.astype(np.float32) / lim, atol=1e-7)


def test_fixed_orders_exact():
    """Every fixed-predictor order decodes exactly (iterated-cumsum path)."""
    from nobs_whisper_tpu.audio.flac import _fixed_restore
    rng = np.random.default_rng(13)
    for order in range(5):
        warm = rng.integers(-500, 500, order, dtype=np.int64)
        res = rng.integers(-50, 50, 200, dtype=np.int64)
        got = _fixed_restore(order, warm, res)
        # reference recurrence, straight from the format definition
        coef = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}[order]
        x = list(warm)
        for r in res:
            pred = sum(c * x[-1 - j] for j, c in enumerate(coef))
            x.append(int(r) + pred)
        np.testing.assert_array_equal(got, np.asarray(x, np.int64))


# --------------------------------------------------------------------------
# round-3 advisor hardening: MD5 verify, truncation, bad partitions, size cap

def test_md5_mismatch_detected():
    """A sample-value corruption that keeps every CRC valid is caught by
    the whole-stream PCM MD5 (STREAMINFO md5 vs decoded interleave)."""
    x = _sine_speechish(4000)
    buf = io.BytesIO()
    write_flac(buf, x)
    blob = bytearray(buf.getvalue())
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the file
    # (4 fLaC + 4 block header + 18 into the 34-byte STREAMINFO body).
    blob[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5 mismatch"):
        read_flac_raw(bytes(blob), verify=True)
    # without verify, decode still succeeds (md5 unchecked)
    pcm, _ = read_flac_raw(bytes(blob), verify=False)
    assert pcm.shape[0] == 4000


def test_md5_verified_on_roundtrip():
    """verify=True actually walks the MD5 path on encoder output
    (nonzero STREAMINFO md5) and passes."""
    x = _sine_speechish(3000)
    buf = io.BytesIO()
    write_flac(buf, x)
    _, info = read_flac_raw(buf.getvalue(), verify=True)
    assert info.md5 != b"\x00" * 16


def test_truncated_bitstream_clean_error():
    """Cutting the file mid-frame raises a ValueError, not a numpy shape
    error (advisor round-3 low finding)."""
    x = _sine_speechish(8000)
    buf = io.BytesIO()
    write_flac(buf, x)
    blob = buf.getvalue()
    for cut in (len(blob) - 7, len(blob) // 2, 60):
        with pytest.raises(ValueError):
            read_flac_raw(blob[:cut], verify=False)


def test_partition_order_vs_predictor_order_clean_error():
    """A partition whose size is smaller than the predictor order is a
    clean ValueError instead of a numpy IndexError."""
    # FIXED order-4 subframe, block 16, partition order 3 -> part size 2 < 4
    def build(w):
        w.write(0, 1)
        w.write(8 | 4, 6)                       # FIXED order 4
        w.write(0, 1)
        for _ in range(4):
            w.write(0, 16)                      # warmup
        w.write(0, 2)                           # method RICE
        w.write(3, 4)                           # partition order 3
        w.write(0, 4)                           # rice k for part 0
        # (whatever follows, the decoder must bail before indexing)
        w.write(0, 32)

    blob = _file_with_frame(build, 16, 1, 16, ch_code=0)
    with pytest.raises(ValueError, match="smaller than predictor order"):
        read_flac_raw(blob, verify=False)


def test_decode_max_bytes_guard():
    x = _sine_speechish(2000)
    buf = io.BytesIO()
    write_flac(buf, x)
    blob = buf.getvalue()
    with pytest.raises(ValueError, match="decode_max_bytes"):
        read_flac_raw(blob, decode_max_bytes=100)
    # explicit raise works
    pcm, _ = read_flac_raw(blob, decode_max_bytes=len(blob))
    assert pcm.shape[0] == 2000
