"""Audio layer: VAD, streaming buffer, IO, resampling.

Ports the reference's synthesized-audio test scenarios (SURVEY.md §4:
sines at 0.002 noise / 0.3 speech / 0.0 silence amplitudes composed into
clips) against the same constants.
"""

import numpy as np
import pytest

from nobs_whisper_tpu.audio.buffer import AudioBuffer
from nobs_whisper_tpu.audio.io import (read_wav, stereo_to_mono,
                                       stream_frames, write_wav)
from nobs_whisper_tpu.audio.resample import resample, resample_jax
from nobs_whisper_tpu.audio.vad import (
    calculate_rms, estimate_noise_floor, find_silence_boundaries,
    split_at_silences, windowed_rms)

SR = 16000


def sine(duration_s, freq=440.0, amp=0.3, sr=SR):
    t = np.arange(int(duration_s * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def silence(duration_s, sr=SR):
    return np.zeros(int(duration_s * sr), np.float32)


def noise(duration_s, amp=0.002, sr=SR, seed=0):
    rng = np.random.RandomState(seed)
    return (amp * rng.randn(int(duration_s * sr))).astype(np.float32)


# ---------------------------------------------------------------------------
# resampling (reference: 48k->16k ratio within tolerance, audio.rs:570-583)
# ---------------------------------------------------------------------------

def test_resample_ratio_48k_to_16k():
    audio = sine(1.0, sr=48000)
    out = resample(audio, 48000, 16000)
    assert abs(len(out) - 16000) <= 1600  # +-10%


def test_resample_identity():
    audio = sine(0.5)
    out = resample(audio, SR, SR)
    np.testing.assert_array_equal(out, audio)


def test_resample_preserves_tone():
    """A 440 Hz tone must stay 440 Hz after 48k->16k."""
    audio = sine(1.0, freq=440, sr=48000)
    out = resample(audio, 48000, 16000)
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * 16000 / len(out)
    assert abs(peak_hz - 440) < 5


def test_resample_jax_close_to_scipy():
    audio = sine(0.5, freq=300, sr=48000) + noise(0.5, 0.01, sr=48000)
    a = resample(audio, 48000, 16000)
    b = np.asarray(resample_jax(audio, 48000, 16000))
    assert abs(len(a) - len(b)) <= 2
    n = min(len(a), len(b))
    # both are anti-aliased sinc interpolators; agree to ~1% of amplitude
    # away from the edges
    assert np.abs(a[100:n - 100] - b[100:n - 100]).max() < 0.02


# ---------------------------------------------------------------------------
# RMS / noise floor (audio.rs:586-617)
# ---------------------------------------------------------------------------

def test_rms():
    assert calculate_rms(np.zeros(100, np.float32)) == 0.0
    assert calculate_rms(np.ones(100, np.float32)) == pytest.approx(1.0)
    assert calculate_rms(sine(1.0, amp=0.5)) == pytest.approx(
        0.5 / np.sqrt(2), rel=1e-3)
    assert calculate_rms(np.zeros(0, np.float32)) == 0.0


def test_windowed_rms_shape():
    rms = windowed_rms(sine(1.0), SR)
    assert rms.shape == (50,)  # 1 s of 20 ms windows


def test_noise_floor_estimation():
    quiet = noise(1.0, amp=0.002)
    floor = estimate_noise_floor(quiet, SR)
    assert 0.003 <= floor <= 0.01  # >= 0.3 * SILENCE_THRESHOLD
    loud = sine(1.0, amp=0.3)
    assert estimate_noise_floor(loud, SR) > 0.1


# ---------------------------------------------------------------------------
# silence boundaries (audio.rs:620-804)
# ---------------------------------------------------------------------------

def _lead_in(duration_s=0.5):
    """Quiet background for noise-floor estimation — the reference's test
    scenarios always start with this (audio.rs:626-629)."""
    return noise(duration_s, amp=0.002, seed=42)


def test_no_silence_single_chunk():
    audio = np.concatenate([_lead_in(), sine(10.0)])
    bounds = find_silence_boundaries(audio, SR)
    chunks = split_at_silences(audio, bounds, SR)
    assert len(chunks) == 1
    assert len(chunks[0]) == len(audio)


def test_two_silence_gaps_two_boundaries():
    audio = np.concatenate([
        _lead_in(), sine(2.0), silence(1.0), sine(2.0), silence(1.0),
        sine(2.0)])
    bounds = find_silence_boundaries(audio, SR)
    assert len(bounds) == 2


def test_chunking_with_silence():
    audio = np.concatenate([_lead_in(), sine(2.0), silence(1.0), sine(2.0)])
    bounds = find_silence_boundaries(audio, SR)
    assert len(bounds) == 1
    # split point ~ center of the silence gap (which starts at 2.5 s)
    assert 2.8 * SR < bounds[0] < 3.2 * SR
    chunks = split_at_silences(audio, bounds, SR)
    assert len(chunks) == 2
    # second chunk carries 200 ms overlap
    assert len(chunks[1]) == len(audio) - bounds[0] + SR * 200 // 1000


def test_split_at_explicit_boundaries_overlap():
    """split lengths with overlap (reference audio.rs:663-683)."""
    audio = sine(6.0, amp=0.1)
    bounds = [2 * SR, 4 * SR]
    chunks = split_at_silences(audio, bounds, SR)
    overlap = SR * 200 // 1000
    assert [len(c) for c in chunks] == [2 * SR, 2 * SR + overlap,
                                        2 * SR + overlap]


def test_short_silence_not_split():
    audio = np.concatenate([_lead_in(), sine(2.0), silence(0.5), sine(2.0)])
    assert find_silence_boundaries(audio, SR) == []


def test_adaptive_threshold_with_noisy_background():
    """Background noise instead of true silence: gaps are still found via
    the adaptive (3x noise floor) threshold."""
    bg = 0.002
    audio = np.concatenate([
        noise(0.5, bg, seed=1),
        sine(2.0) + noise(2.0, bg, seed=2),
        noise(1.0, bg, seed=3),           # "silence" = just background
        sine(2.0) + noise(2.0, bg, seed=4),
    ])
    bounds = find_silence_boundaries(audio, SR)
    assert len(bounds) >= 1


def test_min_chunk_duration_respected():
    """Boundaries closer than 1 s to the previous split are dropped."""
    audio = np.concatenate([
        sine(0.3), silence(0.8), sine(0.1), silence(0.8), sine(2.0)])
    bounds = find_silence_boundaries(audio, SR)
    for a, b in zip([0] + bounds, bounds):
        assert b - a >= SR  # MIN_CHUNK_DURATION


# ---------------------------------------------------------------------------
# streaming buffer (audio.rs:30-241; overlap test audio.rs:807-831)
# ---------------------------------------------------------------------------

def test_buffer_push_take():
    buf = AudioBuffer(SR)
    buf.push_samples(sine(1.0))
    assert len(buf) == SR
    out = buf.take()
    assert len(out) == SR
    assert len(buf) == 0


def test_buffer_silence_boundary_chunk():
    buf = AudioBuffer(SR)
    buf.push_samples(sine(2.0))            # speech
    assert buf.take_chunk_at_silence() is None  # no silence yet
    buf.push_samples(silence(1.0))          # 1 s silence > 700 ms
    chunk = buf.take_chunk_at_silence()
    assert chunk is not None
    # split at middle of silence: ~2.5 s
    assert 2.3 * SR < len(chunk) < 2.7 * SR
    # remaining buffer keeps the tail
    assert 0 < len(buf) < SR


def test_buffer_chunk_overlap_carried():
    buf = AudioBuffer(SR)
    buf.push_samples(sine(2.0))
    buf.push_samples(silence(1.0))
    first = buf.take_chunk_at_silence()
    assert first is not None
    first_len = len(first)
    buf.push_samples(sine(2.0))
    buf.push_samples(silence(1.0))
    second = buf.take_chunk_at_silence()
    assert second is not None
    # second chunk includes 200 ms prepended overlap
    overlap = SR * 200 // 1000
    # tail of first chunk == head of second chunk
    np.testing.assert_array_equal(first[-overlap:], second[:overlap])


def test_buffer_forced_split_after_25s():
    buf = AudioBuffer(SR)
    # continuous speech with one quiet dip near the end
    loud = sine(24.0)
    dip = sine(0.5, amp=0.01)
    more = sine(1.5)
    buf.push_samples(np.concatenate([loud, dip, more]))
    assert len(buf) > 25 * SR
    chunk = buf.take_forced_chunk()
    assert chunk is not None
    # split lands in the quiet dip (24.0..24.5 s region)
    assert 23.9 * SR < len(chunk) < 24.6 * SR
    assert len(buf) > 0


def test_buffer_too_short_returns_none():
    buf = AudioBuffer(SR)
    buf.push_samples(sine(0.2))
    buf.push_samples(silence(1.0))
    assert buf.take_chunk_at_silence() is None  # <0.5 s of speech
    assert buf.take_forced_chunk() is None


def test_buffer_noise_floor_adapts():
    buf = AudioBuffer(SR)
    floor0 = buf.noise_floor
    buf.push_samples(noise(2.0, amp=0.001))
    assert buf.noise_floor < floor0


# ---------------------------------------------------------------------------
# io
# ---------------------------------------------------------------------------

def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "a.wav")
    audio = sine(0.5, amp=0.4)
    write_wav(path, audio, SR)
    back, rate = read_wav(path)
    assert rate == SR
    assert len(back) == len(audio)
    assert np.abs(back - audio).max() < 1e-3  # 16-bit quantization


def test_stereo_to_mono():
    stereo = np.array([1.0, 0.0, 0.5, 0.5, 0.0, 1.0], np.float32)
    mono = stereo_to_mono(stereo, 2)
    np.testing.assert_allclose(mono, [0.5, 0.5, 0.5])


def test_stream_frames():
    audio = sine(0.1)
    frames = list(stream_frames(audio, frame_ms=10, sample_rate=SR))
    assert len(frames) == 10
    assert sum(len(f) for f in frames) == len(audio)


def test_sub_window_pushes_are_analyzed():
    """Callback-sized pushes smaller than the 20 ms RMS window must still
    drive speech detection and noise-floor adaptation — the reference's
    chunks(window) includes the final partial chunk (audio.rs:66);
    dropping it left VAD permanently dead for 10 ms packet streams."""
    import numpy as np
    from nobs_whisper_tpu.audio.buffer import AudioBuffer

    rate = 48_000
    buf = AudioBuffer(rate)
    w = rate * 20 // 1000                     # 960-sample window
    packet = w // 2                           # 10 ms pushes
    rng = np.random.RandomState(0)
    # 1 s of speech-level audio in 10 ms packets
    for _ in range(100):
        buf.push_samples((rng.randn(packet) * 0.3).astype(np.float32))
    assert buf.last_speech_pos > 0
    # then silence long enough to form a boundary (>= 700 ms)
    for _ in range(100):
        buf.push_samples(np.zeros(packet, np.float32))
    assert buf.has_silence_boundary()
    chunk = buf.take_chunk_at_silence()
    assert chunk is not None and chunk.size > 0


def test_read_float32_wav():
    """IEEE-float WAVs (ffmpeg pcm_f32le) load via the RIFF fallback —
    the stdlib wave module rejects format tag 3."""
    import struct
    import numpy as np
    from nobs_whisper_tpu.audio.io import read_wav

    x = (np.sin(np.arange(1600) / 10.0) * 0.5).astype("<f4")
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    audio, rate = read_wav(blob)
    assert rate == 16000
    np.testing.assert_allclose(audio, x.astype(np.float32), atol=1e-7)


def test_log_mel_longform_empty_audio():
    import numpy as np
    from nobs_whisper_tpu.audio.mel import log_mel_longform
    out = log_mel_longform(np.zeros(100, np.float32), padding=0)
    assert out.shape == (80, 0)


def test_mel_empty_and_subwindow_audio():
    """Sub-STFT-window audio returns the well-defined empty/all-zero
    spectrogram instead of crashing in reflect padding."""
    import jax.numpy as jnp
    from nobs_whisper_tpu.audio.mel import log_mel_spectrogram
    out = log_mel_spectrogram(jnp.zeros(0))
    assert out.shape == (80, 0)
    out = log_mel_spectrogram(jnp.zeros(180))   # > hop, < reflect pad
    assert out.shape == (80, 1) and float(abs(out).max()) == 0.0
    out = log_mel_spectrogram(jnp.zeros((2, 100)), n_mels=128)
    assert out.shape == (2, 128, 0)


def test_read_wav_extensible_int_pcm():
    """WAVE_FORMAT_EXTENSIBLE with an integer-PCM SubFormat GUID must be
    decoded as int32 PCM — not reinterpreted as f32 garbage."""
    import struct
    from nobs_whisper_tpu.audio.io import read_wav

    rate, vals = 16000, np.array([0.5, -0.25, 0.125, -1.0], np.float32)
    pcm = (vals * 2147483647).astype("<i4").tobytes()
    # KSDATAFORMAT_SUBTYPE_PCM: 00000001-0000-0010-8000-00aa00389b71
    guid = struct.pack("<H", 1) + b"\x00\x00\x00\x00\x10\x00" \
        + bytes([0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])
    ext = struct.pack("<HHI", 22, 32, 0x4) + guid   # cbSize, validbits,
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, rate,   # chmask, then GUID
                      rate * 4, 4, 32) + ext
    data = pcm
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    audio, r = read_wav(blob)
    assert r == rate
    np.testing.assert_allclose(audio, vals, atol=2e-9)
