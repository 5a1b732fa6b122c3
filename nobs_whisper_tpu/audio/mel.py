"""Log-mel spectrogram front-end (pure-JAX reference path).

The reference's mel front-end lives inside whisper.cpp (invoked via
``state.full`` at src-tauri/src/whisper.rs:128): 16 kHz PCM -> STFT (400-pt
hann, hop 160) -> 80/128-bin slaney mel -> log10 -> dynamic-range clamp ->
(x+4)/4. This module reproduces those exact semantics in JAX. The DFT is
expressed as two matmuls against cos/sin bases so the whole front-end maps
onto the MXU and fuses under jit; a hand-tiled Pallas variant lives in
``ops/mel_pallas.py`` and must match this to float tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (HOP_LENGTH, N_FFT, N_FRAMES, N_SAMPLES,
                           SAMPLE_RATE)

_N_FREQS = N_FFT // 2 + 1  # 201


def hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney-scale hz->mel (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    mels = 3.0 * freq / 200.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) /
                                         min_log_hz) * logstep,
                    mels)


def mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freq = 200.0 * mels / 3.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)),
                    freq)


@functools.lru_cache(maxsize=4)
def mel_filter_bank(n_mels: int,
                    sample_rate: int = SAMPLE_RATE,
                    n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_mels, n_fft//2+1).

    Matches librosa.filters.mel defaults — the filters openai-whisper ships
    in mel_filters.npz and whisper.cpp embeds in GGML checkpoints.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_min = hz_to_mel_slaney(np.array(0.0))
    mel_max = hz_to_mel_slaney(np.array(sample_rate / 2))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_bases_np(n_fft: int = N_FFT):
    """Real-DFT as matmul: window-folded cos/sin bases, (n_fft, n_freqs).

    Cached as NumPy (never jnp: caching device arrays created under a jit
    trace would leak tracers)."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    # periodic hann window, folded into the basis so framing needs no
    # separate multiply
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def _dft_bases(n_fft: int = N_FFT):
    cos_b, sin_b = _dft_bases_np(n_fft)
    return jnp.asarray(cos_b), jnp.asarray(sin_b)


def frame_signal(audio: jnp.ndarray) -> jnp.ndarray:
    """Center-padded (reflect) strided framing: (T,) -> (n_frames, n_fft).

    n_frames = T // hop (the trailing STFT frame is dropped, matching
    torch.stft-based reference semantics). Gather-free: with hop 160 and
    width 400, frame i = rows i, i+1 and the first half of row i+2 of the
    (n+2, 160) reshape — three slices and a concat, which XLA/Mosaic lower
    to plain copies.
    """
    pad = N_FFT // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = audio.shape[0] // HOP_LENGTH
    need = (n_frames + 2) * HOP_LENGTH
    padded = jnp.pad(padded, (0, max(need - padded.shape[0], 0)))
    rows = padded[:need].reshape(n_frames + 2, HOP_LENGTH)
    return jnp.concatenate(
        [rows[:n_frames], rows[1: n_frames + 1],
         rows[2: n_frames + 2, : N_FFT - 2 * HOP_LENGTH]], axis=1)


def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """16 kHz f32 PCM -> (n_mels, T//160) log-mel, whisper semantics.

    Accepts (T,) or batched (B, T). Normalization max is per-sample over the
    full spectrogram, as in whisper.cpp / openai-whisper.
    """
    if audio.shape[-1] <= N_FFT // 2:
        # reflect-pad needs more samples than the pad width (empty or
        # sub-centering audio raises deep in jnp.pad); such inputs are
        # below one STFT window — return the well-defined all-zero
        # spectrogram with the usual T//hop frame count (the longform
        # sibling guards its zero-frame case the same way, below)
        shape = audio.shape[:-1] + (n_mels, audio.shape[-1] // HOP_LENGTH)
        return jnp.zeros(shape, jnp.float32)
    if audio.ndim == 1:
        return _log_mel_single(audio, n_mels)
    return jax.vmap(lambda a: _log_mel_single(a, n_mels))(audio)


def _log_mel_single(audio: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    frames = frame_signal(audio.astype(jnp.float32))
    cos_b, sin_b = _dft_bases()
    # (n_frames, n_freqs) real/imag parts on the MXU. HIGHEST precision:
    # on TPU the default fp32 matmul decomposes into bf16 passes, which is
    # too lossy ahead of a log10.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_b, precision=hi)
    im = jnp.dot(frames, sin_b, precision=hi)
    power = re * re + im * im
    mel_f = jnp.asarray(mel_filter_bank(n_mels))          # (n_mels, n_freqs)
    mel = jnp.dot(power, mel_f.T, precision=hi)            # (n_frames, n_mels)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return ((log_spec + 4.0) / 4.0).T                      # (n_mels, n_frames)


def log_mel_numpy_f64(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """float64 NumPy mirror of the JAX pipeline — the algorithmic oracle.

    Matches transformers' WhisperFeatureExtractor (and thus openai-whisper /
    whisper.cpp semantics) to ~1e-6; the fp32 JAX path deviates only by
    float-precision noise in near-zero spectral bins.
    """
    audio = np.asarray(audio, dtype=np.float64)
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = audio.shape[0] // HOP_LENGTH
    idx = (np.arange(n_frames)[:, None] * HOP_LENGTH +
           np.arange(N_FFT)[None, :])
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    power = np.abs(np.fft.rfft(padded[idx] * window, axis=1)) ** 2
    mel = power @ mel_filter_bank(n_mels).T.astype(np.float64)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (((log_spec + 4.0) / 4.0).T).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _log10_mel_windows(frames: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """(W, n_frames, n_fft) pre-framed windows -> un-normalized log10 mel
    (W, n_mels, n_frames). Fixed shapes; the dynamic-range clamp happens
    outside with the global max."""
    cos_b, sin_b = _dft_bases()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.einsum("wtf,fk->wtk", frames, cos_b, precision=hi)
    im = jnp.einsum("wtf,fk->wtk", frames, sin_b, precision=hi)
    power = re * re + im * im
    mel_f = jnp.asarray(mel_filter_bank(n_mels))
    mel = jnp.einsum("wtk,mk->wtm", power, mel_f, precision=hi)
    return jnp.swapaxes(jnp.log10(jnp.maximum(mel, 1e-10)), -1, -2)


def log_mel_longform(audio: np.ndarray, n_mels: int = 80,
                     padding: int = N_SAMPLES,
                     window_batch: int = 4) -> np.ndarray:
    """Long-audio log-mel with whisper's *global* dynamic-range clamp.

    Equivalent to openai-whisper's ``log_mel_spectrogram(audio, padding=
    N_SAMPLES)``: the normalization max spans the entire recording. Audio is
    framed on the host (one reflect pad at the global edges), then fixed
    30 s window batches run through one jitted kernel — no recompiles for
    arbitrary durations. Returns (n_mels, len(audio)//160 + padding//160).
    """
    audio = np.asarray(audio, dtype=np.float32)
    if padding:
        audio = np.concatenate([audio, np.zeros(padding, np.float32)])
    n_frames = audio.shape[0] // HOP_LENGTH
    if n_frames == 0:
        # audio shorter than one hop with padding=0 (a public parameter,
        # mirroring openai's log_mel_spectrogram(padding=0)): an empty
        # spectrogram, not a concatenate-of-nothing crash
        return np.zeros((n_mels, 0), np.float32)
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")

    frames_per_win = N_FRAMES  # 3000
    n_windows = -(-n_frames // frames_per_win)
    # frame index matrix per window, computed lazily per batch
    logmels = []
    for w0 in range(0, n_windows, window_batch):
        wn = min(window_batch, n_windows - w0)
        idx = (np.arange(wn * frames_per_win)[:, None] * HOP_LENGTH +
               (w0 * frames_per_win * HOP_LENGTH) +
               np.arange(N_FFT)[None, :])
        idx = np.minimum(idx, padded.shape[0] - 1)  # zero tail guard
        frames = padded[idx].reshape(wn, frames_per_win, N_FFT)
        out = np.asarray(_log10_mel_windows(jnp.asarray(frames), n_mels))
        logmels.append(out)
    log_spec = np.concatenate(logmels, axis=0)          # (W, n_mels, 3000)
    log_spec = np.concatenate(list(log_spec), axis=-1)  # (n_mels, total)
    log_spec = log_spec[:, :n_frames]
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def frame_window_np(audio: np.ndarray,
                    n_frames: int = N_FRAMES) -> np.ndarray:
    """Host-side framing of ONE window-length chunk into
    (n_frames, N_FFT) f32 — exactly ``log_mel_longform(audio,
    padding=n_frames*HOP)``'s first window (reflect left edge over the
    signal, zero right tail).

    This is the serving fast path's host half: the session frames the
    chunk (a strided memcpy), and the batcher's ONE device program does
    DFT -> mel -> clamp -> encode -> decode (see
    decode/greedy.py::frames_encode_decode_window_jit) — no separate mel
    dispatch through the device tunnel per chunk.
    """
    # keep every sample the window's LAST frame can see: frame n-1 spans
    # [(n-1)*hop, (n-1)*hop + n_fft) — up to n_fft - hop samples past the
    # hop grid (a 30 s chunk with a sub-hop residue still contributes its
    # real tail to frame 2999, exactly as log_mel_longform does)
    audio = np.asarray(audio, dtype=np.float32)[
        : (n_frames - 1) * HOP_LENGTH + N_FFT]
    pad = N_FFT // 2
    if audio.shape[0] <= pad:   # sub-12.5 ms residue: zero-extend first
        audio = np.concatenate([audio,
                                np.zeros(pad + 1 - audio.shape[0],
                                         np.float32)])
    need = (n_frames - 1) * HOP_LENGTH + N_FFT
    left = audio[1: pad + 1][::-1]
    tail = np.zeros(max(need - pad - audio.shape[0], 0), np.float32)
    padded = np.concatenate([left, audio, tail])
    frames = np.lib.stride_tricks.sliding_window_view(
        padded, N_FFT)[:: HOP_LENGTH][:n_frames]
    return np.ascontiguousarray(frames)


def log_mel_from_frames(frames: jnp.ndarray,
                        n_mels: int = 80,
                        n_frames: Optional[int] = None) -> jnp.ndarray:
    """(B, N_FRAMES, N_FFT) pre-framed windows -> (B, n_mels, N_FRAMES)
    normalized log-mel. Jit-inlinable device half of the framed fast path;
    numerically identical to ``log_mel_longform``'s first window for
    <=30 s chunks (the zero-pad frames sit at the log floor, so the
    per-window max equals the longform global max). Shares the DFT core
    with the longform path (:func:`_log10_mel_windows`) and adds only
    the per-window clamp/normalize.

    ``n_frames``: target frame count; inputs with FEWER rows are
    zero-padded on device before the DFT. Bit-identical to host-padded
    full windows (frame_window_np's right tail is exactly zero), and the
    reason callers may transfer only a bucketed real-frame prefix — this
    box's TPU client LEAKS host RSS on every transfer
    (scripts/transfer_leak_probe.py), and short session chunks were
    paying a full 4.8 MB padded-window transfer each."""
    if n_frames is not None and frames.shape[-2] < n_frames:
        pad = [(0, 0)] * frames.ndim
        pad[-2] = (0, n_frames - frames.shape[-2])
        frames = jnp.pad(frames, pad)
    log_spec = _log10_mel_windows(frames, n_mels)     # (B, n_mels, T)
    mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(jnp.float32)


log_mel_from_frames_jit = jax.jit(log_mel_from_frames,
                                  static_argnames=("n_mels", "n_frames"))


def n_real_frames(n_samples: int, n_frames: int = N_FRAMES) -> int:
    """Number of leading :func:`frame_window_np` rows that can be
    nonzero for an ``n_samples`` chunk; every later row is exactly zero
    (the right tail is zero padding), so only this prefix needs to
    cross host->device — the jitted programs zero-pad back on device
    (``log_mel_from_frames(n_frames=...)``), bit-identically. Transfer
    reduction matters twice on this box: smaller per-chunk dispatches,
    and the TPU client's per-transfer host-RSS leak
    (scripts/transfer_leak_probe.py) scales with transferred bytes."""
    pad = N_FFT // 2
    n = min(max(n_samples, pad + 1), (n_frames - 1) * HOP_LENGTH + N_FFT)
    return int(min(n_frames, (pad + n - 1) // HOP_LENGTH + 2))


def pad_or_trim(audio: jnp.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """Pad with zeros / trim to exactly ``length`` samples (last axis)."""
    t = audio.shape[-1]
    if t >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - t)]
    return jnp.pad(audio, pad)
