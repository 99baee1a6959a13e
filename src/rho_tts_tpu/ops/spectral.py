"""Spectral primitives: STFT / ISTFT / mel filterbanks, in JAX.

These are the shared building blocks for the phase-vocoder pitch shifter,
the Whisper log-mel frontend, and the speaker-encoder / classifier feature
extractors. Framing is expressed as a gather so XLA lowers it to efficient
strided loads; the FFT runs on device.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> jnp.ndarray:
    """Hann window matching ``torch.hann_window`` (periodic by default)."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1)))
    return jnp.asarray(w[:win_length], dtype=jnp.float32)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice a 1-D signal into overlapping frames, shape (T, frame_length)."""
    n = x.shape[-1]
    num_frames = max(1 + (n - frame_length) // hop, 0)
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Short-time Fourier transform matching ``torch.stft`` semantics.

    Returns a complex array of shape (n_fft//2 + 1, num_frames).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    if center:
        x = jnp.pad(x, (n_fft // 2, n_fft // 2), mode=pad_mode)

    frames = frame_signal(x, n_fft, hop_length) * window[None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return spec.T  # (freq, time)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add, matching ``torch.istft``.

    ``spec`` has shape (freq, time); output is a 1-D waveform. Assumes the
    forward transform used ``center=True``.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1)  # (T, n_fft)
    frames = frames * window[None, :]

    num_frames = frames.shape[0]
    expected_len = n_fft + hop_length * (num_frames - 1)

    idx = (jnp.arange(num_frames) * hop_length)[:, None] + jnp.arange(n_fft)[None, :]
    wav = jnp.zeros(expected_len, dtype=frames.dtype).at[idx.reshape(-1)].add(
        frames.reshape(-1)
    )
    norm = jnp.zeros(expected_len, dtype=frames.dtype).at[idx.reshape(-1)].add(
        jnp.broadcast_to((window * window)[None, :], frames.shape).reshape(-1)
    )
    wav = wav / jnp.maximum(norm, 1e-11)

    # Undo the center padding
    start = n_fft // 2
    if length is not None:
        return wav[start : start + length]
    return wav[start : expected_len - start]


def _hz_to_mel(f: np.ndarray, htk: bool) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray, htk: bool) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm_slaney: bool = True,
) -> jnp.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft//2 + 1).

    Matches librosa's ``mel`` (slaney scale + slaney area normalization by
    default; set ``htk=True`` for the HTK scale used by some encoders).
    """
    fmax = fmax if fmax is not None else sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    mel_min = _hz_to_mel(np.array(fmin), htk)
    mel_max = _hz_to_mel(np.array(fmax), htk)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm_slaney:
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]

    return jnp.asarray(weights, dtype=jnp.float32)


def dct_matrix(n_mfcc: int, n_mels: int, norm_ortho: bool = True) -> jnp.ndarray:
    """Type-II DCT matrix (n_mfcc, n_mels), orthonormal like scipy/librosa."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    mat = 2.0 * np.cos(np.pi * k * (2 * n[None, :] + 1) / (2.0 * n_mels))
    if norm_ortho:
        mat *= np.sqrt(1.0 / (2.0 * n_mels))
        mat[0, :] *= 1.0 / np.sqrt(2.0)
    return jnp.asarray(mat, dtype=jnp.float32)
