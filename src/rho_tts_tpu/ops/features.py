"""Acoustic feature extraction in XLA: MFCC, F0 (YIN), LPC formants.

Replaces the librosa (C-accelerated, host-only) feature path of the
reference's drift classifier (``validation/classifier/trainer.py:23-96``):
mel/MFCC and the YIN difference function run as batched FFT programs on
device; Levinson-Durbin recursion and polynomial root-finding (tiny,
O(order²)) stay on host.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spectral

MFCC_SR = 16000


# ---------------------------------------------------------------------------
# MFCC (librosa-compatible defaults)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_fft", "hop", "n_mels"))
def _mfcc_core(wav, sr: int, n_mfcc: int, n_fft: int, hop: int, n_mels: int):
    spec = spectral.stft(wav, n_fft, hop, n_fft, spectral.hann_window(n_fft), center=True)
    power = jnp.abs(spec) ** 2  # (freq, T)
    fb = spectral.mel_filterbank(sr, n_fft, n_mels)
    mels = fb @ power  # (n_mels, T)
    # power_to_db with ref=1.0, top_db=80 (librosa defaults)
    db = 10.0 * jnp.log10(jnp.maximum(mels, 1e-10))
    db = jnp.maximum(db, jnp.max(db) - 80.0)
    dct = spectral.dct_matrix(n_mfcc, n_mels)
    return dct @ db  # (n_mfcc, T)


def mfcc(wav, sr: int = MFCC_SR, n_mfcc: int = 13, n_fft: int = 2048, hop: int = 512, n_mels: int = 128):
    """MFCCs of a mono waveform, shape (n_mfcc, T)."""
    return _mfcc_core(jnp.asarray(wav, jnp.float32), sr, n_mfcc, n_fft, hop, n_mels)


# ---------------------------------------------------------------------------
# F0 via YIN (batched frames on device)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("frame_length", "hop", "tau_max"))
def _yin_cmnd(wav, frame_length: int, hop: int, tau_max: int):
    """Cumulative mean-normalized difference per frame, shape (T, tau_max)."""
    frames = spectral.frame_signal(wav, frame_length, hop)  # (T, L)
    # YIN difference d(tau) = sum_{j<w} (x[j] - x[j+tau])^2
    #                       = e0 + e_tau - 2 * corr(tau)
    # with corr(tau) = sum_{j<w} x[j] x[j+tau], computed via FFT
    # cross-correlation of the first half-window against the full frame.
    w = frame_length // 2
    x = frames
    n_fft = int(2 ** np.ceil(np.log2(frame_length + w)))
    head = jnp.where(jnp.arange(frame_length) < w, x, 0.0)
    spec_head = jnp.fft.rfft(head, n_fft, axis=-1)
    spec_full = jnp.fft.rfft(x, n_fft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(spec_head) * spec_full, n_fft, axis=-1)[:, : w + 1]
    cumsum = jnp.cumsum(x * x, axis=-1)
    e0 = cumsum[:, w - 1]  # energy of x[0:w]
    # energy of x[tau:tau+w] for tau in [0, w]
    padded = jnp.concatenate([jnp.zeros((x.shape[0], 1)), cumsum], axis=-1)
    taus = jnp.arange(w + 1)
    e_tau = padded[:, taus + w] - padded[:, taus]
    d = e0[:, None] + e_tau - 2.0 * corr
    d = d[:, : tau_max + 1]
    # Cumulative mean normalization
    csum = jnp.cumsum(d[:, 1:], axis=-1)
    tau_idx = jnp.arange(1, d.shape[1])
    cmnd = d[:, 1:] * tau_idx / jnp.maximum(csum, 1e-12)
    cmnd = jnp.concatenate([jnp.ones((d.shape[0], 1)), cmnd], axis=-1)
    return cmnd, e0


def f0_yin(
    wav,
    sr: int = MFCC_SR,
    fmin: float = 65.41,  # C2
    fmax: float = 2093.0,  # C7
    frame_length: int = 2048,
    hop: int = 512,
    threshold: float = 0.1,
    voiced_threshold: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame F0 estimates and voiced mask (YIN).

    Returns (f0_hz (T,), voiced (T,) bool). Unvoiced frames carry NaN like
    librosa's pyin output so downstream mean/std can mask them.
    """
    wav = jnp.asarray(wav, jnp.float32)
    if wav.shape[-1] < frame_length:
        wav = jnp.pad(wav, (0, frame_length - wav.shape[-1]))
    tau_min = max(int(sr / fmax), 1)
    tau_max = min(int(sr / fmin) + 1, frame_length // 2)
    cmnd, e0 = _yin_cmnd(wav, frame_length, hop, tau_max)
    cmnd, e0 = np.asarray(cmnd), np.asarray(e0)  # (T, tau_max+1), (T,)

    t_frames = cmnd.shape[0]
    f0 = np.full(t_frames, np.nan, np.float64)
    voiced = np.zeros(t_frames, bool)
    energy_gate = 1e-6 * (frame_length // 2)
    for t in range(t_frames):
        if e0[t] < energy_gate:
            continue  # silent frame → unvoiced
        c = cmnd[t]
        below = np.nonzero(c[tau_min:tau_max] < threshold)[0]
        if below.size:
            tau = tau_min + below[0]
            # walk to the local minimum of this dip
            while tau + 1 < tau_max and c[tau + 1] < c[tau]:
                tau += 1
        else:
            tau = tau_min + int(np.argmin(c[tau_min:tau_max]))
        if c[tau] < voiced_threshold:
            # Parabolic interpolation around the minimum
            if 0 < tau < tau_max - 1:
                a, b_, cc = c[tau - 1], c[tau], c[tau + 1]
                denom = a - 2 * b_ + cc
                shift = 0.5 * (a - cc) / denom if abs(denom) > 1e-12 else 0.0
            else:
                shift = 0.0
            f0[t] = sr / (tau + shift)
            voiced[t] = True
    return f0, voiced


# ---------------------------------------------------------------------------
# LPC formants (F1/F2)
# ---------------------------------------------------------------------------


def _levinson(r: np.ndarray, order: int) -> np.ndarray:
    """Levinson-Durbin: autocorrelation → LPC coefficients [1, a1..ap]."""
    a = np.zeros(order + 1, np.float64)
    a[0] = 1.0
    err = r[0]
    if err <= 0:
        return a
    for i in range(1, order + 1):
        acc = r[i] + np.dot(a[1:i], r[1:i][::-1])
        k = -acc / err
        a_prev = a[: i + 1].copy()
        new = a_prev.copy()
        new[i] = k
        for j in range(1, i):
            new[j] = a_prev[j] + k * a_prev[i - j]
        a[: i + 1] = new
        err *= 1.0 - k * k
        if err <= 0:
            break
    return a


def estimate_formants(wav, sr: int = MFCC_SR) -> Tuple[float, float]:
    """F1/F2 from LPC analysis of a Hann-windowed mid-file 25 ms frame.

    Pre-emphasis flattens the spectral tilt; formants are the angles of the
    upper-half-plane roots of the LPC polynomial in (90 Hz, sr/4).
    """
    y = np.asarray(wav, np.float64).reshape(-1)
    if y.size < 32:
        return 0.0, 0.0
    y_pre = np.append(y[0], y[1:] - 0.97 * y[:-1])

    frame_len = int(0.025 * sr)
    center = len(y_pre) // 2
    frame = y_pre[max(0, center - frame_len // 2) : center + frame_len // 2]
    frame = frame * np.hanning(len(frame))

    order = max(12, sr // 1000 + 2)
    if frame.size <= order:
        return 0.0, 0.0
    # Autocorrelation method + Levinson-Durbin
    r = np.correlate(frame, frame, "full")[frame.size - 1 : frame.size + order]
    a = _levinson(r, order)

    roots = np.roots(a)
    roots = roots[roots.imag > 0]
    freqs = np.sort(np.angle(roots) * (sr / (2 * np.pi)))
    freqs = freqs[(freqs > 90) & (freqs < sr / 4)]

    f1 = float(freqs[0]) if len(freqs) > 0 else 0.0
    f2 = float(freqs[1]) if len(freqs) > 1 else 0.0
    return f1, f2
