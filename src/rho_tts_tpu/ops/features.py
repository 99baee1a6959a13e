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
    # librosa>=0.10 (the reference's pin) zero-pads the centered STFT
    # (pad_mode="constant"), NOT reflect — pinned by the numpy oracle in
    # tests/test_librosa_oracle.py so reference-trained classifiers transfer.
    spec = spectral.stft(wav, n_fft, hop, n_fft, spectral.hann_window(n_fft),
                         center=True, pad_mode="constant")
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
    return yin_pick(
        cmnd, e0, sr, tau_min, tau_max, frame_length, threshold, voiced_threshold
    )


def yin_pick(
    cmnd: np.ndarray,
    e0: np.ndarray,
    sr: int,
    tau_min: int,
    tau_max: int,
    frame_length: int,
    threshold: float,
    voiced_threshold: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """YIN dip selection on host, vectorized over frames.

    Semantics: per frame, the candidate lag is the first tau with
    CMND < ``threshold``, walked forward to its local minimum (classic YIN
    absolute-threshold step); if no dip crosses the threshold, the global
    argmin. A frame is voiced when the selected CMND value is below
    ``voiced_threshold`` and the frame has energy. The selected lag is
    refined by parabolic interpolation.
    """
    t_frames = cmnd.shape[0]
    f0 = np.full(t_frames, np.nan, np.float64)
    voiced = np.zeros(t_frames, bool)
    if t_frames == 0:
        return f0, voiced
    energy_gate = 1e-6 * (frame_length // 2)
    active = e0 >= energy_gate  # (T,)

    seg = cmnd[:, tau_min:tau_max]  # (T, R)
    below = seg < threshold
    has_below = below.any(axis=1)
    tau0 = tau_min + np.argmax(below, axis=1)  # first below-threshold lag

    # Walk to the dip's local minimum: the first tau >= tau0 where
    # c[tau+1] >= c[tau] (the loop's stop condition), bounded by tau_max-1.
    dec = cmnd[:, 1:tau_max] < cmnd[:, : tau_max - 1]  # dec[t, k] = c[k+1] < c[k]
    ks = np.arange(tau_max - 1)[None, :]
    stop = np.where((ks >= tau0[:, None]) & ~dec, ks, tau_max - 1)
    tau_walk = stop.min(axis=1)
    tau_argmin = tau_min + np.argmin(seg, axis=1)
    tau = np.where(has_below, tau_walk, tau_argmin)  # (T,)

    rows = np.arange(t_frames)
    c_tau = cmnd[rows, tau]
    is_voiced = active & (c_tau < voiced_threshold)

    # Parabolic interpolation around the selected lag (interior lags only)
    interior = (tau > 0) & (tau < tau_max - 1)
    a = cmnd[rows, np.maximum(tau - 1, 0)]
    c2 = cmnd[rows, np.minimum(tau + 1, cmnd.shape[1] - 1)]
    denom = a - 2.0 * c_tau + c2
    safe = np.where(np.abs(denom) > 1e-12, denom, 1.0)
    shift = np.where(np.abs(denom) > 1e-12, 0.5 * (a - c2) / safe, 0.0)
    shift = np.where(interior, shift, 0.0)

    f0_all = sr / (tau + shift)
    f0[is_voiced] = f0_all[is_voiced]
    voiced[:] = is_voiced
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


# ---------------------------------------------------------------------------
# Batched feature cores (bucketed static shapes, valid-length masking)
#
# One device program computes MFCC statistics and the YIN difference
# surface for a whole batch of utterances; the serial path above is the
# semantic reference (kept for single clips and as the test oracle).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_fft", "hop", "n_mels"))
def _mfcc_stats_batch(wavs, frame_counts, sr: int, n_mfcc: int, n_fft: int, hop: int, n_mels: int):
    """Masked per-utterance MFCC mean/std.

    wavs: (B, L) — each row reflect-padded past its valid length so the
    STFT's boundary frames match the unpadded per-clip computation.
    frame_counts: (B,) valid frame counts (1 + n_valid // hop).
    Returns (mean (B, n_mfcc), std (B, n_mfcc)).
    """
    window = spectral.hann_window(n_fft)
    spec = jax.vmap(lambda w: spectral.stft(
        w, n_fft, hop, n_fft, window, center=True, pad_mode="constant"))(wavs)
    power = jnp.abs(spec) ** 2  # (B, F, T)
    fb = spectral.mel_filterbank(sr, n_fft, n_mels)
    mels = jnp.einsum("mf,bft->bmt", fb, power)
    db = 10.0 * jnp.log10(jnp.maximum(mels, 1e-10))
    t = db.shape[-1]
    mask = (jnp.arange(t)[None, :] < frame_counts[:, None])  # (B, T)
    db_max = jnp.max(jnp.where(mask[:, None, :], db, -jnp.inf), axis=(1, 2))
    db = jnp.maximum(db, db_max[:, None, None] - 80.0)
    dct = spectral.dct_matrix(n_mfcc, n_mels)
    mf = jnp.einsum("cm,bmt->bct", dct, db)  # (B, n_mfcc, T)
    cnt = jnp.maximum(frame_counts, 1).astype(jnp.float32)[:, None]
    m = jnp.where(mask[:, None, :], mf, 0.0)
    mean = m.sum(-1) / cnt
    var = jnp.where(mask[:, None, :], (mf - mean[..., None]) ** 2, 0.0).sum(-1) / cnt
    return mean, jnp.sqrt(var)


@partial(jax.jit, static_argnames=("frame_length", "hop", "tau_max"))
def _yin_cmnd_batch(wavs, frame_length: int, hop: int, tau_max: int):
    """Batched YIN CMND surfaces: (B, L) → ((B, T, tau_max+1), (B, T))."""
    return jax.vmap(lambda w: _yin_cmnd(w, frame_length, hop, tau_max))(wavs)


def yin_pick_device(cmnd, e0, sr: int, tau_min: int, tau_max: int,
                    frame_length: int, threshold: float, voiced_threshold: float):
    """YIN dip selection as XLA ops (same math as :func:`yin_pick`).

    cmnd (…, T, tau_max+1), e0 (…, T) → (f0 (…, T) with 0 on unvoiced
    frames, voiced (…, T) bool). Runs on device so the pipeline never
    fetches the (T, tau) CMND surface to the host.
    """
    energy_gate = 1e-6 * (frame_length // 2)
    active = e0 >= energy_gate

    seg = cmnd[..., tau_min:tau_max]
    below = seg < threshold
    has_below = below.any(axis=-1)
    tau0 = tau_min + jnp.argmax(below, axis=-1)

    dec = cmnd[..., 1:tau_max] < cmnd[..., : tau_max - 1]
    ks = jnp.arange(tau_max - 1)
    stop = jnp.where((ks >= tau0[..., None]) & ~dec, ks, tau_max - 1)
    tau_walk = stop.min(axis=-1)
    tau_argmin = tau_min + jnp.argmin(seg, axis=-1)
    tau = jnp.where(has_below, tau_walk, tau_argmin)

    c_tau = jnp.take_along_axis(cmnd, tau[..., None], axis=-1)[..., 0]
    is_voiced = active & (c_tau < voiced_threshold)

    interior = (tau > 0) & (tau < tau_max - 1)
    a = jnp.take_along_axis(cmnd, jnp.maximum(tau - 1, 0)[..., None], axis=-1)[..., 0]
    c2 = jnp.take_along_axis(
        cmnd, jnp.minimum(tau + 1, cmnd.shape[-1] - 1)[..., None], axis=-1
    )[..., 0]
    denom = a - 2.0 * c_tau + c2
    ok = jnp.abs(denom) > 1e-12
    shift = jnp.where(ok, 0.5 * (a - c2) / jnp.where(ok, denom, 1.0), 0.0)
    shift = jnp.where(interior, shift, 0.0)

    f0 = sr / (tau + shift)
    return jnp.where(is_voiced, f0, 0.0), is_voiced
