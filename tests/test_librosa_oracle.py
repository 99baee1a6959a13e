"""librosa-semantics oracle for the classifier feature stack.

librosa is not installed here (no egress), so the oracle is an independent
numpy port of librosa's exact math (librosa>=0.10, the reference's pin —
``/root/reference/pyproject.toml:53``) written directly from the published
formulas: slaney-scale mel filterbank with slaney area norm, centered
CONSTANT-padded STFT with a periodic hann window, power_to_db with
top_db=80, and an orthonormal type-II DCT. A drift classifier trained on
reference-extracted features (``/root/reference/src/rho_tts/validation/
classifier/trainer.py:49-96``) is only transferable to this stack if these
match.
"""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

import jax.numpy as jnp

from rho_tts_tpu.ops import features, spectral


# ---------------------------------------------------------------------------
# Independent numpy port of librosa's MFCC pipeline
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    return np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def librosa_mel_fb(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """librosa.filters.mel (htk=False, norm="slaney") from the formulas."""
    fmax = sr / 2.0 if fmax is None else fmax
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    return weights * enorm[:, None]


def librosa_stft_power(y, n_fft, hop):
    """|librosa.stft|^2 with center=True, pad_mode="constant" (>=0.10)."""
    y = np.pad(np.asarray(y, np.float64), (n_fft // 2, n_fft // 2))
    win = scipy.signal.get_window("hann", n_fft, fftbins=True)
    n_frames = 1 + (len(y) - n_fft) // hop
    frames = np.stack([y[t * hop: t * hop + n_fft] for t in range(n_frames)])
    spec = np.fft.rfft(frames * win, axis=-1)
    return (np.abs(spec) ** 2).T  # (freq, T)


def librosa_mfcc(y, sr, n_mfcc=13, n_fft=2048, hop=512, n_mels=128):
    """librosa.feature.mfcc with all-default parameters."""
    power = librosa_stft_power(y, n_fft, hop)
    mel = librosa_mel_fb(sr, n_fft, n_mels) @ power
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    return scipy.fft.dct(db, type=2, axis=0, norm="ortho")[:n_mfcc]


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def _voice_like(seconds=1.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 140.0 + 20.0 * np.sin(2 * np.pi * 2.0 * t)
    wav = np.zeros_like(t)
    for h in range(1, 6):
        wav += np.sin(2 * np.pi * h * np.cumsum(f0) / sr) / h
    wav += 0.02 * rng.standard_normal(t.shape)
    return (0.3 * wav / np.abs(wav).max()).astype(np.float32)


def test_mel_filterbank_matches_librosa_formula():
    ours = np.asarray(spectral.mel_filterbank(16000, 2048, 128))
    ref = librosa_mel_fb(16000, 2048, 128)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_dct_matrix_matches_scipy_ortho():
    ours = np.asarray(spectral.dct_matrix(13, 128))
    eye = np.eye(128)
    ref = scipy.fft.dct(eye, type=2, axis=0, norm="ortho")[:13]
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_stft_power_matches_librosa_constant_pad():
    wav = _voice_like(0.5)
    ours = np.asarray(jnp.abs(spectral.stft(
        jnp.asarray(wav), 2048, 512, 2048, spectral.hann_window(2048),
        center=True, pad_mode="constant")) ** 2)
    ref = librosa_stft_power(wav, 2048, 512)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-3)


def test_mfcc_matches_librosa_oracle():
    """features.mfcc == librosa.feature.mfcc numpy port (fp32 tolerance)."""
    wav = _voice_like(1.0)
    ours = np.asarray(features.mfcc(wav))
    ref = librosa_mfcc(wav.astype(np.float64), 16000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0.05, rtol=1e-3)


def test_mfcc_stats_batch_matches_per_clip_oracle():
    """The batched masked device program == per-clip librosa math."""
    wavs = [_voice_like(0.5, seed=1), _voice_like(0.8, seed=2)]
    capacity = 16384
    lens = jnp.asarray([w.shape[0] for w in wavs], jnp.int32)
    batch = jnp.stack([jnp.pad(jnp.asarray(w), (0, capacity - w.shape[0])) for w in wavs])
    counts = 1 + lens // 512
    mean, std = features._mfcc_stats_batch(batch, counts, 16000, 13, 2048, 512, 128)

    for i, w in enumerate(wavs):
        ref = librosa_mfcc(w.astype(np.float64), 16000)
        np.testing.assert_allclose(np.asarray(mean)[i], ref.mean(axis=1), atol=0.05, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(std)[i], ref.std(axis=1), atol=0.05, rtol=1e-3)


def test_f0_yin_framing_matches_reference_semantics():
    """pyin-style framing: C2–C7 range, 2048 frame, NaN for unvoiced."""
    wav = _voice_like(1.0)
    f0, voiced = features.f0_yin(wav)
    # frame count: fully-interior frames like librosa.pyin's sliding window
    assert f0.shape == voiced.shape
    v = f0[voiced]
    assert v.size > 0
    # the synthetic voice is ~120-160 Hz; YIN must find it inside C2..C7
    assert np.all((v >= 65.41) & (v <= 2093.0))
    med = np.median(v)
    assert 110.0 < med < 180.0
    # unvoiced (masked) frames carry NaN like librosa.pyin
    if (~voiced).any():
        assert np.isnan(f0[~voiced]).all()


def test_speaker_log_mel_matches_librosa_melspectrogram():
    """resemblyzer's mel frontend: librosa.feature.melspectrogram defaults
    at sr=16000, n_fft=400, hop=160, n_mels=40 (librosa>=0.10 constant pad,
    periodic hann), then log."""
    from rho_tts_tpu.models.speaker import encoder as spk

    wav = _voice_like(0.5)
    ours = np.asarray(spk.log_mel(wav))  # (T, 40)

    power = librosa_stft_power(wav, spk.N_FFT, spk.HOP_LENGTH)
    mel = librosa_mel_fb(spk.SAMPLE_RATE, spk.N_FFT, spk.N_MELS) @ power
    ref = np.log(np.maximum(mel, 1e-10)).T
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
