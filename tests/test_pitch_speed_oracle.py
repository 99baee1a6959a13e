"""Numerical oracles for resample (speed) and pitch shift.

torchaudio is not installed on this host, so the oracle is the torchaudio
algorithm itself ported to float64 numpy, written INDEPENDENTLY of the JAX
implementations (time-domain windowed-sinc evaluation instead of the
strided-conv kernel bank; frame-loop STFT/OLA instead of the XLA program).
Reference semantics: torchaudio.functional.resample (sinc_interp_hann,
lowpass_filter_width=6, rolloff=0.99) and torchaudio.functional.pitch_shift
(n_fft=512, hop=128, hann), consumed by the reference at
src/rho_tts/base_tts.py:618-650.
"""

import math

import numpy as np
import pytest

from rho_tts_tpu.ops.pitch import pitch_shift
from rho_tts_tpu.ops.resample import resample

# ---------------------------------------------------------------------------
# Oracles (float64 numpy, direct definitions)
# ---------------------------------------------------------------------------

LW = 6  # lowpass_filter_width
ROLLOFF = 0.99


def np_resample(x, orig, new):
    """Direct time-domain windowed-sinc interpolation.

    y[m] = scale * sum_n x[n] * sinc(base*(m/new - n/orig))
                          * cos(pi*base*tau / (2*LW))**2  for |base*tau| < LW
    """
    g = math.gcd(orig, new)
    orig, new = orig // g, new // g
    base = min(orig, new) * ROLLOFF
    scale = base / orig
    x = np.asarray(x, np.float64)
    out_len = int(math.ceil(new * len(x) / orig))
    n = np.arange(len(x), dtype=np.float64)
    y = np.zeros(out_len, np.float64)
    for m in range(out_len):
        tau = (m / new - n / orig) * base
        mask = np.abs(tau) < LW
        t = tau[mask]
        win = np.cos(t * np.pi / LW / 2.0) ** 2
        y[m] = np.sum(x[mask] * np.sinc(t) * win) * scale
    return y


def _hann(n):
    """torch.hann_window(periodic=True)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def np_stft(x, n_fft=512, hop=128):
    pad = n_fft // 2
    xp = np.pad(np.asarray(x, np.float64), pad, mode="reflect")
    win = _hann(n_fft)
    n_frames = 1 + (len(xp) - n_fft) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] * win for i in range(n_frames)])
    return np.fft.rfft(frames, axis=1).T  # (freq, time)


def np_istft(spec, length, n_fft=512, hop=128):
    win = _hann(n_fft)
    frames = np.fft.irfft(spec.T, n=n_fft, axis=1)
    n_frames = frames.shape[0]
    total = n_fft + hop * (n_frames - 1)
    y = np.zeros(total, np.float64)
    norm = np.zeros(total, np.float64)
    for i in range(n_frames):
        y[i * hop : i * hop + n_fft] += frames[i] * win
        norm[i * hop : i * hop + n_fft] += win**2
    y = y / np.maximum(norm, 1e-11)
    pad = n_fft // 2
    y = y[pad:]
    if len(y) < length:
        y = np.pad(y, (0, length - len(y)))
    return y[:length]


def np_phase_vocoder(spec, rate, hop=128):
    n_freq, n_time = spec.shape
    phase_advance = np.linspace(0.0, np.pi * hop, n_freq)[:, None]
    steps = np.arange(0.0, n_time, rate)
    alphas = steps % 1.0
    spec_pad = np.pad(spec, ((0, 0), (0, 2)))
    idx = steps.astype(np.int64)
    a, b = spec_pad[:, idx], spec_pad[:, idx + 1]
    phase = np.angle(b) - np.angle(a) - phase_advance
    phase -= 2.0 * np.pi * np.round(phase / (2.0 * np.pi))
    phase += phase_advance
    phase = np.concatenate([np.angle(spec[:, :1]), phase[:, :-1]], axis=1)
    phase_acc = np.cumsum(phase, axis=1)
    mag = alphas[None] * np.abs(b) + (1.0 - alphas[None]) * np.abs(a)
    return mag * np.exp(1j * phase_acc)


def np_pitch_shift(x, sr, n_steps, n_fft=512, hop=128):
    from rho_tts_tpu.ops.pitch import rate_fraction

    ori_len = len(x)
    rate = 2.0 ** (-float(n_steps) / 12.0)
    spec = np_stft(x, n_fft, hop)
    stretched = np_phase_vocoder(spec, rate, hop)
    wav = np_istft(stretched, int(round(ori_len / rate)), n_fft, hop)
    # Same documented rational approximation of the irrational semitone
    # rate as the implementation (torchaudio's int(sr/rate) is itself an
    # approximation; this one bounds the kernel-bank size).
    new_f, orig_f = rate_fraction(rate)
    shifted = np_resample(wav, orig_f, new_f)
    if len(shifted) > ori_len:
        return shifted[:ori_len]
    return np.pad(shifted, (0, ori_len - len(shifted)))


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


def _signal(n=4000, sr=24000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 517 * t + 0.3)
        + 0.05 * rng.standard_normal(n)
    )
    return x.astype(np.float32)


# ---------------------------------------------------------------------------
# Resample parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "orig,new",
    [(24000, 16000), (16000, 24000), (24000, 22050), (24000, 12000), (22050, 16000)],
)
def test_resample_matches_sinc_oracle(orig, new):
    x = _signal()
    ours = np.asarray(resample(x, orig, new), np.float64)
    ref = np_resample(x, orig, new)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_resample_speed_double():
    """speed=2.0 == resample to half as many samples (reference speed path)."""
    x = _signal(n=4800)
    ours = np.asarray(resample(x, 24000, 12000), np.float64)
    assert len(ours) == 2400
    np.testing.assert_allclose(ours, np_resample(x, 24000, 12000), atol=2e-4)


# ---------------------------------------------------------------------------
# Pitch-shift parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_steps", [2.0, -3.0, 5.0])
def test_pitch_shift_matches_phase_vocoder_oracle(n_steps):
    x = _signal(n=6144)
    ours = np.asarray(pitch_shift(x, 24000, n_steps), np.float64)
    ref = np_pitch_shift(x.astype(np.float64), 24000, n_steps)
    assert ours.shape == ref.shape
    # f32 FFT/angle/cumsum vs f64 oracle: pointwise tolerance plus a
    # correlation floor (phases accumulate tiny drift over frames).
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    denom = np.linalg.norm(ours) * np.linalg.norm(ref)
    assert float(np.dot(ours, ref)) / max(denom, 1e-12) > 0.999


def test_pitch_shift_zero_steps_identity():
    x = _signal(n=2048)
    np.testing.assert_array_equal(np.asarray(pitch_shift(x, 24000, 0.0)), x)
