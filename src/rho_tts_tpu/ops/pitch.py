"""Phase-vocoder pitch shifting in JAX.

Reproduces torchaudio's ``functional.pitch_shift`` pipeline (n_fft=512,
win=512, hop=128, Hann window): STFT → phase-vocoder time stretch by
``rate = 2**(-n_steps/12)`` → ISTFT → sinc resample back to the original
rate → trim/pad to the original length. The STFT/ISTFT and the complex
interpolation all run as XLA FFT + gather programs on device.

One deliberate deviation: torchaudio resamples with
``orig_freq=int(sample_rate/rate)``, whose gcd reduction lands on huge
coprime ratios (e.g. 8979:8000 for +2 semitones at 24 kHz) — a
72M-element kernel bank that is pathological to build and compile. The
semitone rate is irrational either way, so we approximate it with the
best rational of denominator ≤ 64 instead (≤ ~1 cent of pitch error,
inaudible; the kernel bank stays tiny and MXU-friendly).

Capability parity: reference ``base_tts.py:640-648``.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import resample as resample_ops
from . import spectral


def rate_fraction(rate: float, max_denominator: int = 64) -> Tuple[int, int]:
    """Best (new, orig) rational approximation of a resample ratio."""
    frac = Fraction(rate).limit_denominator(max_denominator)
    return frac.numerator, frac.denominator


def phase_vocoder(spec: jnp.ndarray, rate: float, phase_advance: jnp.ndarray) -> jnp.ndarray:
    """Time-stretch a complex spectrogram (freq, time) by ``rate``.

    Matches ``torchaudio.functional.phase_vocoder``: magnitude is linearly
    interpolated between neighboring frames; phase is accumulated from
    wrapped frame-to-frame deltas.
    """
    n_time = spec.shape[-1]
    time_steps = jnp.arange(0.0, float(n_time), float(rate), dtype=jnp.float32)
    alphas = jnp.mod(time_steps, 1.0)

    phase_0 = jnp.angle(spec[..., :1])

    spec_pad = jnp.pad(spec, ((0, 0), (0, 2)))
    idx = time_steps.astype(jnp.int32)
    spec_a = spec_pad[:, idx]
    spec_b = spec_pad[:, idx + 1]

    angle_a = jnp.angle(spec_a)
    angle_b = jnp.angle(spec_b)
    norm_a = jnp.abs(spec_a)
    norm_b = jnp.abs(spec_b)

    phase = angle_b - angle_a - phase_advance
    phase = phase - 2.0 * np.pi * jnp.round(phase / (2.0 * np.pi))
    phase = phase + phase_advance
    phase = jnp.concatenate([phase_0, phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)

    mag = alphas[None, :] * norm_b + (1.0 - alphas[None, :]) * norm_a
    return mag * jnp.exp(1j * phase_acc)


def pitch_shift(
    audio,
    sample_rate: int,
    n_steps: float,
    bins_per_octave: int = 12,
    n_fft: int = 512,
) -> jnp.ndarray:
    """Shift the pitch of a waveform by ``n_steps`` semitones."""
    a = jnp.asarray(audio, dtype=jnp.float32).reshape(-1)
    if a.shape[-1] == 0 or n_steps == 0.0:
        return a

    win_length = n_fft
    hop_length = win_length // 4
    window = spectral.hann_window(win_length)
    ori_len = int(a.shape[-1])
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)

    spec = spectral.stft(a, n_fft, hop_length, win_length, window, center=True)
    phase_advance = jnp.linspace(0.0, math.pi * hop_length, spec.shape[0])[:, None]
    spec_stretch = phase_vocoder(spec, rate, phase_advance)
    len_stretch = int(round(ori_len / rate))
    wav_stretch = spectral.istft(
        spec_stretch, n_fft, hop_length, win_length, window, length=len_stretch
    )
    new_f, orig_f = rate_fraction(rate)
    shifted = resample_ops.resample(wav_stretch, orig_f, new_f)

    if shifted.shape[-1] > ori_len:
        return shifted[:ori_len]
    return jnp.pad(shifted, (0, ori_len - shifted.shape[-1]))
