"""Polyphase windowed-sinc resampling in JAX.

Reproduces the semantics of torchaudio's ``functional.resample`` with the
default ``sinc_interp_hann`` method (lowpass_filter_width=6, rolloff=0.99):
the kernel bank has one filter per output phase and is applied as a strided
conv — which XLA maps straight onto the MXU as a batched matmul.

Used for playback-speed adjustment (reference ``base_tts.py:631-638``) and
sample-rate conversion in the validation frontends (16 kHz Whisper/speaker
inputs from 24 kHz synthesis output).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple:
    """Build the (new_freq, 1, kernel_width) filter bank and its half-width."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale
    return jnp.asarray(kernels[:, None, :], dtype=jnp.float32), width


@partial(jax.jit, static_argnames=("width", "orig_freq", "new_freq", "target_length"))
def _resample_core(x, kernel, width: int, orig_freq: int, new_freq: int, target_length: int):
    n = x.shape[-1]
    padded = jnp.pad(x, (width, width + orig_freq))[None, None, :]
    out = jax.lax.conv_general_dilated(
        padded,
        kernel,
        window_strides=(orig_freq,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (1, new_freq, T)
    resampled = out[0].T.reshape(-1)  # interleave phases
    return resampled[:target_length]


def resample(audio, orig_freq: int, new_freq: int):
    """Resample a 1-D waveform from ``orig_freq`` to ``new_freq`` Hz."""
    a = jnp.asarray(audio, dtype=jnp.float32).reshape(-1)
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq or a.shape[-1] == 0:
        return a
    g = math.gcd(orig_freq, new_freq)
    of, nf = orig_freq // g, new_freq // g
    kernel, width = _sinc_kernel(of, nf)
    target_length = math.ceil(nf * a.shape[-1] / of)
    return _resample_core(a, kernel, width, of, nf, target_length)


def resample_batch(wavs, orig_freq: int, new_freq: int, target_length: int):
    """Resample a (B, L) batch to ``target_length`` samples per row.

    One vmapped polyphase-sinc program for the whole batch; trace-safe
    (usable inside an enclosing ``jit``). Shared by the STT and
    drift-feature batch paths.
    """
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq:
        cur = wavs.shape[-1]
        if cur == target_length:
            return jnp.asarray(wavs, jnp.float32)
        if cur > target_length:
            return jnp.asarray(wavs, jnp.float32)[..., :target_length]
        return jnp.pad(jnp.asarray(wavs, jnp.float32), ((0, 0), (0, target_length - cur)))
    g = math.gcd(orig_freq, new_freq)
    of, nf = orig_freq // g, new_freq // g
    kernel, width = _sinc_kernel(of, nf)
    return jax.vmap(
        lambda x: _resample_core(jnp.asarray(x, jnp.float32), kernel, width, of, nf, target_length)
    )(wavs)
