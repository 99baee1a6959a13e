"""Waveform DSP ops with reference-parity semantics, built on XLA.

Every op here reproduces the numerical behavior of the reference CPU path
(cited per-function) while staying jit-friendly:

* Fixed-capacity "bucketed" buffers — waveforms are zero-padded up to a
  bucket multiple and the true length travels as a traced scalar, so XLA
  compiles one program per bucket instead of one per waveform length.
* No data-dependent Python control flow inside jitted cores; conditions are
  ``jnp.where`` selects on scalars.
* Dynamic-length results are expressed as (buffer, start, end) and sliced on
  the host boundary.

Reference semantics reproduced from ``src/rho_tts/base_tts.py`` (trim
:348-392, DC :394-399, fades :401-433, join :435-536, decay :297-323) and
``src/rho_tts/providers/qwen.py`` (loudness post-process :268-378).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Bucket granularity for fixed-shape compilation (samples).
BUCKET = 16384


def bucket_size(n: int) -> int:
    """Round a sample count up to the bucket granularity."""
    return max(BUCKET, ((int(n) + BUCKET - 1) // BUCKET) * BUCKET)


def _pad_to(audio: jnp.ndarray, capacity: int) -> jnp.ndarray:
    n = audio.shape[-1]
    if n == capacity:
        return audio
    return jnp.pad(audio, (0, capacity - n))


def _as_f32_1d(audio) -> jnp.ndarray:
    a = jnp.asarray(audio, dtype=jnp.float32)
    if a.ndim == 2:
        a = a.reshape(-1) if 1 in a.shape else a.mean(axis=0)
    return a


# ---------------------------------------------------------------------------
# Silence trimming
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("window", "stride", "capacity"))
def _trim_bounds_core(
    buf: jnp.ndarray,
    length: jnp.ndarray,
    threshold: jnp.ndarray,
    window: int,
    stride: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Windowed-RMS energy scan; returns (first_idx, last_idx, any_nonsilent).

    Matches ``torch.nn.functional.avg_pool1d(x**2, window, stride,
    padding=window//2)`` (count_include_pad=True) followed by sqrt and a
    threshold compare: window w averages ``window`` samples of the
    zero-padded signal starting at ``w*stride - padding``.
    """
    padding = window // 2
    x2 = buf * buf
    padded = jnp.pad(x2, (padding, window))  # front pad + safety tail
    n_windows_max = (capacity + 2 * padding - window) // stride + 1
    # Windowed sums via reduce_window (exact per-window accumulation).
    sums = jax.lax.reduce_window(
        padded,
        0.0,
        jax.lax.add,
        window_dimensions=(window,),
        window_strides=(stride,),
        padding="valid",
    )[:n_windows_max]
    energy = jnp.sqrt(sums / window)
    n_windows = jnp.maximum((length + 2 * padding - window) // stride + 1, 0)
    idx = jnp.arange(energy.shape[0])
    valid = idx < n_windows
    non_silent = (energy > threshold) & valid
    any_ns = jnp.any(non_silent)
    first = jnp.argmax(non_silent)
    last = energy.shape[0] - 1 - jnp.argmax(non_silent[::-1])
    return first, last, any_ns


def trim_silence(
    audio,
    sample_rate: int,
    threshold_db: float = -50.0,
    from_start: bool = True,
    from_end: bool = True,
    enabled: bool = True,
):
    """Trim leading/trailing silence using windowed RMS energy.

    Parity: reference ``base_tts.py:348-392``. Window is 10 ms, stride is
    half a window, threshold is ``10**(threshold_db/20)``. When everything is
    below threshold, the first window worth of samples is returned.
    """
    a = _as_f32_1d(audio)
    n = int(a.shape[-1])
    if not enabled or n == 0:
        return a

    window = int(sample_rate * 0.01)
    if window < 2:
        return a
    stride = window // 2
    if stride == 0:
        return a
    threshold = 10.0 ** (threshold_db / 20.0)

    capacity = bucket_size(n)
    buf = _pad_to(a, capacity)
    first, last, any_ns = _trim_bounds_core(
        buf,
        jnp.int32(n),
        jnp.float32(threshold),
        window,
        stride,
        capacity,
    )
    if not bool(any_ns):
        return a[:window]

    first = int(first)
    last = int(last)
    start = (first * window // 2) if from_start else 0
    end = ((last + 2) * window // 2) if from_end else n
    start = max(0, min(start, n))
    end = max(start, min(end, n))
    return a[start:end]


# ---------------------------------------------------------------------------
# DC offset / fades
# ---------------------------------------------------------------------------


def remove_dc_offset(audio):
    """Subtract the mean. Parity: reference ``base_tts.py:394-399``."""
    a = _as_f32_1d(audio)
    if a.shape[-1] == 0:
        return a
    return a - jnp.mean(a)


@partial(jax.jit, static_argnames=("fade_samples", "fade_in", "fade_out"))
def _fades_core(a: jnp.ndarray, fade_samples: int, fade_in: bool, fade_out: bool):
    n = a.shape[-1]
    i = jnp.arange(fade_samples, dtype=jnp.float32)
    # torch.linspace(0, pi, fs)[i] == i * pi / (fs - 1)
    theta = i * (np.pi / max(fade_samples - 1, 1))
    if fade_in:
        curve_in = 0.5 * (1.0 - jnp.cos(theta))
        a = a.at[:fade_samples].multiply(curve_in)
    if fade_out:
        curve_out = 0.5 * (1.0 + jnp.cos(theta))
        a = a.at[n - fade_samples :].multiply(curve_out)
    return a


def apply_fades(
    audio,
    sample_rate: int,
    fade_duration_sec: float = 0.02,
    fade_in: bool = True,
    fade_out: bool = True,
):
    """Raised-cosine fade-in/out. Parity: reference ``base_tts.py:401-433``.

    If the waveform is shorter than two fades, it is returned unchanged.
    """
    a = _as_f32_1d(audio)
    n = int(a.shape[-1])
    if n == 0:
        return a
    fade_samples = int(sample_rate * fade_duration_sec)
    if fade_samples < 1 or n < fade_samples * 2:
        return a
    return _fades_core(a, fade_samples, fade_in, fade_out)


# ---------------------------------------------------------------------------
# Equal-power crossfade join
# ---------------------------------------------------------------------------


def _crossfade_pair(prev_tail: jnp.ndarray, curr_head: jnp.ndarray) -> jnp.ndarray:
    """Equal-power crossfade: prev*cos(0..pi/2) + curr*cos(pi/2..0)."""
    overlap = prev_tail.shape[-1]
    i = jnp.arange(overlap, dtype=jnp.float32)
    theta = i * (np.pi / 2.0 / max(overlap - 1, 1))
    fade_out = jnp.cos(theta)
    fade_in = jnp.cos(np.pi / 2.0 - theta)
    return prev_tail * fade_out + curr_head * fade_in


def smooth_segment_join(
    segments: List,
    sample_rate: int,
    crossfade_duration_sec: float = 0.05,
    inter_sentence_pause_sec: float = 0.1,
    trim: bool = True,
    silence_threshold_db: float = -50.0,
    fade_duration_sec: float = 0.02,
) -> Optional[jnp.ndarray]:
    """Join segments with per-segment trimming and equal-power crossfades.

    Parity: reference ``base_tts.py:435-536``. Boundary-position-aware
    trimming (first segment keeps its onset, last keeps its tail), DC
    removal per segment, crossfaded overlaps (skipped when the overlap would
    be <= 10 samples), an inter-sentence pause between interior joins, and a
    final global fade-in/out.
    """
    if len(segments) == 0:
        return None
    if len(segments) == 1:
        a = trim_silence(
            segments[0], sample_rate, silence_threshold_db, True, True, enabled=trim
        )
        a = remove_dc_offset(a)
        return apply_fades(a, sample_rate, fade_duration_sec, True, True)

    crossfade_samples = int(sample_rate * crossfade_duration_sec)

    processed: List[jnp.ndarray] = []
    for i, seg in enumerate(segments):
        if i == 0:
            t = trim_silence(
                seg, sample_rate, silence_threshold_db, False, True, enabled=trim
            )
        elif i == len(segments) - 1:
            t = trim_silence(
                seg, sample_rate, silence_threshold_db, True, False, enabled=trim
            )
        else:
            t = trim_silence(
                seg, sample_rate, silence_threshold_db, True, True, enabled=trim
            )
        processed.append(remove_dc_offset(t))

    parts: List[jnp.ndarray] = []
    for i, curr in enumerate(processed):
        if i == 0:
            if len(processed) > 1 and curr.shape[-1] > crossfade_samples:
                parts.append(curr[:-crossfade_samples])
            else:
                parts.append(curr)
            continue

        prev = processed[i - 1]
        overlap = min(crossfade_samples, int(prev.shape[-1]), int(curr.shape[-1]))

        # NOTE (intentional reference parity, base_tts.py:481-520): when a
        # segment is shorter than the crossfade its tail can be emitted
        # twice (appended whole, then crossfaded again), and a held-back
        # crossfade tail is dropped when the next overlap is <= 10. The
        # fused _finalize_join_core reproduces both edge cases so DSP
        # output stays bit-for-bit with the reference chain.
        if overlap > 10:
            parts.append(_crossfade_pair(prev[-overlap:], curr[:overlap]))

            if i < len(processed) - 1:
                if curr.shape[-1] > (overlap + crossfade_samples):
                    remaining = curr[overlap:-crossfade_samples]
                else:
                    remaining = curr[overlap:]
            else:
                remaining = curr[overlap:]

            if remaining.shape[-1] > 0:
                parts.append(remaining)

            if inter_sentence_pause_sec > 0 and i < len(processed) - 1:
                pause = jnp.zeros(
                    int(sample_rate * inter_sentence_pause_sec), dtype=jnp.float32
                )
                parts.append(pause)
        else:
            parts.append(curr)

    if parts:
        joined = jnp.concatenate(parts, axis=-1)
    else:
        joined = jnp.concatenate([_as_f32_1d(s) for s in segments], axis=-1)
    return apply_fades(joined, sample_rate, fade_duration_sec, True, True)


# ---------------------------------------------------------------------------
# Sound decay
# ---------------------------------------------------------------------------


@jax.jit
def _decay_core(a: jnp.ndarray, third: jnp.ndarray):
    n = a.shape[-1]
    idx = jnp.arange(n)
    first_mask = idx < third
    last_mask = idx >= (n - third)
    denom = jnp.maximum(third.astype(jnp.float32), 1.0)
    first_rms = jnp.sqrt(jnp.sum(jnp.where(first_mask, a * a, 0.0)) / denom)
    last_rms = jnp.sqrt(jnp.sum(jnp.where(last_mask, a * a, 0.0)) / denom)
    return first_rms, last_rms


def sound_decay_ratio(audio) -> float:
    """RMS of the last third over RMS of the first third.

    Parity: reference ``base_tts.py:297-323``. Returns 1.0 for empty/short
    audio or a silent opening.
    """
    a = _as_f32_1d(audio)
    n = int(a.shape[-1])
    third = n // 3
    if n == 0 or third < 1:
        return 1.0
    first_rms, last_rms = _decay_core(a, jnp.int32(third))
    first_rms = float(first_rms)
    last_rms = float(last_rms)
    if first_rms < 1e-8:
        return 1.0
    return last_rms / first_rms


# ---------------------------------------------------------------------------
# Loudness post-processing (windowed decay correction + RMS norm + soft clip)
# ---------------------------------------------------------------------------


def _loudness_masked(
    buf: jnp.ndarray,
    length: jnp.ndarray,
    window_samples: int,
    max_windows: int,
    capacity: int,
    target_rms_db: float,
    max_gain_db: float,
):
    """Traced body of the loudness chain (see ``_loudness_core``)."""
    n_f = length.astype(jnp.float32)
    valid = jnp.arange(capacity) < length
    x = jnp.where(valid, buf, 0.0)

    overall_rms = jnp.sqrt(jnp.sum(x * x) / jnp.maximum(n_f, 1.0))
    silent = overall_rms < 1e-8

    # --- Pass 1: windowed decay correction -------------------------------
    n_windows = length // window_samples
    apply_windowed = (length > window_samples * 2) & (n_windows >= 2)

    w = x[: max_windows * window_samples].reshape(max_windows, window_samples)
    win_idx = jnp.arange(max_windows)
    win_valid = win_idx < n_windows
    win_rms = jnp.sqrt(jnp.mean(w * w, axis=1))

    ref_rms = win_rms[0]
    max_gain_linear = 10.0 ** (max_gain_db / 20.0)
    gains = jnp.where(
        win_rms < 1e-8, 1.0, jnp.minimum(ref_rms / jnp.maximum(win_rms, 1e-12), max_gain_linear)
    )
    gains = jnp.where(win_valid, gains, 1.0)

    g_valid = jnp.where(win_valid, gains, jnp.nan)
    gain_range = jnp.nanmax(g_valid) - jnp.nanmin(g_valid)

    apply_windowed = apply_windowed & (ref_rms >= 1e-8) & (gain_range >= 0.05)

    # 3-tap moving average, applied twice; endpoints unchanged; only smooth
    # across valid windows (interior means index in [1, n_windows-2]).
    def smooth(g):
        left = jnp.roll(g, 1)
        right = jnp.roll(g, -1)
        avg = (left + g + right) / 3.0
        interior = (win_idx >= 1) & (win_idx < n_windows - 1)
        return jnp.where(interior, avg, g)

    sm = smooth(smooth(gains))

    # Linear interpolation of the window-center gain curve to sample level
    # (np.interp semantics: clamp outside [first_center, last_center]).
    s = jnp.arange(capacity, dtype=jnp.float32)
    pos = s / window_samples - 0.5  # fractional window index at each sample
    pos = jnp.clip(pos, 0.0, jnp.maximum(n_windows.astype(jnp.float32) - 1.0, 0.0))
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max_windows - 1)
    hi = jnp.clip(lo + 1, 0, max_windows - 1)
    hi = jnp.minimum(hi, jnp.maximum(n_windows - 1, 0))
    frac = pos - lo.astype(jnp.float32)
    envelope = sm[lo] * (1.0 - frac) + sm[hi] * frac

    x1 = jnp.where(apply_windowed, x * envelope, x)

    # --- Pass 2: global RMS normalization to target ------------------------
    rms = jnp.sqrt(jnp.sum(x1 * x1) / jnp.maximum(n_f, 1.0))
    current_rms_db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-30))
    gain_db = target_rms_db - current_rms_db
    gain_linear = 10.0 ** (gain_db / 20.0)
    x2 = jnp.where(rms > 1e-8, x1 * gain_linear, x1)

    # --- Pass 3: tanh soft clip -------------------------------------------
    max_amplitude = 0.95
    x3 = jnp.tanh(x2 / max_amplitude) * max_amplitude

    out = jnp.where(silent, x, x3)
    return jnp.where(valid, out, 0.0)


@partial(jax.jit, static_argnames=("window_samples", "max_windows", "capacity"))
def _loudness_core(
    buf: jnp.ndarray,
    length: jnp.ndarray,
    window_samples: int,
    max_windows: int,
    capacity: int,
    target_rms_db: float,
    max_gain_db: float,
):
    """Fused decay-correction + global RMS normalization + tanh soft clip.

    Operates on a zero-padded buffer with ``length`` valid samples; padding
    stays exactly zero on output.
    """
    return _loudness_masked(
        buf, length, window_samples, max_windows, capacity, target_rms_db, max_gain_db
    )


def loudness_postprocess(
    audio,
    sample_rate: int,
    target_rms_db: float = -23.0,
    window_sec: float = 2.0,
    max_gain_db: float = 18.0,
):
    """Three-pass loudness normalization with decay correction.

    Parity: reference ``qwen.py:268-378`` — (1) per-2s-window gain envelope
    (capped at +18 dB, double 3-tap smoothed, linearly interpolated to sample
    level) correcting volume decay, skipped when the gain spread is < 0.05;
    (2) global RMS normalization to -23 dBFS; (3) tanh soft clip at 0.95.
    Silent audio (< 1e-8 RMS) is returned unchanged.
    """
    a = _as_f32_1d(audio)
    n = int(a.shape[-1])
    if n == 0:
        return a
    window_samples = int(sample_rate * window_sec)
    capacity = bucket_size(n)
    # max_windows must cover capacity and be >= 1
    max_windows = max(capacity // window_samples, 1)
    # Guarantee the reshape in the core covers every valid sample window.
    capacity = max(capacity, max_windows * window_samples)
    buf = _pad_to(a, capacity)
    out = _loudness_core(
        buf,
        jnp.int32(n),
        window_samples,
        max_windows,
        int(buf.shape[-1]),
        float(target_rms_db),
        float(max_gain_db),
    )
    return out[:n]


# ---------------------------------------------------------------------------
# Fused finalize (one device program, one host sync)
# ---------------------------------------------------------------------------


def _masked_trim_bounds(buf, length, threshold, window, stride, capacity,
                        from_start: bool, from_end: bool):
    """Traced trim bounds on a masked buffer → (start, end) sample indices.

    Same math as ``_trim_bounds_core`` + the host-side bound arithmetic of
    ``trim_silence`` (silent input keeps the first window)."""
    padding = window // 2
    x2 = buf * buf
    padded = jnp.pad(x2, (padding, window))
    n_windows_max = (capacity + 2 * padding - window) // stride + 1
    sums = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add,
        window_dimensions=(window,), window_strides=(stride,), padding="valid",
    )[:n_windows_max]
    energy = jnp.sqrt(sums / window)
    n_windows = jnp.maximum((length + 2 * padding - window) // stride + 1, 0)
    widx = jnp.arange(energy.shape[0])
    non_silent = (energy > threshold) & (widx < n_windows)
    any_ns = jnp.any(non_silent)
    first = jnp.argmax(non_silent)
    last = energy.shape[0] - 1 - jnp.argmax(non_silent[::-1])
    start = first * window // 2 if from_start else jnp.int32(0)
    end = (last + 2) * window // 2 if from_end else length
    start = jnp.where(any_ns, start, 0)
    end = jnp.where(any_ns, end, jnp.int32(window))
    start = jnp.clip(start, 0, length)
    end = jnp.clip(end, start, length)
    return start.astype(jnp.int32), end.astype(jnp.int32)


def _masked_shift_dc(buf, start, new_len, capacity):
    """Slice [start, start+new_len) to offset 0, zero the rest, remove DC."""
    shifted = jax.lax.dynamic_slice(
        jnp.pad(buf, (0, capacity)), (start.astype(jnp.int32),), (capacity,)
    )
    idx = jnp.arange(capacity)
    valid = idx < new_len
    x = jnp.where(valid, shifted, 0.0)
    mean = jnp.sum(x) / jnp.maximum(new_len.astype(jnp.float32), 1.0)
    return jnp.where(valid, x - mean, 0.0)


def _masked_fades(x, new_len, fade_samples: int):
    """Raised-cosine fades over the valid region (skip when too short)."""
    if fade_samples < 1:
        return x
    idx = jnp.arange(x.shape[-1])
    valid = idx < new_len
    theta_in = idx.astype(jnp.float32) * (np.pi / max(fade_samples - 1, 1))
    gain_in = jnp.where(idx < fade_samples, 0.5 * (1.0 - jnp.cos(theta_in)), 1.0)
    pos_out = (idx - (new_len - fade_samples)).astype(jnp.float32)
    theta_out = pos_out * (np.pi / max(fade_samples - 1, 1))
    gain_out = jnp.where(
        (idx >= new_len - fade_samples) & valid, 0.5 * (1.0 + jnp.cos(theta_out)), 1.0
    )
    return jnp.where(new_len >= 2 * fade_samples, x * gain_in * gain_out, x)


def _masked_decay_ratio(x, new_len):
    idx = jnp.arange(x.shape[-1])
    valid = idx < new_len
    third = new_len // 3
    denom = jnp.maximum(third.astype(jnp.float32), 1.0)
    first_rms = jnp.sqrt(jnp.sum(jnp.where(idx < third, x * x, 0.0)) / denom)
    last_rms = jnp.sqrt(
        jnp.sum(jnp.where((idx >= new_len - third) & valid, x * x, 0.0)) / denom
    )
    return jnp.where(
        (third < 1) | (first_rms < 1e-8), 1.0, last_rms / jnp.maximum(first_rms, 1e-12)
    )


@partial(
    jax.jit,
    static_argnames=(
        "window",
        "stride",
        "fade_samples",
        "window_samples",
        "max_windows",
        "capacity",
        "trim",
        "loudness",
    ),
)
def _finalize_core(
    buf: jnp.ndarray,
    length: jnp.ndarray,
    threshold: jnp.ndarray,
    window: int,
    stride: int,
    fade_samples: int,
    window_samples: int,
    max_windows: int,
    capacity: int,
    trim: bool,
    loudness: bool,
    target_rms_db: float,
    max_gain_db: float,
):
    """Trim → DC removal → fades → (loudness) → decay ratio, fully fused.

    Numerically identical to composing the individual ops (each stage is
    the same masked math); exists so the common one-segment-per-item path
    costs ONE dispatch + ONE host fetch instead of ~10 relay round-trips.
    Returns (out_buffer, new_length, decay_ratio).
    """
    if trim:
        start, end = _masked_trim_bounds(
            buf, length, threshold, window, stride, capacity,
            from_start=True, from_end=True,
        )
    else:
        start = jnp.int32(0)
        end = length

    new_len = (end - start).astype(jnp.int32)
    x = _masked_shift_dc(buf, start, new_len, capacity)
    x = _masked_fades(x, new_len, fade_samples)

    if loudness:
        x = _loudness_masked(
            x, new_len, window_samples, max_windows, capacity, target_rms_db, max_gain_db
        )

    ratio = _masked_decay_ratio(x, new_len)
    return x, new_len, ratio


def finalize_segment(
    audio,
    sample_rate: int,
    trim: bool = True,
    silence_threshold_db: float = -50.0,
    fade_duration_sec: float = 0.02,
    loudness: bool = False,
    target_rms_db: float = -23.0,
    loudness_window_sec: float = 2.0,
    max_gain_db: float = 18.0,
    defer_fetch: bool = False,
):
    """Single-segment finalize chain in one fused program.

    Equivalent to ``smooth_segment_join([audio])`` (+ optional
    ``loudness_postprocess``) followed by ``sound_decay_ratio``, but with a
    single dispatch. Returns (waveform, decay_ratio); with
    ``defer_fetch=True`` returns device-resident (padded_out, meta) where
    meta = [valid_length, decay_ratio] — callers batching many items fetch
    all metas in ONE transfer.
    """
    a = _as_f32_1d(audio)
    n = int(a.shape[-1])
    if n == 0:
        if defer_fetch:
            return a, jnp.asarray([0.0, 1.0], jnp.float32)
        return a, 1.0
    window = int(sample_rate * 0.01)
    stride = max(window // 2, 1)
    if window < 2:
        trim = False
        window, stride = 2, 1
    fade_samples = int(sample_rate * fade_duration_sec)
    window_samples = int(sample_rate * loudness_window_sec)
    capacity = bucket_size(n)
    max_windows = max(capacity // window_samples, 1)
    capacity = max(capacity, max_windows * window_samples)
    buf = _pad_to(a, capacity)
    out, new_len, ratio = _finalize_core(
        buf,
        jnp.int32(n),
        jnp.float32(10.0 ** (silence_threshold_db / 20.0)),
        window,
        stride,
        fade_samples,
        window_samples,
        max_windows,
        int(buf.shape[-1]),
        bool(trim),
        bool(loudness),
        float(target_rms_db),
        float(max_gain_db),
    )
    if defer_fetch:
        return out, jnp.stack([new_len.astype(jnp.float32), ratio])
    # One packed host fetch for both scalars (each fetch is a full relay
    # round-trip on tunneled backends).
    meta = np.asarray(jnp.stack([new_len.astype(jnp.float32), ratio]))
    return out[: int(meta[0])], float(meta[1])


# ---------------------------------------------------------------------------
# Fused multi-segment finalize: trim/DC per segment → crossfade-concat →
# fades → (loudness) → decay, all ONE device program + ONE host sync.
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "window", "stride", "cf", "pause_samples", "fade_samples",
        "window_samples", "max_windows", "cap", "total_cap", "trim",
        "loudness",
    ),
)
def _finalize_join_core(
    segs: jnp.ndarray,  # (K, cap) zero-padded segments
    lengths: jnp.ndarray,  # (K,) true lengths
    threshold: jnp.ndarray,
    window: int,
    stride: int,
    cf: int,  # crossfade samples
    pause_samples: int,
    fade_samples: int,
    window_samples: int,
    max_windows: int,
    cap: int,
    total_cap: int,
    trim: bool,
    loudness: bool,
    target_rms_db: float,
    max_gain_db: float,
):
    """Fused N-segment join; piece semantics match ``smooth_segment_join``
    exactly (golden-tested): boundary-aware trims, equal-power crossfades
    skipped at overlap <= 10, tail hold-back on interior segments, pauses
    between interior joins, then global fades (+ loudness) and the decay
    ratio. Kills the per-segment host round-trips of the sequential chain
    (BASELINE.md config 1: 554 ms for a 2-segment join vs 83 ms fused
    single-segment).
    """
    k_segs = segs.shape[0]
    idx = jnp.arange(cap)

    # Per-segment trim + DC removal (boundary-position-aware)
    xs, lens = [], []
    for k in range(k_segs):
        buf, length = segs[k], lengths[k]
        if trim:
            start, end = _masked_trim_bounds(
                buf, length, threshold, window, stride, cap,
                from_start=(k > 0), from_end=(k < k_segs - 1),
            )
        else:
            start, end = jnp.int32(0), length
        new_len = (end - start).astype(jnp.int32)
        xs.append(_masked_shift_dc(buf, start, new_len, cap))
        lens.append(new_len)

    # Piece list: (masked buffer, true length) in emit order
    pieces = []
    emit0 = jnp.where(lens[0] > cf, lens[0] - cf, lens[0])
    pieces.append((jnp.where(idx < emit0, xs[0], 0.0), emit0))
    cfi = jnp.arange(cf)
    for k in range(1, k_segs):
        prev, lp = xs[k - 1], lens[k - 1]
        curr, lc = xs[k], lens[k]
        ov = jnp.minimum(jnp.minimum(jnp.int32(cf), lp), lc)
        use = ov > 10

        # Equal-power crossfade of prev's tail with curr's head
        theta = cfi.astype(jnp.float32) * (
            (np.pi / 2.0) / jnp.maximum(ov.astype(jnp.float32) - 1.0, 1.0)
        )
        prev_tail = jnp.take(prev, lp - ov + cfi, mode="clip")
        curr_head = curr[:cf]
        mixed = prev_tail * jnp.cos(theta) + curr_head * jnp.cos(np.pi / 2.0 - theta)
        cf_len = jnp.where(use, ov, 0)
        pieces.append((jnp.where(cfi < cf_len, mixed, 0.0), cf_len))

        # Remaining body of curr (head consumed by the crossfade; interior
        # segments hold back cf tail samples for the NEXT crossfade)
        start = jnp.where(use, ov, 0)
        if k < k_segs - 1:
            tail_hold = jnp.where(use & (lc > ov + cf), cf, 0)
        else:
            tail_hold = jnp.int32(0)
        rem_len = jnp.maximum(jnp.where(use, lc - ov - tail_hold, lc), 0)
        rem = jax.lax.dynamic_slice(jnp.pad(curr, (0, cap)), (start,), (cap,))
        pieces.append((jnp.where(idx < rem_len, rem, 0.0), rem_len))

        if pause_samples > 0 and k < k_segs - 1:
            pieces.append(
                (jnp.zeros((pause_samples,), jnp.float32), jnp.where(use, pause_samples, 0))
            )

    # Assemble at running offsets (additive writes; buffers are masked)
    out = jnp.zeros((total_cap,), jnp.float32)
    offset = jnp.int32(0)
    for buf, plen in pieces:
        out = out + jax.lax.dynamic_update_slice(
            jnp.zeros((total_cap,), jnp.float32), buf, (offset,)
        )
        offset = offset + plen

    total_len = offset
    out = _masked_fades(out, total_len, fade_samples)
    if loudness:
        out = _loudness_masked(
            out, total_len, window_samples, max_windows, total_cap,
            target_rms_db, max_gain_db,
        )
    ratio = _masked_decay_ratio(out, total_len)
    return out, total_len, ratio


def finalize_segments(
    segments: List,
    sample_rate: int,
    crossfade_duration_sec: float = 0.05,
    inter_sentence_pause_sec: float = 0.1,
    trim: bool = True,
    silence_threshold_db: float = -50.0,
    fade_duration_sec: float = 0.02,
    loudness: bool = False,
    target_rms_db: float = -23.0,
    loudness_window_sec: float = 2.0,
    max_gain_db: float = 18.0,
    defer_fetch: bool = False,
):
    """Fused finalize for ANY segment count: equivalent to
    ``smooth_segment_join(segments)`` (+ optional ``loudness_postprocess``)
    followed by ``sound_decay_ratio``, in one device program.

    Returns (waveform, decay_ratio); (None, 1.0) for an empty list. With
    ``defer_fetch=True`` returns device-resident (padded_out, meta) —
    see :func:`finalize_segment`.
    """
    if len(segments) == 0:
        return None, 1.0
    if len(segments) == 1:
        return finalize_segment(
            segments[0], sample_rate, trim=trim,
            silence_threshold_db=silence_threshold_db,
            fade_duration_sec=fade_duration_sec, loudness=loudness,
            target_rms_db=target_rms_db, loudness_window_sec=loudness_window_sec,
            max_gain_db=max_gain_db, defer_fetch=defer_fetch,
        )

    arrs = [_as_f32_1d(s) for s in segments]
    lens = [int(a.shape[-1]) for a in arrs]
    k = len(arrs)
    cap = bucket_size(max(max(lens), 1))
    segs = jnp.stack([_pad_to(a, cap) for a in arrs])

    window = int(sample_rate * 0.01)
    stride = max(window // 2, 1)
    if window < 2:
        trim = False
        window, stride = 2, 1
    cf = int(sample_rate * crossfade_duration_sec)
    pause_samples = int(sample_rate * inter_sentence_pause_sec)
    fade_samples = int(sample_rate * fade_duration_sec)
    window_samples = int(sample_rate * loudness_window_sec)

    # Output capacity: every piece write (cap-sized) must fit at its offset.
    total_cap = bucket_size(k * cap + (k - 1) * (cf + pause_samples) + cap)
    max_windows = max(total_cap // window_samples, 1)
    total_cap = max(total_cap, max_windows * window_samples)

    out, total_len, ratio = _finalize_join_core(
        segs,
        jnp.asarray(lens, jnp.int32),
        jnp.float32(10.0 ** (silence_threshold_db / 20.0)),
        window,
        stride,
        cf,
        pause_samples,
        fade_samples,
        window_samples,
        max_windows,
        cap,
        int(total_cap),
        bool(trim),
        bool(loudness),
        float(target_rms_db),
        float(max_gain_db),
    )
    if defer_fetch:
        return out, jnp.stack([total_len.astype(jnp.float32), ratio])
    meta = np.asarray(jnp.stack([total_len.astype(jnp.float32), ratio]))
    return out[: int(meta[0])], float(meta[1])


# ---------------------------------------------------------------------------
# Streaming (causal) loudness for chunked synthesis
# ---------------------------------------------------------------------------


@jax.jit
def _chunk_stats(chunk):
    """One tiny fetch per chunk: (sum of squares, sample count)."""
    c = chunk.astype(jnp.float32)
    return jnp.stack([jnp.sum(c * c), jnp.float32(c.shape[-1])])


@jax.jit
def _apply_gain_clip(chunk, gain):
    c = chunk.astype(jnp.float32) * gain
    # same soft clip as loudness_postprocess pass 3
    return jnp.where(jnp.abs(c) > 0.95, jnp.tanh(c / 0.95) * 0.95, c)


class StreamingLoudness:
    """Causal loudness normalization for chunked streaming synthesis.

    The one-shot :func:`loudness_postprocess` (reference parity,
    ``src/rho_tts/providers/qwen.py:268-378``) is global — it sees the whole
    utterance before computing the gain envelope. A stream cannot, so this
    applies per-chunk gain toward the same -23 dBFS target computed from
    the *running* RMS of all audio seen so far (the first chunk uses its
    own RMS), slew-limited between chunks to avoid audible gain steps, and
    finishes with the same 0.95 tanh soft clip. Only an 8-byte statistic
    crosses device→host per chunk; audio stays on device.
    """

    def __init__(
        self,
        target_rms_db: float = -23.0,
        max_gain_db: float = 18.0,
        max_step_db: float = 3.0,
    ):
        self._target = 10.0 ** (target_rms_db / 20.0)
        self._max_gain = 10.0 ** (max_gain_db / 20.0)
        self._max_step = 10.0 ** (max_step_db / 20.0)
        self._sumsq = 0.0
        self._count = 0.0
        self._last_gain = None

    def process(self, chunk):
        """Device waveform chunk → gain-corrected, soft-clipped chunk."""
        stats = np.asarray(_chunk_stats(chunk))
        self._sumsq += float(stats[0])
        self._count += float(stats[1])
        rms = (self._sumsq / max(self._count, 1.0)) ** 0.5
        if rms < 1e-8:
            return chunk
        gain = min(self._target / rms, self._max_gain)
        if self._last_gain is not None:
            lo, hi = self._last_gain / self._max_step, self._last_gain * self._max_step
            gain = min(max(gain, lo), hi)
        self._last_gain = gain
        return _apply_gain_clip(chunk, jnp.float32(gain))
