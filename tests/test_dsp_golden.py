"""Golden tests: JAX DSP ops vs the reference's torch CPU math.

Each oracle below reproduces the reference CPU computation (torch ops, same
parameters) so the JAX implementations can be checked numerically. The
north-star requires DSP parity with the reference CPU path; tolerances are
a few float32 ulps (cos/sqrt differ by <=1 ulp across backends).
"""

import numpy as np
import pytest
import torch

from rho_tts_tpu.ops import dsp

SR = 24000


# ---------------------------------------------------------------------------
# Torch oracles (reference CPU math)
# ---------------------------------------------------------------------------


def torch_trim(audio_np, sr=SR, threshold_db=-50.0, from_start=True, from_end=True):
    audio = torch.from_numpy(audio_np).unsqueeze(0)
    window = int(sr * 0.01)
    threshold = 10 ** (threshold_db / 20)
    energy = torch.sqrt(
        torch.nn.functional.avg_pool1d(
            audio**2, kernel_size=window, stride=window // 2, padding=window // 2
        ).mean(dim=0)
    )
    non_silent = energy > threshold
    if not non_silent.any():
        return audio[:, :window].squeeze(0).numpy()
    nz = non_silent.nonzero(as_tuple=True)[0]
    first, last = nz[0].item(), nz[-1].item()
    n = audio.shape[-1]
    start = (first * window // 2) if from_start else 0
    end = ((last + 2) * window // 2) if from_end else n
    start = max(0, min(start, n))
    end = max(start, min(end, n))
    return audio[:, start:end].squeeze(0).numpy()


def torch_fades(audio_np, sr=SR, fade_sec=0.02, fade_in=True, fade_out=True):
    audio = torch.from_numpy(audio_np.copy())
    fs = int(sr * fade_sec)
    if audio.shape[-1] < fs * 2:
        return audio.numpy()
    if fade_in:
        curve = 0.5 * (1 - torch.cos(torch.linspace(0, np.pi, fs)))
        audio[:fs] = audio[:fs] * curve
    if fade_out:
        curve = 0.5 * (1 + torch.cos(torch.linspace(0, np.pi, fs)))
        audio[-fs:] = audio[-fs:] * curve
    return audio.numpy()


def torch_crossfade_pair(prev_np, curr_np):
    overlap = prev_np.shape[-1]
    prev = torch.from_numpy(prev_np)
    curr = torch.from_numpy(curr_np)
    fade_out = torch.cos(torch.linspace(0, np.pi / 2, overlap))
    fade_in = torch.cos(torch.linspace(np.pi / 2, 0, overlap))
    return (prev * fade_out + curr * fade_in).numpy()


def torch_loudness(audio_np, sr=SR, target_rms_db=-23.0, window_sec=2.0, max_gain_db=18.0):
    audio = torch.from_numpy(audio_np.copy())
    overall_rms = torch.sqrt(torch.mean(audio**2))
    if overall_rms < 1e-8:
        return audio.numpy()
    n = audio.shape[0]
    ws = int(sr * window_sec)
    if n > ws * 2:
        nw = n // ws
        if nw >= 2:
            rms_list = [
                torch.sqrt(torch.mean(audio[i * ws : (i + 1) * ws] ** 2)).item()
                for i in range(nw)
            ]
            ref = rms_list[0]
            if ref >= 1e-8:
                cap = 10 ** (max_gain_db / 20)
                gains = [1.0 if r < 1e-8 else min(ref / r, cap) for r in rms_list]
                if max(gains) - min(gains) >= 0.05:
                    sm = list(gains)
                    for _ in range(2):
                        new = list(sm)
                        for i in range(1, len(sm) - 1):
                            new[i] = (sm[i - 1] + sm[i] + sm[i + 1]) / 3
                        sm = new
                    centers = np.array([(i + 0.5) * ws for i in range(nw)])
                    env = np.interp(np.arange(n, dtype=np.float64), centers, sm)
                    audio = audio * torch.from_numpy(env).float()
    rms = torch.sqrt(torch.mean(audio**2))
    if rms > 1e-8:
        gain_db = target_rms_db - (20 * torch.log10(rms)).item()
        audio = audio * (10 ** (gain_db / 20))
    return (torch.tanh(audio / 0.95) * 0.95).numpy()


# ---------------------------------------------------------------------------
# Signals
# ---------------------------------------------------------------------------


def speechlike(duration=1.0, sr=SR, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * duration)) / sr
    sig = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t + 0.3)
        + 0.05 * rng.standard_normal(t.size)
    )
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    return (sig * envelope).astype(np.float32)


def with_silence(core, sr=SR, lead=0.2, tail=0.3):
    return np.concatenate(
        [np.zeros(int(sr * lead), np.float32), core, np.zeros(int(sr * tail), np.float32)]
    )


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


class TestTrimSilence:
    @pytest.mark.parametrize("from_start,from_end", [(True, True), (True, False), (False, True)])
    def test_matches_torch(self, from_start, from_end):
        x = with_silence(speechlike(0.5))
        ours = np.asarray(dsp.trim_silence(x, SR, from_start=from_start, from_end=from_end))
        ref = torch_trim(x, from_start=from_start, from_end=from_end)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)

    def test_all_silent_returns_first_window(self):
        x = np.zeros(SR, np.float32)
        ours = np.asarray(dsp.trim_silence(x, SR))
        assert ours.shape[-1] == int(SR * 0.01)

    def test_no_silence_unchanged_region(self):
        x = speechlike(0.5)
        ours = np.asarray(dsp.trim_silence(x, SR))
        ref = torch_trim(x)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref)

    def test_low_amplitude_threshold_sensitivity(self):
        # Signal hovering near the -50 dB threshold
        x = with_silence((3.5e-3 * np.sin(np.linspace(0, 600 * np.pi, 12000))).astype(np.float32))
        ours = np.asarray(dsp.trim_silence(x, SR))
        ref = torch_trim(x)
        assert ours.shape == ref.shape


class TestDCOffset:
    def test_matches_torch(self):
        x = speechlike(0.3) + 0.123
        ours = np.asarray(dsp.remove_dc_offset(x))
        ref = (torch.from_numpy(x) - torch.from_numpy(x).mean()).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        assert abs(ours.mean()) < 1e-5


class TestFades:
    @pytest.mark.parametrize("fade_in,fade_out", [(True, True), (True, False), (False, True)])
    def test_matches_torch(self, fade_in, fade_out):
        x = speechlike(0.3)
        ours = np.asarray(dsp.apply_fades(x, SR, fade_in=fade_in, fade_out=fade_out))
        ref = torch_fades(x, fade_in=fade_in, fade_out=fade_out)
        np.testing.assert_allclose(ours, ref, atol=2e-7)

    def test_short_audio_unchanged(self):
        x = speechlike(0.01)  # shorter than 2 * fade
        ours = np.asarray(dsp.apply_fades(x, SR))
        np.testing.assert_allclose(ours, x)

    def test_fade_starts_at_zero(self):
        x = np.ones(SR, np.float32)
        ours = np.asarray(dsp.apply_fades(x, SR))
        assert abs(ours[0]) < 1e-6
        assert abs(ours[-1]) < 1e-6


class TestCrossfade:
    def test_pair_matches_torch(self):
        prev = speechlike(0.1, seed=1)
        curr = speechlike(0.1, seed=2)
        ours = np.asarray(dsp._crossfade_pair(dsp._as_f32_1d(prev), dsp._as_f32_1d(curr)))
        ref = torch_crossfade_pair(prev, curr)
        np.testing.assert_allclose(ours, ref, atol=2e-7)

    def test_join_single_segment(self):
        x = with_silence(speechlike(0.5))
        joined = np.asarray(dsp.smooth_segment_join([x], SR))
        # Should match trim → dc → fades chain
        expect = torch_fades(
            (lambda a: a - a.mean())(torch_trim(x))
        )
        np.testing.assert_allclose(joined, expect, atol=2e-6)

    def test_join_two_segments_structure(self):
        a = with_silence(speechlike(0.5, seed=3))
        b = with_silence(speechlike(0.5, seed=4))
        joined = np.asarray(dsp.smooth_segment_join([a, b], SR))
        # Joined length: trimmed lengths minus one crossfade overlap
        ta = torch_trim(a, from_start=False, from_end=True)
        tb = torch_trim(b, from_start=True, from_end=False)
        cf = int(SR * 0.05)
        expected_len = (ta.shape[-1] - cf) + tb.shape[-1]
        assert joined.shape[-1] == expected_len

    def test_join_three_segments_includes_pause(self):
        segs = [with_silence(speechlike(0.4, seed=s)) for s in range(3)]
        joined = np.asarray(dsp.smooth_segment_join(segs, SR))
        trims = [
            torch_trim(segs[0], from_start=False, from_end=True),
            torch_trim(segs[1], from_start=True, from_end=True),
            torch_trim(segs[2], from_start=True, from_end=False),
        ]
        cf = int(SR * 0.05)
        pause = int(SR * 0.1)
        expected_len = (
            (trims[0].shape[-1] - cf)
            + cf
            + (trims[1].shape[-1] - cf - cf)
            + pause
            + cf
            + (trims[2].shape[-1] - cf)
        )
        assert joined.shape[-1] == expected_len

    def test_join_exact_values_two_segments(self):
        """Full-value parity for the 2-segment join path."""
        a = with_silence(speechlike(0.5, seed=5))
        b = with_silence(speechlike(0.5, seed=6))
        ours = np.asarray(dsp.smooth_segment_join([a, b], SR))

        # Oracle: reference algorithm in torch
        ta = torch_trim(a, from_start=False, from_end=True)
        tb = torch_trim(b, from_start=True, from_end=False)
        ta = ta - ta.mean()
        tb = tb - tb.mean()
        cf = int(SR * 0.05)
        overlap = min(cf, ta.shape[-1], tb.shape[-1])
        part0 = ta[:-cf]
        crossfaded = torch_crossfade_pair(ta[-overlap:], tb[:overlap])
        remaining = tb[overlap:]
        ref = np.concatenate([part0, crossfaded, remaining])
        ref = torch_fades(ref.astype(np.float32))
        np.testing.assert_allclose(ours, ref, atol=5e-6)


class TestSoundDecay:
    def test_constant_signal_ratio_one(self):
        x = speechlike(0.5)
        ratio = dsp.sound_decay_ratio(np.concatenate([x, x, x]))
        assert ratio == pytest.approx(1.0, abs=0.1)

    def test_decaying_signal_detected(self):
        t = np.arange(SR) / SR
        x = (np.sin(2 * np.pi * 200 * t) * np.exp(-5 * t)).astype(np.float32)
        ratio = dsp.sound_decay_ratio(x)
        assert ratio < 0.3

    def test_matches_torch_formula(self):
        x = speechlike(1.0, seed=9)
        flat = torch.from_numpy(x)
        third = flat.shape[0] // 3
        first = torch.sqrt(torch.mean(flat[:third] ** 2)).item()
        last = torch.sqrt(torch.mean(flat[-third:] ** 2)).item()
        ref = last / first
        assert dsp.sound_decay_ratio(x) == pytest.approx(ref, rel=1e-5)

    def test_empty_and_tiny(self):
        assert dsp.sound_decay_ratio(np.zeros(0, np.float32)) == 1.0
        assert dsp.sound_decay_ratio(np.zeros(2, np.float32)) == 1.0


class TestLoudness:
    def test_matches_torch_long_decaying(self):
        # > 2 windows of 2 s → windowed path active
        t = np.arange(SR * 7) / SR
        x = (0.3 * np.sin(2 * np.pi * 220 * t) * np.exp(-0.2 * t)).astype(np.float32)
        ours = np.asarray(dsp.loudness_postprocess(x, SR))
        ref = torch_loudness(x)
        np.testing.assert_allclose(ours, ref, atol=3e-5)

    def test_matches_torch_short(self):
        # < 2 windows → only global normalize + clip
        x = speechlike(1.0, seed=11) * 0.01
        ours = np.asarray(dsp.loudness_postprocess(x, SR))
        ref = torch_loudness(x)
        np.testing.assert_allclose(ours, ref, atol=3e-6)

    def test_silent_unchanged(self):
        x = np.zeros(SR, np.float32)
        ours = np.asarray(dsp.loudness_postprocess(x, SR))
        np.testing.assert_allclose(ours, x)

    def test_uniform_signal_skips_windowed_pass(self):
        # Constant amplitude → gain range < 0.05 → no envelope applied
        t = np.arange(SR * 7) / SR
        x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        ours = np.asarray(dsp.loudness_postprocess(x, SR))
        ref = torch_loudness(x)
        np.testing.assert_allclose(ours, ref, atol=3e-6)

    def test_target_rms(self):
        x = speechlike(1.0, seed=13) * 0.001
        out = np.asarray(dsp.loudness_postprocess(x, SR)).astype(np.float64)
        rms_db = 20 * np.log10(np.sqrt(np.mean(out**2)))
        # tanh clip slightly reduces RMS below the -23 dB target
        assert -26.0 < rms_db < -21.0


class TestResample:
    def test_length(self):
        from rho_tts_tpu.ops.resample import resample

        x = speechlike(1.0)
        y = np.asarray(resample(x, SR, 16000))
        assert y.shape[-1] == int(np.ceil(16000 * x.shape[-1] / SR))

    def test_preserves_tone_frequency(self):
        from rho_tts_tpu.ops.resample import resample

        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(resample(x, SR, 16000))
        spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
        freq = np.fft.rfftfreq(y.size, 1 / 16000)[spec.argmax()]
        assert freq == pytest.approx(440, abs=2)

    def test_identity(self):
        from rho_tts_tpu.ops.resample import resample

        x = speechlike(0.2)
        y = np.asarray(resample(x, SR, SR))
        np.testing.assert_allclose(y, x)

    def test_speed_double_halves_length(self):
        from rho_tts_tpu.ops.resample import resample

        x = speechlike(1.0)
        y = np.asarray(resample(x, SR * 2, SR))
        assert y.shape[-1] == pytest.approx(x.shape[-1] / 2, abs=2)


class TestPitchShift:
    def test_octave_up_doubles_frequency(self):
        from rho_tts_tpu.ops.pitch import pitch_shift

        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        y = np.asarray(pitch_shift(x, SR, 12.0))
        assert y.shape == x.shape
        spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
        freq = np.fft.rfftfreq(y.size, 1 / SR)[spec.argmax()]
        assert freq == pytest.approx(440, abs=8)

    def test_down_shift(self):
        from rho_tts_tpu.ops.pitch import pitch_shift

        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(pitch_shift(x, SR, -12.0))
        spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
        freq = np.fft.rfftfreq(y.size, 1 / SR)[spec.argmax()]
        assert freq == pytest.approx(220, abs=8)

    def test_zero_shift_identity(self):
        from rho_tts_tpu.ops.pitch import pitch_shift

        x = speechlike(0.2)
        np.testing.assert_allclose(np.asarray(pitch_shift(x, SR, 0.0)), x)
