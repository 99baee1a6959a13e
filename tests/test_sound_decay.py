"""Sound-decay validation + windowed decay correction on synthetic audio."""

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS
from rho_tts_tpu.ops import dsp

SR = 24000


class FakeTTS(BaseTTS):
    def __init__(self, **kw):
        super().__init__(device="cpu", **kw)

    def _generate_audio(self, text, **kw):
        return np.zeros(100, np.float32)

    @property
    def sample_rate(self):
        return SR


def decaying(rate, dur=3.0):
    t = np.arange(int(SR * dur)) / SR
    return (np.sin(2 * np.pi * 220 * t) * np.exp(-rate * t)).astype(np.float32)


class TestValidateSoundDecay:
    def test_steady_passes(self):
        tts = FakeTTS()
        ratio, ok = tts._validate_sound_decay(decaying(0.0))
        assert ok
        assert ratio == pytest.approx(1.0, abs=0.05)

    def test_strong_decay_fails(self):
        tts = FakeTTS()
        ratio, ok = tts._validate_sound_decay(decaying(3.0))
        assert not ok
        assert ratio < 0.3

    def test_threshold_configurable(self):
        tts = FakeTTS()
        tts.sound_decay_threshold = 0.05
        _, ok = tts._validate_sound_decay(decaying(1.0))
        assert ok  # permissive threshold accepts the mild decay

    def test_empty_audio_passes(self):
        tts = FakeTTS()
        ratio, ok = tts._validate_sound_decay(np.zeros(0, np.float32))
        assert ok and ratio == 1.0


class TestWindowedNormalization:
    def test_decay_corrected(self):
        x = decaying(0.5, dur=8.0)
        out = np.asarray(dsp.loudness_postprocess(x, SR))
        # After correction + normalization the decay ratio improves a lot
        before = dsp.sound_decay_ratio(x)
        after = dsp.sound_decay_ratio(out)
        assert after > 4 * before  # 18 dB gain cap bounds full recovery
        assert after > 0.3

    def test_short_audio_global_only(self):
        x = decaying(0.5, dur=1.0)  # < 2 windows of 2 s
        out = np.asarray(dsp.loudness_postprocess(x, SR))
        # Global normalization applies but no windowed correction
        assert dsp.sound_decay_ratio(out) == pytest.approx(dsp.sound_decay_ratio(x), rel=0.05)

    def test_gain_capped_at_18db(self):
        # Extremely decayed tail: gain cap prevents noise blow-up
        t = np.arange(SR * 6) / SR
        x = (np.sin(2 * np.pi * 220 * t) * np.exp(-2.0 * t)).astype(np.float32)
        out = np.asarray(dsp.loudness_postprocess(x, SR))
        assert np.abs(out).max() <= 0.9501  # soft clip bound
