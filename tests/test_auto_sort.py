"""Auto-sort: route validated clips into good/bad training folders."""

import os
from unittest.mock import patch

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS

SR = 8000


class FakeTTS(BaseTTS):
    def __init__(self, **kw):
        super().__init__(device="cpu", **kw)
        self.max_chars_per_segment = 100
        self._max_chars_explicit = True

    def _generate_audio(self, text, **kw):
        t = np.arange(SR // 2) / SR
        return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    @property
    def sample_rate(self):
        return SR


@pytest.fixture
def tts(tmp_path):
    t = FakeTTS()
    t.auto_sort_good_dir = str(tmp_path / "good")
    t.auto_sort_bad_dir = str(tmp_path / "bad")
    t.auto_sort_good_threshold = 0.1
    t.auto_sort_bad_threshold = 0.5
    return t


def wavs_in(d):
    return [] if not os.path.isdir(d) else [f for f in os.listdir(d) if f.endswith(".wav")]


def test_low_drift_goes_to_good(tts):
    tts._auto_sort_audio(np.zeros(100, np.float32), drift_prob=0.05)
    assert len(wavs_in(tts.auto_sort_good_dir)) == 1
    assert len(wavs_in(tts.auto_sort_bad_dir)) == 0


def test_high_drift_goes_to_bad(tts):
    tts._auto_sort_audio(np.zeros(100, np.float32), drift_prob=0.9)
    assert len(wavs_in(tts.auto_sort_good_dir)) == 0
    assert len(wavs_in(tts.auto_sort_bad_dir)) == 1


def test_middle_zone_skipped(tts):
    tts._auto_sort_audio(np.zeros(100, np.float32), drift_prob=0.3)
    assert len(wavs_in(tts.auto_sort_good_dir)) == 0
    assert len(wavs_in(tts.auto_sort_bad_dir)) == 0


def test_noop_without_dirs():
    t = FakeTTS()
    t._auto_sort_audio(np.zeros(10, np.float32), drift_prob=0.0)  # must not raise


def test_dirs_created_on_demand(tts):
    assert not os.path.isdir(tts.auto_sort_good_dir)
    tts._auto_sort_audio(np.zeros(100, np.float32), drift_prob=0.0)
    assert os.path.isdir(tts.auto_sort_good_dir)


def test_pipeline_runs_drift_for_auto_sort_even_without_retries(tts):
    """max_iterations == 1 normally skips validation, but auto-sort still
    needs a drift score (parity: reference base_tts.py:799-819)."""
    tts.max_iterations = 1
    with patch.object(tts, "_validate_accent_drift", return_value=(0.01, True)) as drift:
        result = tts.generate("Hello there")
    assert result is not None
    drift.assert_called()
    assert len(wavs_in(tts.auto_sort_good_dir)) == 1


def test_pipeline_auto_sort_in_validation_loop(tts):
    tts.max_iterations = 2
    tts.voice_cloning = True
    with patch.object(tts, "_validate_accent_drift", return_value=(0.9, False)), patch.object(
        tts, "_validate_text_match", return_value=(True, 1.0, None)
    ):
        tts.generate("Hello there")
    assert len(wavs_in(tts.auto_sort_bad_dir)) == 2  # one per iteration
