"""Smart segmentation: char cap from model limit and free memory."""

from unittest.mock import patch

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS


class FakeTTS(BaseTTS):
    MAX_MODEL_CHARS = 3000
    BYTES_PER_CHAR_ESTIMATE = 500_000

    def __init__(self, **kw):
        super().__init__(device="cpu", **kw)

    def _generate_audio(self, text, **kw):
        return np.zeros(100, np.float32)

    @property
    def sample_rate(self):
        return 8000


def test_explicit_max_chars_wins():
    tts = FakeTTS()
    tts._max_chars_explicit = True
    tts.max_chars_per_segment = 123
    assert tts._compute_max_chars() == 123


def test_cap_is_80_percent_of_memory_estimate():
    tts = FakeTTS()
    # 1 GB free → 1e9/5e5 = 2000 chars → * 0.8 = 1600
    with patch.object(tts, "_get_available_memory_bytes", return_value=10**9):
        assert tts._compute_max_chars() == 1600


def test_model_limit_clamps_large_memory():
    tts = FakeTTS()
    with patch.object(tts, "_get_available_memory_bytes", return_value=10**12):
        assert tts._compute_max_chars() == int(3000 * 0.8)


def test_floor_200():
    tts = FakeTTS()
    with patch.object(tts, "_get_available_memory_bytes", return_value=10**7):
        assert tts._compute_max_chars() == 200


def test_model_max_refinement_respected():
    tts = FakeTTS()
    tts._max_model_chars = 512  # e.g. refined from checkpoint config
    with patch.object(tts, "_get_available_memory_bytes", return_value=10**12):
        assert tts._compute_max_chars() == int(512 * 0.8)


def test_hbm_introspection_used_on_tpu_device():
    tts = FakeTTS()
    tts.device = "tpu"

    class Dev:
        def memory_stats(self):
            return {"bytes_limit": 16 * 1024**3, "bytes_in_use": 6 * 1024**3}

    with patch("jax.local_devices", return_value=[Dev()]):
        free = tts._get_available_memory_bytes()
    assert free == 10 * 1024**3


def test_cpu_falls_back_to_host_memory():
    tts = FakeTTS()
    tts.device = "cpu"
    assert tts._get_available_memory_bytes() > 0
