"""Dedicated suite for the unified generate() surface — file vs in-memory
modes and result metadata.

Parity: reference ``tests/test_synthesize.py`` (file mode, list mode,
in-memory mode, metadata, format validation). Streaming/async variants live
in test_pipeline.py.
"""

import os

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, FormatConversionError, GenerationResult

SR = 16000


class SineTTS(BaseTTS):
    """Returns one second of 440 Hz sine (survives silence trimming)."""

    def __init__(self, **kwargs):
        super().__init__(device="cpu", **kwargs)
        self.max_chars_per_segment = 80
        self._max_chars_explicit = True

    def _generate_audio(self, text, **kwargs):
        t = np.arange(SR) / SR
        return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    @property
    def sample_rate(self):
        return SR


# -- File mode ---------------------------------------------------------------


def test_single_text_saves_and_returns_result(tmp_path):
    tts = SineTTS()
    path = str(tmp_path / "out.wav")
    result = tts.generate("Hello world", path)
    assert isinstance(result, GenerationResult)
    assert result.path == path
    assert result.audio is not None
    assert result.sample_rate == SR
    assert result.duration_sec > 0
    assert result.segments_count >= 1
    assert result.format == "wav"
    assert os.path.exists(path)


def test_list_texts_returns_list_of_results(tmp_path):
    tts = SineTTS()
    base = str(tmp_path / "out")
    results = tts.generate(["Hello", "World"], base)
    assert isinstance(results, list)
    assert len(results) == 2
    for r in results:
        assert isinstance(r, GenerationResult)
        assert r.audio is not None
        assert r.path and os.path.exists(r.path)


# -- In-memory mode ------------------------------------------------------------


def test_no_output_path_returns_audio_only():
    tts = SineTTS()
    result = tts.generate("Hello world")
    assert result.path is None
    assert result.audio is not None
    assert result.sample_rate == SR
    assert result.duration_sec > 0


def test_list_in_memory():
    tts = SineTTS()
    results = tts.generate(["Hello", "World"])
    assert isinstance(results, list)
    assert len(results) == 2
    for r in results:
        assert r.path is None
        assert r.audio is not None


def test_in_memory_audio_is_host_fetchable():
    tts = SineTTS()
    result = tts.generate("Hello")
    arr = result.numpy()
    assert isinstance(arr, np.ndarray)
    assert arr.ndim == 1
    assert arr.size > 0
    assert np.isfinite(arr).all()


# -- Metadata ------------------------------------------------------------------


def test_duration_matches_audio_length():
    tts = SineTTS()
    result = tts.generate("Hello")
    arr = result.numpy()
    assert result.duration_sec == pytest.approx(arr.size / SR, rel=1e-3)


def test_segments_count_multi_segment():
    tts = SineTTS()
    text = "First sentence here. " * 8  # > max_chars_per_segment → multiple segments
    result = tts.generate(text)
    assert result.segments_count > 1


# -- Format validation ---------------------------------------------------------


def test_unsupported_format_raises():
    tts = SineTTS()
    with pytest.raises(FormatConversionError, match="[Uu]nsupported"):
        tts.generate("Hello", format="aac")


def test_format_recorded_in_result(tmp_path):
    tts = SineTTS()
    path = str(tmp_path / "clip.wav")
    result = tts.generate("Hello", path, format="wav")
    assert result.format == "wav"
