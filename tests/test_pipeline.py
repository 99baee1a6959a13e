"""Behavioral tests of the generation pipeline against a fake provider.

The fake returns a sine wave (which survives silence trimming); heavy model
packages are never imported.
"""

import threading
from unittest.mock import patch

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, CancellationToken, GenerationResult

SR = 8000


def make_sine(duration_sec=0.5, freq=440.0, sr=SR, amp=0.5):
    t = np.arange(int(duration_sec * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class FakeTTS(BaseTTS):
    """Minimal provider returning a fixed sine wave."""

    def __init__(self, **kwargs):
        super().__init__(device="cpu", **kwargs)
        self.max_chars_per_segment = 100
        self._max_chars_explicit = True
        self.generate_calls = 0

    def _generate_audio(self, text, **kwargs):
        self.generate_calls += 1
        return make_sine()

    @property
    def sample_rate(self):
        return SR


def test_generate_single_string_in_memory():
    tts = FakeTTS()
    result = tts.generate("Hello world")
    assert isinstance(result, GenerationResult)
    assert result.path is None
    assert result.audio is not None
    assert result.sample_rate == SR
    assert result.duration_sec > 0
    assert result.segments_count == 1


def test_generate_saves_wav(tmp_path):
    tts = FakeTTS()
    out = str(tmp_path / "out.wav")
    result = tts.generate("Hello world", out)
    assert result.path == out
    from rho_tts_tpu.audio_io import load_wav

    audio, sr = load_wav(out)
    assert sr == SR
    assert audio.size > 0


def test_generate_list_mode(tmp_path):
    tts = FakeTTS()
    base = str(tmp_path / "batch")
    results = tts.generate(["One thing", "Another thing"], base)
    assert isinstance(results, list)
    assert len(results) == 2
    assert results[0].path == f"{base}_0.wav"
    assert results[1].path == f"{base}_1.wav"


def test_unsupported_format_raises():
    from rho_tts_tpu import FormatConversionError

    tts = FakeTTS()
    with pytest.raises(FormatConversionError):
        tts.generate("Hello", format="aiff")


def test_segmentation_multiple_segments():
    tts = FakeTTS()
    tts.force_sentence_split = True
    result = tts.generate("First sentence. Second sentence. Third sentence")
    assert result.segments_count == 3
    assert tts.generate_calls == 3


def test_phonetic_mapping_applied():
    captured = []

    class CapturingTTS(FakeTTS):
        def _generate_audio(self, text, **kwargs):
            captured.append(text)
            return make_sine()

    tts = CapturingTTS(phonetic_mapping={"exocrine": "exo-crene"})
    tts.generate("the exocrine gland")
    assert captured == ["the exo-crene gland"]


def test_cancellation_before_generation():
    tts = FakeTTS()
    token = CancellationToken()
    token.cancel()
    assert tts.generate("Hello", cancellation_token=token) is None
    assert tts.generate_calls == 0


def test_cancellation_mid_generation():
    token = CancellationToken()

    class CancellingTTS(FakeTTS):
        def _generate_audio(self, text, **kwargs):
            self.generate_calls += 1
            token.cancel()  # cancel after the first segment generates
            return make_sine()

    tts = CancellingTTS()
    tts.force_sentence_split = True
    result = tts.generate("One. Two. Three", cancellation_token=token)
    assert result is None
    assert tts.generate_calls == 1


def test_oom_retry_then_success():
    class OOMOnceTTS(FakeTTS):
        def __init__(self):
            super().__init__()
            self.max_iterations = 3
            self.attempts = 0

        def _generate_audio(self, text, **kwargs):
            self.attempts += 1
            if self.attempts == 1:
                raise RuntimeError("RESOURCE EXHAUSTED: out of memory")
            return make_sine()

    tts = OOMOnceTTS()
    with patch.object(tts, "_validate_accent_drift", return_value=(0.0, True)), patch.object(
        tts, "_validate_text_match", return_value=(True, 1.0, None)
    ):
        result = tts.generate("Hello")
    assert result is not None
    assert tts.attempts == 2


def test_value_error_propagates():
    class BadConfigTTS(FakeTTS):
        def _generate_audio(self, text, **kwargs):
            raise ValueError("reference_text is required")

    tts = BadConfigTTS()
    with pytest.raises(ValueError):
        tts.generate("Hello")


def test_generic_error_retries_then_best_effort_none():
    class AlwaysFailTTS(FakeTTS):
        def __init__(self):
            super().__init__()
            self.max_iterations = 2

        def _generate_audio(self, text, **kwargs):
            self.generate_calls += 1
            raise RuntimeError("resource exhausted: hbm oom")

    tts = AlwaysFailTTS()
    result = tts.generate("Hello")
    assert result is None
    assert tts.generate_calls == 2  # retried max_iterations times


def test_validation_retry_until_pass():
    tts = FakeTTS()
    tts.max_iterations = 5
    drift_results = [(0.9, False), (0.8, False), (0.05, True)]
    with patch.object(
        tts, "_validate_accent_drift", side_effect=drift_results
    ), patch.object(tts, "_validate_text_match", return_value=(True, 1.0, None)):
        tts.voice_cloning = True
        result = tts.generate("Hello")
    assert result is not None
    assert tts.generate_calls == 3
    assert result.drift_prob == pytest.approx(0.05)


def test_validation_exhausted_returns_best_by_drift():
    best_marker = {}

    class MarkedTTS(FakeTTS):
        def _generate_audio(self, text, **kwargs):
            self.generate_calls += 1
            wav = make_sine(amp=0.1 * self.generate_calls)
            best_marker[self.generate_calls] = wav
            return wav

    tts = MarkedTTS()
    tts.max_iterations = 3
    # Second iteration has the lowest drift
    drifts = [(0.9, False), (0.3, False), (0.8, False)]
    with patch.object(tts, "_validate_accent_drift", side_effect=drifts), patch.object(
        tts, "_validate_text_match", return_value=(True, 1.0, None)
    ):
        result = tts.generate("Hello")
    assert result is not None
    assert result.drift_prob == pytest.approx(0.3)


def test_text_validation_failure_retries():
    tts = FakeTTS()
    tts.max_iterations = 3
    text_results = [(False, 0.2, "wrong words"), (True, 0.95, "hello")]
    with patch.object(
        tts, "_validate_accent_drift", return_value=(0.0, True)
    ), patch.object(tts, "_validate_text_match", side_effect=text_results):
        result = tts.generate("Hello")
    assert result is not None
    assert tts.generate_calls == 2
    assert result.text_similarity == pytest.approx(0.95)


def test_decay_retry_loop():
    tts = FakeTTS()
    tts.max_decay_retries = 3
    decay_results = [(0.1, False), (0.1, False), (0.9, True)]
    with patch.object(tts, "_validate_sound_decay", side_effect=decay_results):
        result = tts.generate("Hello")
    assert result is not None
    assert tts.generate_calls == 3
    assert result.decay_ratio == pytest.approx(0.9)


def test_decay_persisted_returns_best_available():
    tts = FakeTTS()
    tts.max_decay_retries = 2
    with patch.object(tts, "_validate_sound_decay", return_value=(0.05, False)):
        result = tts.generate("Hello")
    assert result is not None
    assert result.decay_ratio == pytest.approx(0.05)
    assert tts.generate_calls == 2


def test_progress_callback_invoked():
    tts = FakeTTS()
    tts.force_sentence_split = True
    messages = []
    tts.generate("One. Two", progress_callback=messages.append)
    assert any("segment 1/2" in m for m in messages)
    assert any("segment 2/2" in m for m in messages)


def test_metadata_aggregation_worst_case():
    tts = FakeTTS()
    tts.force_sentence_split = True
    tts.max_iterations = 2
    # Two segments; drift per segment: 0.1 then 0.4 → max = 0.4
    # similarity per segment: 0.99 then 0.9 → min = 0.9
    drifts = [(0.1, True), (0.4, True)]
    sims = [(True, 0.99, None), (True, 0.9, None)]
    with patch.object(tts, "_validate_accent_drift", side_effect=drifts), patch.object(
        tts, "_validate_text_match", side_effect=sims
    ):
        result = tts.generate("One. Two")
    assert result.drift_prob == pytest.approx(0.4)
    assert result.text_similarity == pytest.approx(0.9)


def test_speed_changes_duration():
    tts = FakeTTS()
    normal = tts.generate("Hello")
    fast = tts.generate("Hello", speed=2.0)
    assert fast.duration_sec == pytest.approx(normal.duration_sec / 2.0, rel=0.05)


def test_context_manager_calls_close():
    closed = []

    class ClosingTTS(FakeTTS):
        def close(self):
            closed.append(True)

    with ClosingTTS() as tts:
        tts.generate("Hello")
    assert closed == [True]


def test_async_generate():
    import asyncio

    tts = FakeTTS()

    async def run():
        return await tts.async_generate("Hello world")

    result = asyncio.run(run())
    assert result is not None
    assert result.audio is not None


def test_stream_yields_per_segment():
    tts = FakeTTS()
    tts.force_sentence_split = True
    results = list(tts.stream("One. Two. Three"))
    assert len(results) == 3
    for r in results:
        assert r.segments_count == 1
        assert r.audio is not None


def test_stream_cancellation():
    token = CancellationToken()
    tts = FakeTTS()
    tts.force_sentence_split = True

    gen = tts.stream("One. Two. Three", cancellation_token=token)
    first = next(gen)
    assert first is not None
    token.cancel()
    assert list(gen) == []
