"""Batched segment-generation pipeline tests (fake batching provider)."""

from unittest.mock import patch

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, CancellationToken

SR = 8000


def sine(amp=0.5, dur=0.4):
    t = np.arange(int(SR * dur)) / SR
    return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


class BatchFakeTTS(BaseTTS):
    supports_batch_generation = True

    def __init__(self, **kw):
        super().__init__(device="cpu", **kw)
        self.max_chars_per_segment = 100
        self._max_chars_explicit = True
        self.force_sentence_split = True
        self.batch_size = 8
        self.calls = []  # record of batch sizes

    def _generate_audio(self, text, **kw):
        if isinstance(text, list):
            self.calls.append(len(text))
            return [sine() for _ in text]
        self.calls.append(1)
        return sine()

    @property
    def sample_rate(self):
        return SR


def test_single_batched_call_for_all_segments():
    tts = BatchFakeTTS()
    result = tts.generate("One. Two. Three. Four")
    assert result is not None
    assert result.segments_count == 4
    assert tts.calls == [4]  # ONE batched call, not four


def test_batch_cap_respected():
    tts = BatchFakeTTS()
    tts.batch_size = 2
    result = tts.generate("A. B. C. D. E")
    assert result is not None
    assert result.segments_count == 5
    assert tts.calls == [2, 2, 1]  # chunked by batch_size


def test_only_failures_rebatched():
    tts = BatchFakeTTS()
    tts.max_iterations = 3
    # 3 segments; segment index 1 fails drift twice then passes
    drift_results = {
        0: [(0.05, True)],
        1: [(0.9, False), (0.9, False), (0.05, True)],
        2: [(0.05, True)],
    }
    calls = {i: 0 for i in range(3)}

    def fake_drift(audio, sr):
        # identify segment by call order within iteration — track via counter
        raise AssertionError  # replaced below

    seq = []

    def drift_side_effect(audio, sr):
        idx = seq.pop(0)
        calls[idx] += 1
        return drift_results[idx][min(calls[idx] - 1, len(drift_results[idx]) - 1)]

    orig_batched = tts._generate_segments_batched

    with patch.object(tts, "_validate_accent_drift", side_effect=drift_side_effect), patch.object(
        tts, "_validate_text_match", return_value=(True, 1.0, None)
    ):
        tts.voice_cloning = True

        def wrapper(segments, token, cb=None):
            # seed the segment-order sequence the validator will see
            return orig_batched(segments, token, cb)

        # iteration 1 validates segs [0,1,2]; iterations 2-3 validate [1]
        seq.extend([0, 1, 2, 1, 1])
        result = tts.generate("A. B. C")

    assert result is not None
    assert tts.calls == [3, 1, 1]  # full batch, then only the failing segment
    assert result.drift_prob == pytest.approx(0.05)


def test_cancellation_in_batched_path():
    token = CancellationToken()
    tts = BatchFakeTTS()
    token.cancel()
    assert tts.generate("A. B. C", cancellation_token=token) is None
    assert tts.calls == []


def test_fallback_to_last_audio_when_never_valid():
    tts = BatchFakeTTS()
    tts.max_iterations = 2
    with patch.object(
        tts, "_validate_accent_drift", return_value=(0.99, False)
    ), patch.object(tts, "_validate_text_match", return_value=(True, 1.0, None)):
        tts.voice_cloning = True
        result = tts.generate("A. B")
    assert result is not None  # best-by-drift fallback kept the audio
    assert result.drift_prob == pytest.approx(0.99)


def test_oom_in_batch_retries():
    class OOMBatchTTS(BatchFakeTTS):
        def __init__(self):
            super().__init__()
            self.max_iterations = 2
            self.fail_first = True

        def _generate_audio(self, text, **kw):
            if isinstance(text, list) and self.fail_first:
                self.fail_first = False
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
            return super()._generate_audio(text, **kw)

    tts = OOMBatchTTS()
    with patch.object(tts, "_validate_accent_drift", return_value=(0.0, True)), patch.object(
        tts, "_validate_text_match", return_value=(True, 1.0, None)
    ):
        result = tts.generate("A. B")
    assert result is not None
    assert result.segments_count == 2


def test_single_segment_uses_sequential_path():
    tts = BatchFakeTTS()
    result = tts.generate("Just one segment here")
    assert result is not None
    assert tts.calls == [1]  # single segment → plain path


def test_cross_item_batching_one_call():
    """Multiple texts: ALL items' segments share one batched device call."""
    tts = BatchFakeTTS()
    results = tts.generate(["One. Two", "Three. Four. Five"])
    assert results is not None and len(results) == 2
    assert results[0].segments_count == 2
    assert results[1].segments_count == 3
    assert tts.calls == [5]  # 5 segments across 2 items → ONE call


def test_decay_retry_rebatches_only_failed_items():
    tts = BatchFakeTTS()
    tts.max_decay_retries = 2
    decay_seq = iter([(0.9, True), (0.1, False), (0.9, True)])

    def decay_side_effect(audio):
        return next(decay_seq)

    with patch.object(tts, "_validate_sound_decay", side_effect=decay_side_effect):
        results = tts.generate(["Aa. Bb", "Cc. Dd"])
    # attempt 1: items batched together (4 segs); item 2 fails decay →
    # attempt 2 re-batches only item 2's segments (2 segs)
    assert tts.calls == [4, 2]
    assert results[0] is not None and results[1] is not None
    assert results[1].decay_ratio == pytest.approx(0.9)
