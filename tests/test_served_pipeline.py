"""Serving-backed pipeline tests (engine._generate_segments_served).

Two layers, following the suite's conventions: a fake provider whose
``_serving_submit`` returns hand-scripted futures pins the retry/fallback
semantics against the lockstep batched path's contract (reference hot
loop ``src/rho_tts/base_tts.py:770-898``), and a real QwenTTS over the
tiny preset exercises the ServingEngine integration end to end.
"""

import threading
import time
from unittest.mock import patch

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, CancellationToken
from rho_tts_tpu.providers.qwen import QwenTTS

SR = 8000


def sine(amp=0.5, dur=0.4):
    t = np.arange(int(SR * dur)) / SR
    return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


class FakeReq:
    """Minimal ServeRequest stand-in: resolves immediately (or via .fire())."""

    def __init__(self, wav=None, error=None, defer=False):
        self.wav = wav
        self.error = error
        self.cancelled = False
        self._cbs = []
        self._fired = not defer

    def add_done_callback(self, fn):
        if self._fired:
            fn(self)
        else:
            self._cbs.append(fn)

    def fire(self):
        self._fired = True
        for fn in self._cbs:
            fn(self)
        self._cbs = []

    def cancel(self):
        self.cancelled = True


class ServedFakeTTS(BaseTTS):
    supports_batch_generation = True  # reach _run_pipeline_batched_items
    supports_serving_generation = True

    def __init__(self, **kw):
        super().__init__(device="cpu", **kw)
        self.max_chars_per_segment = 100
        self._max_chars_explicit = True
        self.force_sentence_split = True
        self.submits = []  # text of every _serving_submit call
        self.script = {}  # text -> list of FakeReq factories (popped per try)

    def _serving_submit(self, text):
        self.submits.append(text)
        factories = self.script.get(text)
        if factories:
            return factories.pop(0)()
        return FakeReq(wav=sine())

    def _generate_audio(self, text, **kw):  # pragma: no cover — not used
        raise AssertionError("served pipeline must not call _generate_audio")

    @property
    def sample_rate(self):
        return SR


def test_served_happy_path_one_submit_per_segment():
    tts = ServedFakeTTS()
    result = tts.generate("One. Two. Three. Four")
    assert result is not None
    assert result.segments_count == 4
    assert sorted(tts.submits) == sorted(["One.", "Two.", "Three.", "Four"])


def test_served_drift_failure_resubmits_only_that_segment():
    tts = ServedFakeTTS()
    tts.max_iterations = 3
    tts.voice_cloning = True
    per_text = {}

    def drift_side_effect(audios, sr):
        # batch validator: fail "B" on its first two tries
        out = []
        for a in audios:
            key = round(float(np.asarray(a)[10]), 6)  # identify by amplitude
            tries = per_text.get(key, 0) + 1
            per_text[key] = tries
            bad = key == pytest.approx(round(float(sine(0.9)[10]), 6)) and tries <= 2
            out.append((0.9 if bad else 0.05, not bad))
        return out

    tts.script = {
        "B.": [lambda: FakeReq(wav=sine(0.9))] * 3,
    }
    with patch.object(
        tts, "_validate_accent_drift_batch", side_effect=drift_side_effect
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
    ):
        result = tts.generate("A. B. C")
    assert result is not None
    assert tts.submits.count("B.") == 3
    assert tts.submits.count("A.") == 1
    assert tts.submits.count("C") == 1


def test_served_stt_failure_resubmits():
    tts = ServedFakeTTS()
    tts.max_iterations = 2
    tts.voice_cloning = True
    calls = {"n": 0}

    def stt(auds, sr, txts):
        out = []
        for t in txts:
            if t == "B.":
                calls["n"] += 1
                out.append((calls["n"] > 1, 0.2 if calls["n"] == 1 else 0.95, "b"))
            else:
                out.append((True, 1.0, None))
        return out

    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.05, True)] * len(auds),
    ), patch.object(tts, "_validate_text_match_batch", side_effect=stt):
        result = tts.generate("A. B. C")
    assert result is not None
    assert tts.submits.count("B.") == 2
    assert result.text_similarity == pytest.approx(0.95)


def test_served_exhaustion_falls_back_to_best_by_drift():
    tts = ServedFakeTTS()
    tts.max_iterations = 2
    tts.voice_cloning = True
    drifts = iter([0.9, 0.6])  # both tries fail; second is "best"

    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(next(drifts), False)] * len(auds),
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
    ):
        result = tts.generate("Hello there")
    assert result is not None  # best-by-drift audio returned
    assert result.drift_prob == pytest.approx(0.6)
    assert tts.submits == ["Hello there"] * 2


def test_served_generation_error_retries_then_succeeds():
    tts = ServedFakeTTS()
    tts.max_iterations = 3
    tts.voice_cloning = True
    tts.script = {
        "Hello there": [
            lambda: FakeReq(error=RuntimeError("transient")),
            lambda: FakeReq(wav=sine()),
        ]
    }
    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.05, True)] * len(auds),
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
    ):
        result = tts.generate("Hello there")
    assert result is not None
    assert len(tts.submits) == 2


def test_served_value_error_propagates():
    tts = ServedFakeTTS()
    tts.script = {"Hello there": [lambda: FakeReq(error=ValueError("bad config"))]}
    with pytest.raises(ValueError, match="bad config"):
        tts.generate("Hello there")


def test_served_cancellation():
    tts = ServedFakeTTS()
    tts.max_iterations = 2
    tts.voice_cloning = True
    token = CancellationToken()
    req = FakeReq(wav=sine(), defer=True)
    tts.script = {"Hello there": [lambda: req]}

    def fire_later():
        time.sleep(0.1)
        token.cancel()
        req.fire()

    t = threading.Thread(target=fire_later)
    t.start()
    try:
        assert tts.generate("Hello there", cancellation_token=token) is None
        assert req.cancelled
    finally:
        t.join()


def test_served_deferred_burst_validated_in_one_batch():
    """Requests retiring together coalesce into one drift-batch call."""
    tts = ServedFakeTTS()
    tts.max_iterations = 2
    tts.voice_cloning = True
    reqs = [FakeReq(wav=sine(), defer=True) for _ in range(3)]
    it = iter(reqs)
    tts.script = {t: [lambda it=it: next(it)] for t in ("A.", "B.", "C")}
    batch_sizes = []

    def drift(auds, sr):
        batch_sizes.append(len(auds))
        return [(0.05, True)] * len(auds)

    def fire_all():
        time.sleep(0.15)
        for r in reqs:
            r.fire()

    t = threading.Thread(target=fire_all)
    t.start()
    try:
        with patch.object(
            tts, "_validate_accent_drift_batch", side_effect=drift
        ), patch.object(
            tts, "_validate_text_match_batch",
            side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
        ):
            result = tts.generate("A. B. C")
    finally:
        t.join()
    assert result is not None
    assert batch_sizes == [3]


# -- Real-model integration (tiny preset, CPU) --------------------------------


def test_qwen_serving_pipeline_end_to_end(tmp_path):
    tts = QwenTTS(
        device="cpu",
        model_path="tiny-CustomVoice",
        speaker="Vivian",
        max_iterations=1,
        max_chars_per_segment=20,
        serving=True,
        serving_slots=2,
        serving_max_prompt=128,
        serving_max_frames=128,
    )
    try:
        out = str(tmp_path / "out.wav")
        result = tts.generate("Hello there. Nice to meet you", out)
        assert result is not None
        assert result.segments_count == 2
        assert result.duration_sec > 0
        # the serving engine, not the static batch path, did the work
        assert tts._serving is not None
        assert tts._serving.requests_done >= 2
    finally:
        tts.close()


def test_chatterbox_serving_pipeline_end_to_end(tmp_path):
    """ChatterboxTTS(serving=True): pipeline segments ride the CFG-pair
    slot batch (serving_cb.ChatterboxServingEngine) and validate as they
    retire — the TPU-native replacement for the reference's
    one-generation-per-retry chatterbox loop (max_iterations=50,
    reference chatterbox.py:53)."""
    from rho_tts_tpu.providers.chatterbox import ChatterboxTTS

    tts = ChatterboxTTS(
        device="cpu",
        implementation="tiny",
        max_iterations=1,
        max_chars_per_segment=20,
        min_audio_sec=0.05,
        serving=True,
        serving_slots=2,
        serving_max_prompt=64,
        serving_max_frames=128,
    )
    try:
        out = str(tmp_path / "out.wav")
        result = tts.generate("Hello there. Nice to meet you", out)
        assert result is not None
        assert result.segments_count == 2
        assert result.duration_sec > 0
        assert tts._serving is not None
        assert tts._serving.requests_done >= 2
    finally:
        tts.close()


def test_chatterbox_serving_retry_rejoins_batch(tmp_path):
    """A drift-failing segment resubmits to the slot batch and the retry
    is accepted — exercising slot recycling through the provider path."""
    from rho_tts_tpu.providers.chatterbox import ChatterboxTTS

    tts = ChatterboxTTS(
        device="cpu",
        implementation="tiny",
        max_iterations=3,
        max_chars_per_segment=40,
        min_audio_sec=0.05,
        serving=True,
        serving_slots=2,
        serving_max_prompt=64,
        serving_max_frames=128,
        text_similarity_threshold=0.0,
    )
    tts.voice_cloning = True  # enable the drift gate (reference semantics)
    calls = {"n": 0}

    def fake_drift(auds, sr):
        calls["n"] += 1
        fail_first = calls["n"] == 1
        return [(0.9, False) if fail_first else (0.05, True)] * len(auds)

    try:
        with patch.object(
            tts, "_validate_accent_drift_batch", side_effect=fake_drift
        ), patch.object(
            tts, "_validate_text_match_batch",
            side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
        ):
            out = str(tmp_path / "out.wav")
            result = tts.generate("One single segment here", out)
        assert result is not None
        assert calls["n"] >= 2  # first attempt failed, retry validated
        assert tts._serving.requests_done >= 2  # resubmission joined the batch
    finally:
        tts.close()
