"""Candidate-batched retry loop tests (engine._retry_segment_candidates +
ChatterboxModel.generate_candidates).

The reference's chatterbox workflow is one generation per validation retry
(``src/rho_tts/base_tts.py:770-898``, max_iterations=50 at
``src/rho_tts/providers/chatterbox.py:53``); here k candidates share one
CFG decode batch and one batched validation program per round.
"""

from unittest.mock import patch

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, CancellationToken
from rho_tts_tpu.cancellation import CancelledException

SR = 8000


def sine(amp=0.5, dur=0.3):
    t = np.arange(int(SR * dur)) / SR
    return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


class CandFakeTTS(BaseTTS):
    def __init__(self, k=3, **kw):
        super().__init__(device="cpu", **kw)
        self.max_chars_per_segment = 100
        self._max_chars_explicit = True
        self.candidates_per_iteration = k
        self.rounds = []  # k of each _generate_audio_candidates call

    def _generate_audio_candidates(self, text, k):
        self.rounds.append(k)
        # amplitude encodes (round, candidate) so validators can script
        return [sine(0.1 * (len(self.rounds)) + 0.01 * i) for i in range(k)]

    def _generate_audio(self, text, **kw):  # pragma: no cover
        raise AssertionError("candidate path must not call _generate_audio")

    @property
    def sample_rate(self):
        return SR


def test_first_passing_candidate_accepted_in_one_round():
    tts = CandFakeTTS(k=3)
    tts.max_iterations = 9
    tts.voice_cloning = True
    # candidate 1 (index) passes drift+STT; candidate 0 fails drift
    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.9, False), (0.05, True), (0.06, True)],
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 0.97, None)] * len(auds),
    ):
        result = tts.generate("Hello there")
    assert result is not None
    assert tts.rounds == [3]  # ONE batched round, not three generations
    assert result.drift_prob == pytest.approx(0.05)
    assert result.text_similarity == pytest.approx(0.97)


def test_candidate_order_wins_over_drift_score():
    """Row order (not best drift) picks among passing candidates —
    acceptance must not depend on validation batching."""
    tts = CandFakeTTS(k=2)
    tts.max_iterations = 4
    tts.voice_cloning = True
    accepted = []
    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.10, True), (0.02, True)],
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: (
            accepted.extend(np.asarray(a)[10] for a in auds)
            or [(True, 1.0, None)] * len(auds)
        ),
    ):
        result = tts.generate("Hello there")
    assert result is not None
    # drift_prob metadata tracks the BEST drift seen (0.02), but the
    # accepted audio is candidate 0 (first passing, amplitude 0.10+0.0)
    assert result.drift_prob == pytest.approx(0.02)


def test_rounds_consume_max_iterations():
    tts = CandFakeTTS(k=4)
    tts.max_iterations = 6
    tts.voice_cloning = True
    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.9, False)] * len(auds),
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
    ):
        result = tts.generate("Hello there")
    # 6 attempts = round of 4 + round of 2; falls back to best-by-drift
    assert tts.rounds == [4, 2]
    assert result is not None


def test_stt_failure_retries_next_round():
    tts = CandFakeTTS(k=2)
    tts.max_iterations = 4
    tts.voice_cloning = True
    calls = {"n": 0}

    def stt(auds, sr, txts):
        calls["n"] += 1
        ok = calls["n"] > 1
        return [(ok, 0.9 if ok else 0.1, "x")] * len(auds)

    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.05, True)] * len(auds),
    ), patch.object(tts, "_validate_text_match_batch", side_effect=stt):
        result = tts.generate("Hello there")
    assert result is not None
    assert tts.rounds == [2, 2]
    assert result.text_similarity == pytest.approx(0.9)


def test_oom_round_charges_one_attempt_and_shrinks_k():
    """A 2k-row batch that OOMs must not burn k attempts per round: one
    iteration is charged (reference charges OOM retries) and the candidate
    count halves so a reproducible OOM eventually fits."""

    class OOMFirstTTS(CandFakeTTS):
        def _generate_audio_candidates(self, text, k):
            if not self.rounds:
                self.rounds.append(k)
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
            return super()._generate_audio_candidates(text, k)

    tts = OOMFirstTTS(k=4)
    tts.max_iterations = 5
    tts.voice_cloning = True
    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.05, True)] * len(auds),
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
    ):
        result = tts.generate("Hello there")
    assert result is not None
    # round 1: k=4 OOMs (1 attempt charged), round 2 retries at k=2
    assert tts.rounds == [4, 2]


def test_stt_exception_is_a_failed_round_not_an_accept():
    """A batched-STT exception must retry (sequential-loop semantics), not
    accept a candidate with a fabricated similarity of 1.0."""
    tts = CandFakeTTS(k=2)
    tts.max_iterations = 4
    tts.voice_cloning = True
    calls = {"n": 0}

    def stt(auds, sr, txts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transcription backend fell over")
        return [(True, 0.88, None)] * len(auds)

    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.05, True)] * len(auds),
    ), patch.object(tts, "_validate_text_match_batch", side_effect=stt):
        result = tts.generate("Hello there")
    assert result is not None
    assert tts.rounds == [2, 2]  # round 1 discarded, round 2 accepted
    assert result.text_similarity == pytest.approx(0.88)  # never 1.0


def test_drift_batch_error_falls_back_to_per_candidate():
    """A batched-drift exception keeps the round's candidates and validates
    each individually (lockstep-path fallback) instead of discarding them."""
    tts = CandFakeTTS(k=3)
    tts.max_iterations = 3
    tts.voice_cloning = True

    def boom(auds, sr):
        raise RuntimeError("batched feature program failed")

    with patch.object(
        tts, "_validate_accent_drift_batch", side_effect=boom
    ), patch.object(
        tts, "_validate_accent_drift",
        side_effect=lambda a, sr: (0.04, True),
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 0.95, None)] * len(auds),
    ):
        result = tts.generate("Hello there")
    assert result is not None
    assert tts.rounds == [3]  # one round; candidates survived the fallback
    assert result.drift_prob == pytest.approx(0.04)


def test_cancellation_in_candidate_round():
    tts = CandFakeTTS(k=2)
    tts.max_iterations = 4
    token = CancellationToken()
    token.cancel()
    assert tts.generate("Hello", cancellation_token=token) is None


def test_auto_sort_sees_every_candidate(tmp_path):
    tts = CandFakeTTS(k=3)
    tts.max_iterations = 3
    tts.voice_cloning = True
    tts.auto_sort_good_dir = str(tmp_path / "good")
    tts.auto_sort_bad_dir = str(tmp_path / "bad")
    tts.auto_sort_good_threshold = 0.2
    tts.auto_sort_bad_threshold = 0.5
    sorted_probs = []
    with patch.object(
        tts, "_validate_accent_drift_batch",
        side_effect=lambda auds, sr: [(0.05, True), (0.9, False), (0.1, True)],
    ), patch.object(
        tts, "_validate_text_match_batch",
        side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
    ), patch.object(
        tts, "_auto_sort_audio", side_effect=lambda a, p: sorted_probs.append(p)
    ):
        tts.generate("Hello there")
    assert sorted_probs == [0.05, 0.9, 0.1]


# -- Model level: one CFG batch of k rows --------------------------------------


@pytest.fixture(scope="module")
def cb_model():
    from rho_tts_tpu.models.chatterbox import ChatterboxModel

    return ChatterboxModel.from_pretrained(device="cpu", implementation="tiny", seed=3)


def test_generate_candidates_shapes(cb_model):
    import jax

    wavs = cb_model.generate_candidates(
        "hello world", 3, min_new_tokens=8, max_new_tokens=16,
        rng=jax.random.PRNGKey(7),
    )
    assert len(wavs) == 3
    for w in wavs:
        assert np.asarray(w).ndim == 1
        assert np.asarray(w).shape[0] >= 8 * cb_model.cfg.codec.hop


def test_greedy_candidates_match_one_shot(cb_model):
    """top_k=1 makes every candidate row identical to the one-shot
    generate — pins the 2k-row prompt replication and per-row EOS cuts."""
    import dataclasses

    import jax

    cfg1 = dataclasses.replace(cb_model.cfg, top_k=1)
    orig = cb_model.cfg
    cb_model.cfg = cfg1
    try:
        one = np.asarray(
            cb_model.generate(
                "hello candidates", min_new_tokens=6, max_new_tokens=16,
                rng=jax.random.PRNGKey(0),
            )
        )
        many = cb_model.generate_candidates(
            "hello candidates", 2, min_new_tokens=6, max_new_tokens=16,
            rng=jax.random.PRNGKey(5),
        )
    finally:
        cb_model.cfg = orig
    for w in many:
        np.testing.assert_allclose(np.asarray(w), one, atol=1e-5)


def test_chatterbox_provider_candidates_end_to_end(tmp_path):
    from rho_tts_tpu.providers.chatterbox import ChatterboxTTS

    tts = ChatterboxTTS(
        device="cpu", implementation="tiny", max_iterations=4,
        candidates_per_iteration=2, min_audio_sec=0.05,
        max_chars_per_segment=200,
    )
    try:
        calls = {"n": 0}

        def drift(auds, sr):
            calls["n"] += 1
            if calls["n"] == 1:  # first round: both candidates fail
                return [(0.9, False)] * len(auds)
            return [(0.05, True)] * len(auds)

        with patch.object(
            tts, "_validate_accent_drift_batch", side_effect=drift
        ), patch.object(
            tts, "_validate_text_match_batch",
            side_effect=lambda auds, sr, txts: [(True, 1.0, None)] * len(auds),
        ):
            result = tts.generate("A tiny test", str(tmp_path / "o.wav"))
        assert result is not None
        assert calls["n"] == 2  # two rounds of 2, not four generations
        assert result.duration_sec > 0
    finally:
        tts.close()
