"""Speculative decoding tests (draft-verify, single stream).

Run on the CPU backend with tiny configs. The key property: with the
draft sharing the target's parameters, p ≈ q for every proposal, so
acceptance must be near the gamma+1 upper bound; with an unrelated draft
the loop must still terminate and emit valid codec tokens.
"""

import jax
import numpy as np
import pytest

from rho_tts_tpu.models.qwen import QwenTTSModel
from rho_tts_tpu.models.qwen.speculative import speculative_generate_codes


@pytest.fixture(scope="module")
def target():
    return QwenTTSModel.from_pretrained("tiny", seed=0)


@pytest.fixture(scope="module")
def draft_same(target):
    m = QwenTTSModel.from_pretrained("tiny", seed=0)
    m.params = target.params  # identical distributions → p == q
    return m


@pytest.fixture(scope="module")
def draft_other():
    return QwenTTSModel.from_pretrained("tiny", seed=123)


def test_identical_draft_accepts_nearly_everything(target, draft_same):
    codes, stats = speculative_generate_codes(
        target, draft_same, "speculative decoding acceptance test",
        speaker="Vivian", max_frames=48, min_frames=32, gamma=3,
        rng=jax.random.PRNGKey(0),
    )
    assert codes.shape[1] == target.config.codec.n_codebooks
    assert codes.shape[0] >= 16
    # p == q → acceptance ~1 → close to gamma+1 tokens per round (bf16
    # reassociation between the sequential draft pass and the batched
    # verification pass costs a little)
    assert stats["tokens_per_round"] > 2.5, stats


def test_unrelated_draft_still_correct(target, draft_other):
    codes, stats = speculative_generate_codes(
        target, draft_other, "a different draft model proposes tokens",
        speaker="Ryan", max_frames=40, min_frames=16, gamma=4,
        rng=jax.random.PRNGKey(1),
    )
    cb = target.config.codec.codebook_size
    assert codes.shape[0] >= 8
    # Primary codebook entries are real codec tokens (EOS/pads stripped)
    assert (codes[:, 0] < cb).all()
    assert (codes >= 0).all()
    assert 1.0 <= stats["tokens_per_round"] <= stats["acceptance_upper"]


def test_min_frames_floor(target, draft_same):
    codes, _ = speculative_generate_codes(
        target, draft_same, "short", speaker="Vivian",
        max_frames=64, min_frames=24, gamma=3, rng=jax.random.PRNGKey(2),
    )
    assert codes.shape[0] >= 24


def test_deterministic_given_rng(target, draft_other):
    kw = dict(
        speaker="Aria", max_frames=32, min_frames=8, gamma=2,
        rng=jax.random.PRNGKey(7),
    )
    a, _ = speculative_generate_codes(target, draft_other, "determinism", **kw)
    b, _ = speculative_generate_codes(target, draft_other, "determinism", **kw)
    np.testing.assert_array_equal(a, b)


def test_residual_modes_agree_with_identical_draft(target, draft_same):
    """p == q AND identical residual predictors → strict truncation never
    fires, so both modes must emit the exact same stream."""
    kw = dict(
        speaker="Vivian", max_frames=32, min_frames=16, gamma=3,
        rng=jax.random.PRNGKey(4),
    )
    a, _ = speculative_generate_codes(
        target, draft_same, "mode agreement", residual_mode="strict", **kw
    )
    b, _ = speculative_generate_codes(
        target, draft_same, "mode agreement", residual_mode="draft", **kw
    )
    np.testing.assert_array_equal(a, b)


def test_draft_mode_unrelated_draft_valid(target, draft_other):
    codes, stats = speculative_generate_codes(
        target, draft_other, "draft mode validity", speaker="Ryan",
        max_frames=40, min_frames=16, gamma=4, residual_mode="draft",
        rng=jax.random.PRNGKey(5),
    )
    cb = target.config.codec.codebook_size
    assert codes.shape[0] >= 8
    assert (codes[:, 0] < cb).all()
    assert (codes >= 0).all() and (codes < cb + 3).all()
    assert 1.0 <= stats["tokens_per_round"] <= stats["acceptance_upper"]


def test_unknown_residual_mode_rejected(target, draft_other):
    with pytest.raises(ValueError, match="residual_mode"):
        speculative_generate_codes(
            target, draft_other, "x", residual_mode="bogus"
        )


def test_vocab_mismatch_rejected(target):
    class FakeCfg:
        audio_vocab = 999

    class FakeModel:
        config = FakeCfg()

    with pytest.raises(ValueError, match="vocabulary"):
        speculative_generate_codes(target, FakeModel(), "x")


def test_provider_speculative_path(tmp_path):
    """QwenTTS routes single-segment generation through the draft."""
    from rho_tts_tpu.providers.qwen import QwenTTS

    tts = QwenTTS(
        device="cpu",
        model_path="tiny-CustomVoice",
        draft_model_path="tiny-CustomVoice",
        speaker="Vivian",
        max_iterations=1,
        min_audio_sec=1.0,
        speculative_gamma=2,
    )
    tts.trim_silence = False
    result = tts.generate("speculative provider path")
    assert result is not None and result.audio is not None
    assert result.duration_sec > 0
    assert tts._draft_model is not None  # the draft actually loaded
