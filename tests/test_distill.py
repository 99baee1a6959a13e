"""Draft distillation (models.qwen.distill): the loss optimizes the
speculative acceptance overlap Σ min(p, q) between target sampler and
draft distributions (PAPERS.md arXiv:2211.17192)."""

import jax
import numpy as np
import pytest

from rho_tts_tpu.models.qwen import QwenTTSModel
from rho_tts_tpu.models.qwen.config import PRESETS
from rho_tts_tpu.models.qwen import distill


@pytest.fixture(scope="module")
def tiny_pair():
    target = QwenTTSModel(PRESETS["tiny"], seed=0)
    draft = QwenTTSModel(PRESETS["tiny"], seed=1)
    return target, draft


def test_corpus_deterministic_and_bucketed():
    a = distill.make_corpus(16, seed=3)
    b = distill.make_corpus(16, seed=3)
    assert a == b
    assert all(3 <= len(s.split()) <= 6 for s in a)


def test_distill_improves_acceptance_overlap(tiny_pair):
    target, draft = tiny_pair
    before = jax.tree.map(np.asarray, draft.params["lm_head"])

    stats = distill.distill_draft(
        target, draft, n_texts=8, seq_frames=12, batch_size=4, steps=8,
        log_every=0,
    )
    # Params actually updated, and the acceptance proxy is meaningful
    assert not np.allclose(np.asarray(draft.params["lm_head"], np.float32),
                           np.asarray(before, np.float32))
    assert 0.0 < stats["overlap"] <= 1.0

    # A second, longer run from scratch must beat a 2-step run: the loss
    # moves the overlap in the right direction.
    d_short = QwenTTSModel(PRESETS["tiny"], seed=1)
    s_short = distill.distill_draft(
        target, d_short, n_texts=8, seq_frames=12, batch_size=4, steps=1,
        log_every=0,
    )
    assert stats["overlap"] > s_short["overlap"] - 0.05


def test_distilled_draft_raises_speculation_acceptance(tiny_pair):
    """End-to-end: tokens/round with the distilled draft must beat the
    un-distilled draft's on the same speculation call."""
    from rho_tts_tpu.models.qwen.speculative import speculative_generate_codes

    target, distilled = tiny_pair  # distilled in the previous test order,
    # but don't rely on test ordering: re-distill briefly here.
    fresh = QwenTTSModel(PRESETS["tiny"], seed=1)
    kw = dict(speaker="Vivian", max_frames=24, min_frames=24, gamma=3)
    _, before = speculative_generate_codes(
        target, fresh, "acceptance check text", rng=jax.random.PRNGKey(2), **kw
    )
    distill.distill_draft(
        target, fresh, n_texts=8, seq_frames=12, batch_size=4, steps=10,
        log_every=0,
    )
    _, after = speculative_generate_codes(
        target, fresh, "acceptance check text", rng=jax.random.PRNGKey(2), **kw
    )
    assert after["tokens_per_round"] >= before["tokens_per_round"]


def test_mismatched_vocab_rejected():
    target = QwenTTSModel(PRESETS["tiny"], seed=0)

    import dataclasses

    cfg = PRESETS["tiny"]
    bad = dataclasses.replace(
        cfg, codec=dataclasses.replace(cfg.codec, codebook_size=32)
    )
    draft = QwenTTSModel(bad, seed=1)
    with pytest.raises(ValueError, match="vocabulary"):
        distill.distill_draft(target, draft, steps=1)
