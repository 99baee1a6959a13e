"""Speculative decoding inside the ServingEngine (``serving_spec``).

The pin mirrors tests/test_serving.py: GREEDY PARITY. With ``top_k=1``
and ``residual_mode="strict"``, speculative sampling degenerates to exact
target greedy (a rejected slot resamples from ``norm(max(p-q,0))`` — the
target argmax — and strict truncation keeps every emission
exactly-conditioned), so every request served through the speculative
engine must reproduce the one-shot ``generate_codes`` token sequence, no
matter how the draft behaved, which slot the request got, or how rows
desynchronized under per-row acceptance.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rho_tts_tpu.models.qwen import PRESETS
from rho_tts_tpu.models.qwen.model import QwenTTSModel
from rho_tts_tpu.serving import ServingEngine

TEXTS = [
    "hello speculative world",
    "a second, longer request in another slot",
    "third request joins later",
    "the fourth one rides a recycled slot",
]


def _fp32(cfg):
    # Random bf16 weights put argmax near-ties ~1 ulp apart in the flat
    # residual head, so the one-shot and spec paths (different but both
    # correct reduction orders) can flip a tie and cascade. fp32 talkers
    # push the noise floor (~1e-7) far below the top-2 gaps (~1e-4),
    # making greedy parity a property of the MATH, not the tie-breaks.
    return dataclasses.replace(
        cfg, talker=dataclasses.replace(cfg.talker, dtype=jnp.float32)
    )


@pytest.fixture(scope="module")
def target():
    return QwenTTSModel(_fp32(PRESETS["tiny"]), seed=0)


@pytest.fixture(scope="module")
def draft_other():
    # Unrelated draft (random weights, different arch): low acceptance —
    # the hard case for correctness (rows desynchronize maximally).
    return QwenTTSModel(_fp32(PRESETS["draft"]), seed=123)


@pytest.fixture(scope="module")
def draft_same(target):
    # Identical distributions: p == q everywhere → near-full acceptance.
    m = QwenTTSModel(_fp32(PRESETS["tiny"]), seed=0)
    m.params = target.params
    return m


def oneshot(target, text, min_frames=8, max_frames=96):
    return np.asarray(
        target.generate_codes(
            [text], min_frames=min_frames, max_frames=max_frames,
            temperature=1.0, top_k=1,
        )[0]
    )


def assert_prefix_equal(req, ref):
    n = min(req.codes.shape[0], ref.shape[0])
    np.testing.assert_array_equal(req.codes[:n], ref[:n])


class TestSpecGreedyParity:
    def test_single_request_matches_oneshot(self, target, draft_other):
        eng = ServingEngine(
            target, n_slots=2, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_other, gamma=3, residual_mode="strict",
        )
        req = eng.submit(TEXTS[0], min_frames=8, max_frames=64)
        eng.run_until_idle()
        assert req.done() and req.n_frames >= 8
        assert_prefix_equal(req, oneshot(target, TEXTS[0], 8, 64))

    def test_concurrent_queued_and_recycled_slots(self, target, draft_other):
        """4 requests through 2 slots: concurrent admission, per-row
        desynchronized acceptance, slot recycling — all greedy-exact."""
        eng = ServingEngine(
            target, n_slots=2, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_other, gamma=3, residual_mode="strict",
        )
        reqs = [eng.submit(t, min_frames=8, max_frames=64) for t in TEXTS]
        eng.run_until_idle()
        for t, req in zip(TEXTS, reqs):
            wav, sr = req.result(timeout=5)
            assert sr == target.sample_rate
            assert wav.shape == (req.n_frames * target.config.codec.hop,)
            assert_prefix_equal(req, oneshot(target, t, 8, 64))

    def test_identical_draft_high_acceptance_parity(self, target, draft_same):
        """p == q: nearly everything accepts (rows advance ~gamma+1 per
        round) and the emissions must STILL be exact target greedy."""
        eng = ServingEngine(
            target, n_slots=2, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_same, gamma=3, residual_mode="strict",
        )
        reqs = [eng.submit(t, min_frames=16, max_frames=64) for t in TEXTS[:2]]
        eng.run_until_idle()
        for t, req in zip(TEXTS[:2], reqs):
            assert_prefix_equal(req, oneshot(target, t, 16, 64))
        # High acceptance should finish in far fewer rounds than frames:
        # with gamma=3 and p==q, expect > 1.5 frames per round on average.

    def test_recycled_columns_reset_per_row(self, target, draft_same):
        """One slot, several requests back-to-back: each admission resets
        the row's write column to 0 over the previous occupant's stale
        K/V (key_valid rebuilt from the prompt); parity must survive."""
        eng = ServingEngine(
            target, n_slots=1, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_same, gamma=2, residual_mode="strict",
        )
        reqs = [eng.submit(t, min_frames=16, max_frames=64) for t in TEXTS[:3]]
        eng.run_until_idle()
        for t, req in zip(TEXTS[:3], reqs):
            assert req.done()
            assert_prefix_equal(req, oneshot(target, t, 16, 64))


class TestSpecColumnRewind:
    def test_rewound_columns_stay_bounded(self, target, draft_other):
        """Low-acceptance draft, 64 frames, γ=3: without post-acceptance
        column rewind the row would consume ~(γ+1)x64 = 256 columns and
        blow past the ring (sized prompt + frames + 3(γ+1)); with rewind
        its final column is bounded by prompt + emitted keys + lag."""
        eng = ServingEngine(
            target, n_slots=1, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_other, gamma=3, residual_mode="strict",
        )
        req = eng.submit(TEXTS[0], min_frames=48, max_frames=64)
        eng.run_until_idle()
        cols = int(np.asarray(eng._spec_cols)[0])
        assert cols <= eng.ring
        assert cols <= 64 + req.n_frames + 3 * (eng.gamma + 1)


class TestSpecSampled:
    def test_sampled_schedule_independent(self, target, draft_other):
        """top_k>1 speculative serving draws from (seed, frame, tag) keys:
        the same (text, seed) must emit identical codes alone or batched."""
        kw = dict(top_k=4, draft_model=draft_other, gamma=3,
                  residual_mode="draft")
        solo_eng = ServingEngine(target, n_slots=1, max_prompt=64,
                                 max_frames=64, **kw)
        solo = solo_eng.submit(TEXTS[0], min_frames=8, max_frames=64, seed=3)
        solo_eng.run_until_idle()

        batch_eng = ServingEngine(target, n_slots=2, max_prompt=64,
                                  max_frames=64, **kw)
        filler = batch_eng.submit(TEXTS[2], min_frames=24, max_frames=64, seed=9)
        batch_eng.step()
        shared = batch_eng.submit(TEXTS[0], min_frames=8, max_frames=64, seed=3)
        batch_eng.run_until_idle()
        assert filler.done() and shared.done()
        np.testing.assert_array_equal(shared.codes, solo.codes)

    def test_sampled_identical_draft_high_acceptance(self, target, draft_same):
        """SAMPLED acceptance sanity (the greedy twin is
        test_identical_draft_high_acceptance_parity): with p == q the
        rejection sampler must accept nearly everything at top_k>1 too —
        a sampled-path acceptance bug would look exactly like a
        low-overlap draft in the serving benchmarks."""
        eng = ServingEngine(
            target, n_slots=2, max_prompt=64, max_frames=128, top_k=4,
            draft_model=draft_same, gamma=4, residual_mode="draft",
        )
        reqs = [
            eng.submit(t, min_frames=96, max_frames=128, seed=i,
                       temperature=0.9)
            for i, t in enumerate(TEXTS[:4])
        ]
        eng.run_until_idle()
        frames = sum(r.n_frames for r in reqs)
        # Ceiling is 2 slots × (γ+1) = 10 frames/round; p == q measured
        # ~8.9. Anything near the 1-2/round floor means acceptance broke.
        assert frames / max(eng.spec_rounds, 1) > 5.0

    def test_draft_mode_valid_codes(self, target, draft_other):
        eng = ServingEngine(
            target, n_slots=2, max_prompt=64, max_frames=64, top_k=4,
            draft_model=draft_other, gamma=4, residual_mode="draft",
        )
        req = eng.submit(TEXTS[1], min_frames=16, max_frames=64)
        eng.run_until_idle()
        cb = target.config.codec.codebook_size
        codes = req.codes
        assert codes.shape[0] >= 16
        assert (codes[:, 0] < cb).all()
        assert (codes >= 0).all()


class TestSpecStreaming:
    def test_stream_pieces_concat_to_result(self, target, draft_same):
        eng = ServingEngine(
            target, n_slots=2, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_same, gamma=3, residual_mode="strict",
        )
        req = eng.submit(TEXTS[0], min_frames=64, max_frames=64, stream=True)
        pieces = []
        t = __import__("threading").Thread(
            target=lambda: pieces.extend(p for p, _sr in req.chunks(timeout=300))
        )
        t.start()
        eng.run_until_idle()
        t.join(timeout=30)
        assert len(pieces) >= 2
        wav, _sr = req.result(timeout=5)
        np.testing.assert_array_equal(np.concatenate(pieces), wav)


class TestSpecValidation:
    def test_vocab_mismatch_rejected(self, target):
        import dataclasses

        cfg = dataclasses.replace(
            PRESETS["tiny"],
            codec=dataclasses.replace(PRESETS["tiny"].codec, codebook_size=32),
        )
        other = QwenTTSModel(cfg, seed=0)  # audio vocab differs
        with pytest.raises(ValueError, match="vocabular"):
            ServingEngine(target, n_slots=1, draft_model=other)

    def test_bad_residual_mode_rejected(self, target, draft_other):
        with pytest.raises(ValueError, match="residual_mode"):
            ServingEngine(
                target, n_slots=1, draft_model=draft_other,
                residual_mode="nope",
            )

    def test_eos_at_admission_retires(self, target, draft_other):
        """min_frames=0 can sample EOS at frame 0 — the row is done before
        any speculative round runs and must still retire cleanly."""
        eng = ServingEngine(
            target, n_slots=1, max_prompt=64, max_frames=64, top_k=1,
            draft_model=draft_other, gamma=2, residual_mode="strict",
        )
        reqs = [
            eng.submit(t, min_frames=0, max_frames=64) for t in TEXTS[:2]
        ]
        eng.run_until_idle()
        for r in reqs:
            assert r.done()
            assert r.n_frames >= 1


class TestRoundsPerDispatch:
    def test_results_invariant_to_spec_rounds(self, target, draft_other,
                                              monkeypatch):
        """k rounds scanned into one dispatch must emit the SAME codes as
        one-round-per-dispatch — the scan changes dispatch granularity,
        not math (per-row (seed, frame) keys are schedule-independent)."""
        outs = {}
        for k in ("1", "3"):
            monkeypatch.setenv("RHO_TTS_TPU_SPEC_ROUNDS", k)
            eng = ServingEngine(
                target, n_slots=2, max_prompt=64, max_frames=64, top_k=4,
                draft_model=draft_other, gamma=4, residual_mode="draft",
            )
            reqs = [
                eng.submit(t, min_frames=8, max_frames=64, seed=i,
                           temperature=0.9)
                for i, t in enumerate(TEXTS[:2])
            ]
            eng.run_until_idle()
            outs[k] = [np.asarray(r.codes) for r in reqs]
        for a, b in zip(outs["1"], outs["3"]):
            np.testing.assert_array_equal(a, b)
