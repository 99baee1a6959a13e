"""Chatterbox continuous-batching serving (``rho_tts_tpu.serving_cb``).

The engine folds each request's CFG pair into rows (i, i + n_slots) of
one 2B-row slot batch. The correctness pin is the same as the Qwen
engine's: GREEDY PARITY — with ``top_k=1`` every request served through
the engine must reproduce the one-shot ``ChatterboxModel`` token
sequence regardless of slot assignment, batch composition, or ring
wraps — plus seeded SAMPLED parity (noise = f(request seed, frame)).
"""

import dataclasses

import jax
import numpy as np
import pytest

from rho_tts_tpu.models.chatterbox.model import PRESETS, ChatterboxModel
from rho_tts_tpu.serving_cb import ChatterboxServingEngine

TEXTS = [
    "hello world",
    "a second, longer request in another slot",
    "third request joins later",
    "the fourth one rides a recycled slot",
]


@pytest.fixture(scope="module")
def model():
    return ChatterboxModel(PRESETS["tiny"], seed=0)


@pytest.fixture(scope="module")
def greedy_model(model):
    """Same params, cfg.top_k=1 so the one-shot path decodes greedily."""
    cfg = dataclasses.replace(model.cfg, top_k=1)
    return ChatterboxModel(cfg, params=model.params, seed=0)


def oneshot_tokens(
    model, text, min_new=0, max_new=96, seed=0, temperature=1.0,
    cfg_weight=0.6, ref_audio=None,
):
    """Reference token sequence via the one-shot decode internals (the
    exact path ``generate`` runs before vocoding)."""
    st = model._start_decode(
        text, ref_audio, temperature, cfg_weight, max_new, None, min_new,
        jax.random.PRNGKey(0), seeds=[seed],
    )
    toks_dev, done_np = model._decode_all(
        st, temperature, cfg_weight, min_new, None
    )
    d = np.nonzero(done_np[0])[0]
    end = max(int(d[0]) if d.size else done_np.shape[1], 1)
    return np.asarray(toks_dev[0])[:end]


def assert_parity(req, ref):
    """Prefix match (the two paths round their frame budgets differently)."""
    got = req.codes
    n = min(got.shape[0], ref.shape[0])
    assert n > 0
    np.testing.assert_array_equal(got[:n], ref[:n])


class TestGreedyParity:
    def test_single_request_matches_oneshot(self, greedy_model):
        eng = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        req = eng.submit(TEXTS[0], min_frames=8, max_frames=96)
        eng.run_until_idle()
        assert req.done() and req.n_frames >= 8
        ref = oneshot_tokens(greedy_model, TEXTS[0], min_new=8, max_new=96)
        assert_parity(req, ref)

    def test_concurrent_and_recycled_slots_all_match(self, greedy_model):
        """4 requests through 2 slots: concurrent admission, retirement,
        slot recycling at staggered ring columns — every request exact."""
        eng = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        reqs = [eng.submit(t, min_frames=8, max_frames=96) for t in TEXTS]
        eng.run_until_idle()
        for t, req in zip(TEXTS, reqs):
            wav, sr = req.result(timeout=5)
            assert sr == greedy_model.sample_rate
            assert wav.shape == (req.n_frames * greedy_model.cfg.codec.hop,)
            assert_parity(req, oneshot_tokens(greedy_model, t, min_new=8, max_new=96))

    def test_ring_wrap_parity(self, greedy_model):
        """One slot, several requests: the global write column wraps the
        ring; parity must survive prompts straddling the wrap."""
        eng = ChatterboxServingEngine(
            greedy_model, n_slots=1, max_prompt=64, max_frames=64, chunk=32
        )
        assert eng.ring == 64 + 64 + eng.chunk
        reqs = [eng.submit(t, min_frames=16, max_frames=64) for t in TEXTS]
        eng.run_until_idle()
        for t, req in zip(TEXTS, reqs):
            assert req.done()
            assert_parity(req, oneshot_tokens(greedy_model, t, min_new=16, max_new=64))

    def test_waveform_matches_model_vocode(self, greedy_model):
        """End-to-end: the retired waveform equals the model-level
        vocode + position-0 watermark of the same token prefix (the exact
        tail ``ChatterboxModel.generate`` runs after its decode loop; the
        full generate() call can't be compared sample-for-sample here
        because its 128-step chunking yields a different frame budget and
        the watermark envelope is length-dependent)."""
        from rho_tts_tpu.models.chatterbox.model import _round_up, _vocode_masked
        from rho_tts_tpu.ops.watermark import apply_watermark

        eng = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        req = eng.submit(TEXTS[1], min_frames=8, max_frames=96)
        eng.run_until_idle()
        wav_served, _ = req.result(timeout=5)
        end = req.n_frames
        toks = oneshot_tokens(greedy_model, TEXTS[1], min_new=8, max_new=96)[:end]
        assert toks.shape[0] == end
        import jax.numpy as jnp

        t_pad = _round_up(end, 32)
        wav_ref = _vocode_masked(
            greedy_model.params, greedy_model.cfg, jnp.asarray(toks), end, t_pad
        )
        hop = greedy_model.cfg.codec.hop
        wav_ref = np.asarray(apply_watermark(wav_ref[0, : end * hop]))
        np.testing.assert_allclose(wav_served, wav_ref, atol=2e-5)


class TestSampledParity:
    def test_sampled_matches_oneshot_with_seed(self, model):
        eng = ChatterboxServingEngine(
            model, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        reqs = [
            eng.submit(t, min_frames=8, max_frames=96, seed=100 + i,
                       temperature=0.9, cfg_weight=0.4)
            for i, t in enumerate(TEXTS[:3])
        ]
        eng.run_until_idle()
        for i, (t, req) in enumerate(zip(TEXTS[:3], reqs)):
            ref = oneshot_tokens(
                model, t, min_new=8, max_new=96, seed=100 + i,
                temperature=0.9, cfg_weight=0.4,
            )
            assert_parity(req, ref)

    def test_sampled_schedule_independent(self, model):
        """Same (text, seed) → identical tokens whether solo in a 1-slot
        engine or sharing a 2-slot batch with a different neighbor."""
        text, seed = TEXTS[1], 7
        solo_eng = ChatterboxServingEngine(
            model, n_slots=1, max_prompt=64, max_frames=128, chunk=32
        )
        solo = solo_eng.submit(text, min_frames=8, max_frames=96, seed=seed)
        solo_eng.run_until_idle()

        batch_eng = ChatterboxServingEngine(
            model, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        filler = batch_eng.submit(TEXTS[3], min_frames=32, max_frames=96, seed=11)
        batch_eng.step()  # filler occupies slot 0 first
        shared = batch_eng.submit(text, min_frames=8, max_frames=96, seed=seed)
        batch_eng.run_until_idle()
        assert filler.done() and shared.done()
        np.testing.assert_array_equal(shared.codes, solo.codes)

    def test_default_seeds_unique_per_submission(self, model):
        eng = ChatterboxServingEngine(
            model, n_slots=2, max_prompt=64, max_frames=64, chunk=32
        )
        a = eng.submit(TEXTS[0], min_frames=32, max_frames=64)
        b = eng.submit(TEXTS[0], min_frames=32, max_frames=64)
        eng.run_until_idle()
        assert a.seed != b.seed
        c = eng.submit(TEXTS[0], min_frames=32, max_frames=64, seed=a.seed)
        eng.run_until_idle()
        np.testing.assert_array_equal(c.codes, a.codes)


class TestVoiceConditioning:
    def test_ref_audio_parity_and_cache(self, greedy_model, tmp_path):
        """A request with reference audio matches the one-shot voice-clone
        path; the speaker embedding is computed once per path."""
        from rho_tts_tpu.audio_io import save_wav

        sr = greedy_model.sample_rate
        rng = np.random.default_rng(0)
        wav = (0.3 * np.sin(np.arange(sr) / 30)
               + 0.02 * rng.standard_normal(sr)).astype(np.float32)
        ref = str(tmp_path / "ref.wav")
        save_wav(ref, wav, sr)

        eng = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=96, chunk=32
        )
        r1 = eng.submit(TEXTS[0], ref_audio=ref, min_frames=8, max_frames=64)
        r2 = eng.submit(TEXTS[2], ref_audio=ref, min_frames=8, max_frames=64)
        eng.run_until_idle()
        assert len(eng._spk_cache) == 1
        ref_toks = oneshot_tokens(
            greedy_model, TEXTS[0], min_new=8, max_new=64, ref_audio=ref
        )
        assert_parity(r1, ref_toks)
        assert r2.done()

    def test_unconditioned_differs_from_conditioned(self, greedy_model, tmp_path):
        from rho_tts_tpu.audio_io import save_wav

        sr = greedy_model.sample_rate
        wav = (0.3 * np.sin(np.arange(sr) / 17)).astype(np.float32)
        ref = str(tmp_path / "ref.wav")
        save_wav(ref, wav, sr)
        eng = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=96, chunk=32
        )
        a = eng.submit(TEXTS[0], min_frames=16, max_frames=64)
        b = eng.submit(TEXTS[0], ref_audio=ref, min_frames=16, max_frames=64)
        eng.run_until_idle()
        na = min(a.codes.shape[0], b.codes.shape[0])
        assert not np.array_equal(a.codes[:na], b.codes[:na])


class TestStreamingServing:
    def test_stream_pieces_match_nonstream_result(self, greedy_model):
        """Streamed pieces concatenate to the same (watermarked) waveform
        as a non-streaming request with the same seed."""
        eng = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=128,
            chunk=32,
        )
        s = eng.submit(TEXTS[1], min_frames=24, max_frames=96, stream=True, seed=3)
        n = eng.submit(TEXTS[1], min_frames=24, max_frames=96, seed=3)
        eng.start()
        pieces = [p for p, _sr in s.chunks(timeout=60)]
        eng.stop()
        assert len(pieces) >= 1
        streamed = np.concatenate(pieces)
        wav_n, _ = n.result(timeout=5)
        assert streamed.shape == wav_n.shape
        np.testing.assert_allclose(streamed, np.asarray(wav_n), atol=2e-5)

    def test_retired_wav_carries_watermark(self, greedy_model):
        """The retired waveform carries the SAME embedded chips as a
        position-0 watermark of the unwatermarked vocode — watermark
        present and offset-aligned. Needs an utterance longer than the
        1024-sample envelope window (tiny hop=8 → ≥128 frames); the
        detector's SNR score needs tens of thousands of samples, so the
        pin is chip-exactness, not ``detect_watermark``."""
        import jax.numpy as jnp

        from rho_tts_tpu.models.chatterbox.model import _round_up, _vocode_masked
        from rho_tts_tpu.ops.watermark import apply_watermark

        eng = ChatterboxServingEngine(
            greedy_model, n_slots=1, max_prompt=64, max_frames=256, chunk=32
        )
        req = eng.submit(TEXTS[0], min_frames=240, max_frames=256)
        eng.run_until_idle()
        wav, _ = req.result(timeout=5)
        wav = np.asarray(wav)
        end = req.n_frames
        assert end * greedy_model.cfg.codec.hop >= 2048
        hop = greedy_model.cfg.codec.hop
        raw = np.asarray(
            _vocode_masked(
                greedy_model.params, greedy_model.cfg,
                jnp.asarray(req.codes), end, _round_up(end, 32),
            )[0, : end * hop]
        )
        assert np.max(np.abs(wav - raw)) > 1e-6  # watermark present
        marked = np.asarray(apply_watermark(raw))
        np.testing.assert_allclose(wav, marked, atol=2e-5)  # and aligned


class TestMeshServing:
    """CFG serving over a device mesh (virtual CPU devices).

    The engine's 2B CFG rows shard over 'data' and KV heads over
    'model' (parallel.inference + serving_cb placement). Pins mirror the
    Qwen engine's (tests/test_serving.py::TestMeshServing): pure DP is
    token-exact vs the single-chip engine; TP reorders fp32 psums, so
    its pin is against the SAME-MESH one-shot path.
    """

    def test_dp_mesh_bit_exact_vs_single_chip(self, greedy_model):
        from rho_tts_tpu.parallel.inference import enable_data_parallel
        from rho_tts_tpu.parallel.mesh import create_mesh

        texts = TEXTS[:3]
        eng0 = ChatterboxServingEngine(
            greedy_model, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        base = [eng0.submit(t, min_frames=8, max_frames=96) for t in texts]
        eng0.run_until_idle()

        meshed = ChatterboxModel(greedy_model.cfg, params=greedy_model.params, seed=0)
        enable_data_parallel(meshed, create_mesh(2, model_parallel=1))
        eng = ChatterboxServingEngine(
            meshed, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        reqs = [eng.submit(t, min_frames=8, max_frames=96) for t in texts]
        eng.run_until_idle()
        for r0, r in zip(base, reqs):
            assert r.done()
            np.testing.assert_array_equal(r.codes, r0.codes)

    def test_tp_mesh_matches_same_mesh_oneshot(self, greedy_model):
        from rho_tts_tpu.parallel.inference import enable_tensor_parallel
        from rho_tts_tpu.parallel.mesh import create_mesh

        meshed = ChatterboxModel(greedy_model.cfg, params=greedy_model.params, seed=0)
        enable_tensor_parallel(meshed, create_mesh(4, model_parallel=2))
        texts = TEXTS[:2]
        refs = [
            oneshot_tokens(meshed, t, min_new=8, max_new=96) for t in texts
        ]
        eng = ChatterboxServingEngine(
            meshed, n_slots=2, max_prompt=64, max_frames=128, chunk=32
        )
        reqs = [eng.submit(t, min_frames=8, max_frames=96) for t in texts]
        eng.run_until_idle()
        for r, rf in zip(reqs, refs):
            assert r.done()
            assert_parity(r, rf)

    def test_tp_oneshot_generate_runs_and_matches_candidates(self, greedy_model):
        """Meshed one-shot decode: generate() produces audio and the
        candidate batch (k=2) reproduces generate(seed=s) per row —
        the k-row CFG replication survives the TP sharding."""
        from rho_tts_tpu.parallel.inference import enable_tensor_parallel
        from rho_tts_tpu.parallel.mesh import create_mesh

        meshed = ChatterboxModel(greedy_model.cfg, params=greedy_model.params, seed=0)
        enable_tensor_parallel(meshed, create_mesh(4, model_parallel=2))
        wav = meshed.generate(
            TEXTS[0], min_new_tokens=8, max_new_tokens=64, seed=5
        )
        assert wav.shape[-1] > 0
        cands = meshed.generate_candidates(
            TEXTS[0], 2, min_new_tokens=8, max_new_tokens=64, seeds=[5, 9]
        )
        n = min(wav.shape[-1], cands[0].shape[-1])
        np.testing.assert_allclose(
            np.asarray(wav)[:n], np.asarray(cands[0])[:n], atol=2e-5
        )


class TestSchedulerBehavior:
    def test_min_frames_floor(self, model):
        eng = ChatterboxServingEngine(
            model, n_slots=1, max_prompt=64, max_frames=96, chunk=32
        )
        req = eng.submit(TEXTS[0], min_frames=40, max_frames=96)
        eng.run_until_idle()
        assert req.n_frames >= 40

    def test_cancel_queued_and_active(self, model):
        eng = ChatterboxServingEngine(
            model, n_slots=1, max_prompt=64, max_frames=96, chunk=32
        )
        active = eng.submit(TEXTS[0], min_frames=64, max_frames=96)
        queued = eng.submit(TEXTS[1], min_frames=8, max_frames=96)
        eng.step()
        active.cancel()
        queued.cancel()
        eng.run_until_idle()
        for req in (active, queued):
            assert req.cancelled
            with pytest.raises(RuntimeError):
                req.result(timeout=1)

    def test_prompt_too_long_rejected(self, model):
        eng = ChatterboxServingEngine(
            model, n_slots=1, max_prompt=64, max_frames=64, chunk=32
        )
        req = eng.submit("word " * 200, min_frames=8)
        eng.run_until_idle()
        with pytest.raises(ValueError):
            req.result(timeout=1)

    def test_stats_account_delivered_audio(self, model):
        eng = ChatterboxServingEngine(
            model, n_slots=2, max_prompt=64, max_frames=64, chunk=32
        )
        reqs = [eng.submit(t, min_frames=16, max_frames=64) for t in TEXTS[:2]]
        eng.run_until_idle()
        st = eng.stats()
        assert st["requests_done"] == 2
        assert st["frames_delivered"] == sum(r.n_frames for r in reqs)
