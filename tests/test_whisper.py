"""Whisper JAX model tests (test-size config, random weights)."""

import numpy as np
import pytest

from rho_tts_tpu.models.whisper.model import (
    PRESETS,
    WhisperModel,
    WhisperTranscriber,
    log_mel_spectrogram,
)


@pytest.fixture(scope="module")
def model():
    return WhisperModel(PRESETS["test"], seed=0)


def test_log_mel_shape():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mels = np.asarray(log_mel_spectrogram(wav))
    assert mels.shape[1] == 80
    assert mels.shape[0] == 100  # 1 s at 10 ms hop


def test_log_mel_normalization():
    wav = (0.5 * np.sin(np.arange(16000) / 5)).astype(np.float32)
    mels = np.asarray(log_mel_spectrogram(wav))
    assert mels.max() <= 2.0 and mels.min() >= -2.0  # (log+4)/4 range


def test_transcribe_tokens_shape(model):
    wav = (0.1 * np.sin(np.arange(32000) / 8)).astype(np.float32)
    toks = model.transcribe_tokens(wav, max_tokens=16)
    assert toks.shape == (16,)
    assert toks.dtype.kind == "i"


def test_transcribe_deterministic(model):
    wav = (0.1 * np.sin(np.arange(16000) / 8)).astype(np.float32)
    t1 = model.transcribe_tokens(wav, max_tokens=8)
    t2 = model.transcribe_tokens(wav, max_tokens=8)
    np.testing.assert_array_equal(t1, t2)


def test_transcriber_without_checkpoint_flags_no_weights():
    tr = WhisperTranscriber.from_pretrained("whisper-tiny")
    assert tr.has_real_weights is False


def test_transcriber_resamples(model):
    tr = WhisperTranscriber(model, has_real_weights=False)
    wav = (0.1 * np.sin(np.arange(24000) / 8)).astype(np.float32)
    out = tr.transcribe(wav, 24000)  # 24 kHz input must be resampled
    assert isinstance(out, str)


def test_fallback_tokenizer_produces_text(model):
    """Without tokenizer.json the gate still yields normalizable text."""
    tr = WhisperTranscriber(model, has_real_weights=False)
    assert tr.has_real_tokenizer is False
    wav = (0.1 * np.sin(np.arange(16000) / 8)).astype(np.float32)
    out = tr.transcribe(wav, 16000)
    assert isinstance(out, str) and len(out) > 0
    assert all(c.isalpha() or c == " " for c in out)


def test_stt_gate_full_compute_with_allow_random(monkeypatch):
    """RHO_TTS_TPU_STT_ALLOW_RANDOM=1 runs the whole gate end to end:
    transcribe -> normalize -> fuzzy match (threshold 0 always passes)."""
    from rho_tts_tpu.validation.stt import stt_validator as sv

    monkeypatch.setenv("RHO_TTS_TPU_STT_ALLOW_RANDOM", "1")
    monkeypatch.setenv("RHO_TTS_TPU_WHISPER_MODEL", "whisper-test")
    monkeypatch.setattr(sv, "_whisper", None)
    monkeypatch.setattr(sv, "_whisper_failed", False)
    try:
        wav = (0.1 * np.sin(np.arange(16000) / 8)).astype(np.float32)
        ok, sim, transcription = sv.validate_audio_text_match(
            (wav, 16000), "hello world", threshold=0.0
        )
        assert transcription is not None  # the gate actually transcribed
        assert ok and 0.0 <= sim <= 1.0
    finally:
        sv._whisper = None
        sv._whisper_failed = False


def test_stt_gate_disabled_without_allow_random(monkeypatch):
    from rho_tts_tpu.validation.stt import stt_validator as sv

    monkeypatch.delenv("RHO_TTS_TPU_STT_ALLOW_RANDOM", raising=False)
    monkeypatch.setenv("RHO_TTS_TPU_WHISPER_MODEL", "whisper-test")
    monkeypatch.setattr(sv, "_whisper", None)
    monkeypatch.setattr(sv, "_whisper_failed", False)
    try:
        wav = (0.1 * np.sin(np.arange(16000) / 8)).astype(np.float32)
        ok, sim, transcription = sv.validate_audio_text_match(
            (wav, 16000), "hello world"
        )
        assert transcription is None and ok  # failure => pass (parity)
    finally:
        sv._whisper = None
        sv._whisper_failed = False


class TestBeamDecode:
    """Batched beam search vs greedy and vs a numpy reference beam.

    The reference's STT gate runs faster-whisper at its default beam 5
    (stt_validator.py:135 → CTranslate2); this repo matches that default
    (`RHO_TTS_TPU_STT_BEAM=1` opts into greedy for gate throughput).
    """

    def test_beam1_equals_greedy(self, model):
        from rho_tts_tpu.models.whisper import model as wm
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        wavs = [
            (0.1 * np.sin(np.arange(16000) / f)).astype(np.float32)
            for f in (7, 11)
        ]
        g = model.transcribe_tokens_batch(wavs, max_tokens=10, beam_size=1)
        b = model.transcribe_tokens_batch(wavs, max_tokens=10, beam_size=1)
        np.testing.assert_array_equal(g, b)
        # beam machinery with K=1 IS greedy (argmax per step)
        n16 = wm.CHUNK_FRAMES * wm.HOP
        batch = jnp.stack([jnp.pad(jnp.asarray(w), (0, n16 - w.shape[0])) for w in wavs])
        import jax
        mels = jax.vmap(wm.log_mel_spectrogram)(batch)[:, : wm.CHUNK_FRAMES]
        enc = wm.encode(model.params, model.cfg, mels)
        prompt = jnp.asarray(
            [model.cfg.sot, model.cfg.lang_en, model.cfg.task_transcribe,
             model.cfg.no_timestamps], jnp.int32)
        gg = np.asarray(wm.greedy_decode(model.params, model.cfg, enc, prompt, 10))
        bb = np.asarray(wm.beam_decode(model.params, model.cfg, enc, prompt, 10, beams=1))
        np.testing.assert_array_equal(gg, bb)

    def test_beam5_matches_numpy_reference(self, model):
        """Pin beam-5 against an independent numpy beam search driven by
        the UNCACHED decoder_logits (teacher-forced full forward each
        step) — proves both the KV-cached stepping and the beam
        bookkeeping (parent reorder, frozen finished beams,
        length-normalized selection)."""
        import jax.numpy as jnp
        import jax
        from rho_tts_tpu.models.whisper import model as wm

        cfg = model.cfg
        K, T = 3, 6
        wav = (0.1 * np.sin(np.arange(16000) / 9)).astype(np.float32)
        n16 = wm.CHUNK_FRAMES * wm.HOP
        batch = jnp.pad(jnp.asarray(wav), (0, n16 - wav.shape[0]))[None]
        mels = jax.vmap(wm.log_mel_spectrogram)(batch)[:, : wm.CHUNK_FRAMES]
        enc = wm.encode(model.params, cfg, mels)
        prompt = [cfg.sot, cfg.lang_en, cfg.task_transcribe, cfg.no_timestamps]

        def lp_for(tokens):
            """log-softmax of the next-token logits after `tokens`."""
            tok = jnp.asarray([prompt + tokens], jnp.int32)
            logits = wm.decoder_logits(model.params, cfg, enc, tok)[0, -1]
            return np.asarray(jax.nn.log_softmax(logits))

        # numpy reference beam search
        lp0 = lp_for([])
        order = np.argsort(lp0)[::-1][:K]
        beams = [([int(t)], float(lp0[int(t)]), int(t) == cfg.eot) for t in order]
        for _ in range(T):
            cands = []
            for toks, score, fin in beams:
                if fin:
                    cands.append((toks + [cfg.eot], score, True))
                    continue
                lp = lp_for(toks)
                for t in np.argsort(lp)[::-1][: K + 1]:
                    cands.append((toks + [int(t)], score + float(lp[int(t)]), int(t) == cfg.eot))
            cands.sort(key=lambda c: c[1], reverse=True)
            beams = cands[:K]
        def norm(c):
            toks, score, _fin = c
            n = sum(1 for t in toks if t != cfg.eot)
            return score / max(n, 1)
        best = max(beams, key=norm)
        ref_norm = norm(best)

        got = np.asarray(
            wm.beam_decode(model.params, cfg, enc, jnp.asarray(prompt, jnp.int32),
                           T + 1, beams=K)
        )[0]

        # Token-exact comparison is brittle: the reference scores with the
        # UNCACHED forward while beam_decode uses KV-cached stepping, and
        # fp32 reassociation can flip near-ties. The robust oracle is
        # OPTIMALITY: rescore the device hypothesis with the same numpy
        # scorer — it must be at least as good as the reference's best.
        def rescore(seq):
            toks, score, fin = [], 0.0, False
            for t in (int(x) for x in seq):
                if fin:
                    break
                lp = lp_for(toks)
                score += float(lp[t])
                toks.append(t)
                fin = t == cfg.eot
            n = sum(1 for t in toks if t != cfg.eot)
            return score / max(n, 1)

        got_norm = rescore(got)
        assert got_norm >= ref_norm - 1e-4, (got_norm, ref_norm, got, best[0])
        # And the confidently-ranked prefix agrees
        np.testing.assert_array_equal(got[:4], np.asarray(best[0][:4]))

    def test_env_knob_routes_beam(self, model, monkeypatch):
        from rho_tts_tpu.models.whisper.model import WhisperTranscriber

        tr = WhisperTranscriber(model, has_real_weights=False)
        wav = (0.1 * np.sin(np.arange(16000) / 8)).astype(np.float32)
        base = tr.transcribe(wav, 16000)
        monkeypatch.setenv("RHO_TTS_TPU_STT_BEAM", "3")
        beamed = tr.transcribe(wav, 16000)
        assert isinstance(base, str) and isinstance(beamed, str)
