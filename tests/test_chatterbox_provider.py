"""Chatterbox provider + model tests (tiny config, random weights)."""

import numpy as np
import pytest

from rho_tts_tpu.providers.chatterbox import ChatterboxTTS

SR = 24000


@pytest.fixture(scope="module")
def tts():
    return ChatterboxTTS(
        device="cpu", implementation="tiny", max_iterations=1, max_chars_per_segment=200
    )


def make_ref(tmp_path):
    from rho_tts_tpu.audio_io import save_wav

    t = np.arange(SR) / SR
    path = str(tmp_path / "ref.wav")
    save_wav(path, (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32), SR)
    return path


def test_invalid_implementation():
    with pytest.raises(ValueError, match="Invalid implementation"):
        ChatterboxTTS(device="cpu", implementation="turbo")


def test_default_voice_generates(tts):
    result = tts.generate("Hello from chatterbox")
    assert result is not None
    assert result.audio is not None
    assert result.sample_rate == SR


def test_voice_clone_with_prompt_cache(tmp_path):
    ref = make_ref(tmp_path)
    tts = ChatterboxTTS(
        device="cpu",
        implementation="tiny",
        reference_audio=ref,
        max_iterations=1,
        max_chars_per_segment=200,
    )
    assert tts.voice_cloning
    r1 = tts.generate("First generation")
    assert r1 is not None
    assert ref in tts._prompt_cache  # conditionals cached
    cached = tts._prompt_cache[ref]
    r2 = tts.generate("Second generation")
    assert r2 is not None
    np.testing.assert_array_equal(tts._prompt_cache[ref], cached)


def test_provider_info():
    info = ChatterboxTTS.provider_info()
    assert info.name == "chatterbox"
    assert info.supports_voice_cloning
    assert info.supported_languages == ["English"]


def test_generation_deterministic_per_seed(tts):
    tts.seed = 111
    tts._set_seeds()
    a1 = np.asarray(tts._generate_audio("determinism check"))
    tts.seed = 111
    tts._set_seeds()
    a2 = np.asarray(tts._generate_audio("determinism check"))
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_watermark_present(tts, monkeypatch):
    """The generate path embeds the spread-spectrum watermark.

    Statistical detection needs long/tonal audio (random-weight vocoder
    output is noise-like, burying a −50 dB watermark), so assert the
    embedding EXACTLY: generate() output == raw sliced vocode + watermark
    (the embed happens after slicing to true length — see
    ``ChatterboxModel.generate``). Detection strength itself is covered
    by TestWatermarkOp on favorable signals.
    """
    import jax

    from rho_tts_tpu.models.chatterbox import model as cbm
    from rho_tts_tpu.ops.watermark import apply_watermark

    captured = {}
    orig = cbm._vocode

    def spy(params, cfg, toks):
        out = orig(params, cfg, toks)
        captured["raw"] = out
        return out

    monkeypatch.setattr(cbm, "_vocode", spy)
    wav = np.asarray(
        tts.model.generate(
            "watermark exactness", rng=jax.random.PRNGKey(7), min_new_tokens=160
        )
    )
    raw = np.asarray(captured["raw"][0, : wav.shape[0]])
    expected = np.asarray(apply_watermark(raw))
    assert not np.allclose(wav, raw)  # something was added
    np.testing.assert_allclose(wav, expected, atol=1e-6)


class TestWatermarkOp:
    def test_embed_detect_roundtrip(self):
        rng = np.random.default_rng(0)
        audio = (0.3 * np.sin(np.arange(24000) / 20) + 0.01 * rng.standard_normal(24000)).astype(
            np.float32
        )
        from rho_tts_tpu.ops.watermark import apply_watermark, detect_watermark

        marked = np.asarray(apply_watermark(audio))
        assert detect_watermark(marked) > 5.0
        assert detect_watermark(audio) < 5.0
        # Inaudible: tiny perturbation
        assert np.max(np.abs(marked - audio)) < 0.01

    def test_wrong_key_not_detected(self):
        audio = (0.3 * np.sin(np.arange(24000) / 20)).astype(np.float32)
        from rho_tts_tpu.ops.watermark import apply_watermark, detect_watermark

        marked = np.asarray(apply_watermark(audio, key=123))
        assert detect_watermark(marked, key=456) < 5.0

    def test_offset_windows_align_with_full_embed(self):
        """Position-indexed PN: embedding a window at its absolute offset
        produces the SAME chips as the full-utterance embed (interior
        samples exact; only the envelope's ±512-sample edge differs)."""
        rng = np.random.default_rng(1)
        audio = (0.3 * np.sin(np.arange(48000) / 17) + 0.01 * rng.standard_normal(48000)).astype(
            np.float32
        )
        from rho_tts_tpu.ops.watermark import apply_watermark

        full = np.asarray(apply_watermark(audio))
        lo, hi = 10000, 30000
        win = np.asarray(apply_watermark(audio[lo:hi], offset=lo))
        # Interior of the window (≥512 from its edges) matches exactly
        np.testing.assert_allclose(win[512:-512], full[lo + 512 : hi - 512], atol=1e-6)

    def test_detect_on_known_offset_crop(self):
        rng = np.random.default_rng(2)
        audio = (0.3 * np.sin(np.arange(48000) / 23) + 0.01 * rng.standard_normal(48000)).astype(
            np.float32
        )
        from rho_tts_tpu.ops.watermark import apply_watermark, detect_watermark

        marked = np.asarray(apply_watermark(audio))
        crop = marked[9000:33000]
        assert detect_watermark(crop, offset=9000) > 5.0
        assert detect_watermark(crop) < 5.0  # unknown offset → chips misalign
