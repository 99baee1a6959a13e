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


def test_watermark_present(tts):
    """The vocode path embeds the spread-spectrum watermark.

    Statistical detection needs long/tonal audio (random-weight vocoder
    output is noise-like, burying a −50 dB watermark), so assert the
    embedding EXACTLY: vocoded audio == raw codec decode + watermark.
    Detection strength itself is covered by TestWatermarkOp on favorable
    signals.
    """
    import jax.numpy as jnp

    from rho_tts_tpu.models.chatterbox import model as cbm
    from rho_tts_tpu.models.qwen import codec as codec_lib
    from rho_tts_tpu.ops.watermark import apply_watermark

    tts._generate_audio("warm the model")  # ensure tts.model exists
    cfg = tts.model.cfg
    rng = np.random.default_rng(0)
    toks = jnp.asarray(
        rng.integers(0, cfg.codec.codebook_size, (1, 1024)), jnp.int32
    )
    vocoded = np.asarray(cbm._vocode(tts.model.params, cfg, toks)[0])
    raw = codec_lib.decode_from_codes(
        tts.model.params["codec"], cfg.codec, toks[..., None]
    )[0]
    expected = np.asarray(apply_watermark(raw))
    assert not np.allclose(vocoded, np.asarray(raw))  # something was added
    np.testing.assert_allclose(vocoded, expected, atol=1e-6)


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
