"""QwenTTS provider tests against the tiny model config (random weights).

Exercises the full compiled path: tokenize → prefill → scan decode →
vocode → DSP → save, plus the routing/validation rules.
"""

import numpy as np
import pytest

from rho_tts_tpu.providers.qwen import QwenTTS

SR = 24000


def make_ref_wav(tmp_path):
    from rho_tts_tpu.audio_io import save_wav

    t = np.arange(SR) / SR
    wav = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    path = str(tmp_path / "ref.wav")
    save_wav(path, wav, SR)
    return path


@pytest.fixture(scope="module")
def custom_voice_tts():
    return QwenTTS(
        device="cpu",
        model_path="tiny-CustomVoice",
        speaker="Vivian",
        max_iterations=1,
        max_chars_per_segment=200,
    )


def test_ctor_requires_reference_text():
    with pytest.raises(ValueError, match="reference_text"):
        QwenTTS(device="cpu", reference_audio="x.wav")


def test_custom_voice_requires_speaker():
    tts = QwenTTS(device="cpu", model_path="tiny-CustomVoice", max_iterations=1)
    with pytest.raises(ValueError, match="named speaker"):
        tts.generate("Hello")


def test_base_requires_reference_audio():
    tts = QwenTTS(device="cpu", model_path="tiny", max_iterations=1)
    with pytest.raises(ValueError, match="reference audio"):
        tts.generate("Hello")


def test_custom_voice_generates(custom_voice_tts, tmp_path):
    out = str(tmp_path / "out.wav")
    result = custom_voice_tts.generate("Hello there", out)
    assert result is not None
    assert result.path == out
    assert result.sample_rate == SR
    assert result.duration_sec > 0


def test_voice_clone_generates(tmp_path):
    ref = make_ref_wav(tmp_path)
    tts = QwenTTS(
        device="cpu",
        model_path="tiny",
        reference_audio=ref,
        reference_text="a reference transcript",
        max_iterations=1,
        max_chars_per_segment=200,
    )
    assert tts.voice_cloning
    result = tts.generate("Clone my voice")
    assert result is not None
    assert result.audio is not None


def test_provider_info():
    info = QwenTTS.provider_info()
    assert info.name == "qwen"
    assert info.supports_voice_cloning
    assert any(v.id == "Vivian" for v in info.builtin_voices)
    assert "Chinese" in info.supported_languages


def test_sample_rate_without_model_load():
    tts = QwenTTS(device="cpu", model_path="tiny")
    assert tts.sample_rate == SR
    assert tts._model is None  # no model load needed for sample_rate


def test_max_model_chars_refined_from_config(custom_voice_tts):
    custom_voice_tts._load_model()
    # tiny config caps max_position_embeddings at 512 < MAX_MODEL_CHARS 4000
    assert custom_voice_tts._max_model_chars == 512


def test_loudness_postprocess_applied(custom_voice_tts):
    x = (0.001 * np.sin(np.arange(24000) / 20)).astype(np.float32)
    out = np.asarray(custom_voice_tts._post_process_audio(x))
    rms_db = 20 * np.log10(np.sqrt(np.mean(out.astype(np.float64) ** 2)))
    assert -26 < rms_db < -20  # normalized toward -23 dBFS


def test_int8_quantized_generation(tmp_path):
    tts = QwenTTS(
        device="cpu",
        model_path="tiny-CustomVoice",
        speaker="Aria",
        max_iterations=1,
        max_chars_per_segment=200,
        quantization="int8",
    )
    result = tts.generate("Quantized generation check")
    assert result is not None
    assert result.audio is not None
    talker = tts._model.params["talker"]["blocks"]
    import jax.numpy as jnp

    assert talker["wqkv"]["q"].dtype == jnp.int8


def test_invalid_quantization_rejected():
    tts = QwenTTS(device="cpu", model_path="tiny-CustomVoice", speaker="Aria",
                  quantization="fp3")
    with pytest.raises(ValueError, match="quantization"):
        tts._load_model()
