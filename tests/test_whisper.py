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
