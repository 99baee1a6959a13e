"""Speaker encoder tests: shapes, determinism, discrimination."""

import numpy as np
import pytest

from rho_tts_tpu.models.speaker import SpeakerEncoder
from rho_tts_tpu.models.speaker.encoder import log_mel, preprocess


@pytest.fixture(scope="module")
def encoder():
    return SpeakerEncoder(seed=0)


def voice_like(f0, dur=1.2, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    sig = sum(
        (0.4 / (k + 1)) * np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6))
        for k in range(4)
    )
    return (sig + 0.01 * rng.standard_normal(t.size)).astype(np.float32)


def test_embedding_shape_and_norm(encoder):
    e = encoder.embed_utterance(voice_like(150), 16000)
    assert e.shape == (256,)
    assert np.linalg.norm(e) == pytest.approx(1.0, abs=1e-5)


def test_deterministic(encoder):
    w = voice_like(180)
    e1 = encoder.embed_utterance(w, 16000)
    e2 = encoder.embed_utterance(w, 16000)
    np.testing.assert_allclose(e1, e2, atol=1e-6)


def test_same_voice_similar(encoder):
    """Two clips of the same 'voice' should be closer than different voices."""
    a1 = encoder.embed_utterance(voice_like(150, seed=1), 16000)
    a2 = encoder.embed_utterance(voice_like(150, seed=2), 16000)
    b = encoder.embed_utterance(voice_like(320, seed=3), 16000)
    sim_same = float(a1 @ a2)
    sim_diff = float(a1 @ b)
    assert sim_same > sim_diff


def test_resamples_other_rates(encoder):
    w = voice_like(200, sr=16000)
    # Feed a 24 kHz version — must be resampled internally
    from rho_tts_tpu.ops.resample import resample

    w24 = np.asarray(resample(w, 16000, 24000))
    e = encoder.embed_utterance(w24, 24000)
    assert e.shape == (256,)


def test_log_mel_shape():
    mels = np.asarray(log_mel(voice_like(150)))
    assert mels.shape[1] == 40
    assert mels.shape[0] > 100  # ~100 frames/sec


def test_preprocess_trims_silence():
    sr = 16000
    voiced = voice_like(150, dur=0.5)
    padded = np.concatenate([np.zeros(sr, np.float32), voiced, np.zeros(sr, np.float32)])
    out = preprocess(padded, sr)
    assert out.size < padded.size  # silence removed


def test_short_input_padded(encoder):
    e = encoder.embed_utterance(voice_like(150, dur=0.2), 16000)
    assert e.shape == (256,)
