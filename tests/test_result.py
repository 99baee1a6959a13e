"""GenerationResult dataclass tests."""

import numpy as np

from rho_tts_tpu import GenerationResult


def test_defaults():
    r = GenerationResult()
    assert r.path is None
    assert r.audio is None
    assert r.sample_rate == 0
    assert r.duration_sec == 0.0
    assert r.segments_count == 0
    assert r.format == "wav"
    assert r.drift_prob is None
    assert r.text_similarity is None
    assert r.decay_ratio is None


def test_fields_roundtrip():
    audio = np.zeros(100, dtype=np.float32)
    r = GenerationResult(
        path="/tmp/x.wav",
        audio=audio,
        sample_rate=24000,
        duration_sec=100 / 24000,
        segments_count=2,
        format="mp3",
        drift_prob=0.12,
        text_similarity=0.95,
        decay_ratio=0.8,
    )
    assert r.path == "/tmp/x.wav"
    assert r.sample_rate == 24000
    assert r.segments_count == 2
    assert r.format == "mp3"
    assert r.drift_prob == 0.12


def test_numpy_helper():
    import jax.numpy as jnp

    r = GenerationResult(audio=jnp.ones(8))
    out = r.numpy()
    assert isinstance(out, np.ndarray)
    assert out.shape == (8,)
    assert GenerationResult().numpy() is None
