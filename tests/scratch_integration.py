"""Gated integration tests: full stack on real hardware with real configs.

Run with ``RHO_TTS_TPU_INTEGRATION=1 python -m pytest tests/scratch_integration.py``
on a TPU host. Mirrors the reference's gated scratch tests
(``tests/scratch_test.py``): end-to-end classifier train+use, validation
during real generation, and auto-sort with real providers — too heavy for
the default suite.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RHO_TTS_TPU_INTEGRATION") != "1",
    reason="integration tests require RHO_TTS_TPU_INTEGRATION=1 (real TPU, slow)",
)

SR = 24000


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("integration")


def test_full_generation_with_validation(workdir):
    """1.7B CustomVoice generation through the whole pipeline on TPU."""
    from rho_tts_tpu import TTSFactory

    tts = TTSFactory.get_tts_instance(
        "qwen",
        model_path="Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
        speaker="Vivian",
        max_iterations=2,
        quantization="int8",
        min_audio_sec=2.0,
    )
    tts.trim_silence = False  # random weights sit under the trim gate
    out = str(workdir / "integration.wav")
    result = tts.generate("Integration test of the full validated pipeline.", out)
    assert result is not None
    assert os.path.exists(out)
    assert result.duration_sec >= 1.0
    tts.close()


def test_classifier_train_and_use(workdir):
    """Train a drift classifier on generated clips, then gate with it."""
    from rho_tts_tpu import train_drift_classifier
    from rho_tts_tpu.audio_io import save_wav
    from rho_tts_tpu.validation.classifier import (
        clear_cache,
        predict_accent_drift_probability,
    )

    dataset = workdir / "ds"
    rng = np.random.default_rng(0)
    for kind, f0 in (("good", 140.0), ("bad", 400.0)):
        d = dataset / kind
        d.mkdir(parents=True, exist_ok=True)
        for i in range(8):
            t = np.arange(SR) / SR
            wav = np.sin(2 * np.pi * (f0 + 10 * i) * t) * 0.4
            if kind == "bad":
                wav += 0.2 * rng.standard_normal(t.size)
            save_wav(str(d / f"{i}.wav"), wav.astype(np.float32), SR)

    model_path = str(workdir / "clf.pkl")
    train_drift_classifier(str(dataset), output_path=model_path)
    clear_cache()
    prob = predict_accent_drift_probability(
        np.sin(np.arange(SR) / 20).astype(np.float32) * 0.3,
        sample_rate=SR,
        model_path=model_path,
    )
    assert prob is not None and 0.0 <= prob <= 1.0


def test_auto_sort_with_real_provider(workdir):
    from rho_tts_tpu import TTSFactory

    tts = TTSFactory.get_tts_instance(
        "qwen",
        model_path="Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
        speaker="Ryan",
        max_iterations=1,
        quantization="int8",
        min_audio_sec=1.0,
    )
    tts.trim_silence = False
    tts.auto_sort_good_dir = str(workdir / "sorted" / "good")
    tts.auto_sort_bad_dir = str(workdir / "sorted" / "bad")
    tts.auto_sort_good_threshold = 0.5
    tts.auto_sort_bad_threshold = 0.5
    result = tts.generate("Auto sort this clip.")
    assert result is not None
    tts.close()
