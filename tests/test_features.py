"""Acoustic feature extraction tests (MFCC / YIN F0 / LPC formants)."""

import numpy as np
import pytest

from rho_tts_tpu.ops import features as feats

SR = 16000


def tone(f0, dur=1.0, sr=SR, harmonics=3):
    t = np.arange(int(sr * dur)) / sr
    sig = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(harmonics))
    return sig.astype(np.float32)


class TestMFCC:
    def test_shape(self):
        m = np.asarray(feats.mfcc(tone(220)))
        assert m.shape[0] == 13
        assert m.shape[1] > 20

    def test_distinguishes_spectra(self):
        m1 = np.asarray(feats.mfcc(tone(150))).mean(axis=1)
        m2 = np.asarray(feats.mfcc(tone(800))).mean(axis=1)
        assert np.linalg.norm(m1 - m2) > 1.0

    def test_deterministic(self):
        x = tone(300)
        np.testing.assert_allclose(np.asarray(feats.mfcc(x)), np.asarray(feats.mfcc(x)))


class TestYinF0:
    @pytest.mark.parametrize("f0", [110.0, 220.0, 440.0])
    def test_detects_pitch(self, f0):
        est, voiced = feats.f0_yin(tone(f0))
        assert voiced.any()
        med = np.median(est[voiced])
        assert med == pytest.approx(f0, rel=0.03)

    def test_noise_mostly_unvoiced(self):
        rng = np.random.default_rng(0)
        noise = rng.standard_normal(SR).astype(np.float32) * 0.1
        _, voiced = feats.f0_yin(noise)
        assert voiced.mean() < 0.5

    def test_silence_unvoiced(self):
        _, voiced = feats.f0_yin(np.zeros(SR, np.float32))
        assert not voiced.any() or voiced.mean() < 0.2


class TestFormants:
    def test_formant_like_signal(self):
        # Two resonances at ~500 and ~1500 Hz on a 100 Hz pulse train
        t = np.arange(SR) / SR
        sig = (
            np.sin(2 * np.pi * 500 * t) * (1 + np.sin(2 * np.pi * 100 * t))
            + 0.7 * np.sin(2 * np.pi * 1500 * t) * (1 + np.sin(2 * np.pi * 100 * t))
        ).astype(np.float32)
        f1, f2 = feats.estimate_formants(sig)
        assert 90 < f1 < SR / 4
        assert f2 == 0.0 or f2 > f1

    def test_short_input(self):
        assert feats.estimate_formants(np.zeros(8, np.float32)) == (0.0, 0.0)


class TestFullFeatureVector:
    def test_extract_features_shape(self):
        from rho_tts_tpu.validation.classifier.trainer import extract_features

        feat = extract_features(tone(200), sample_rate=SR)
        assert feat is not None
        assert feat.shape == (256 + 13 + 13 + 4,)

    def test_extract_features_from_file(self, tmp_path):
        from rho_tts_tpu.audio_io import save_wav
        from rho_tts_tpu.validation.classifier.trainer import extract_features

        path = str(tmp_path / "x.wav")
        save_wav(path, tone(200), SR)
        feat = extract_features(path)
        assert feat is not None and feat.shape == (286,)

    def test_in_memory_requires_sample_rate(self):
        from rho_tts_tpu.validation.classifier.trainer import extract_features

        # Missing sample_rate → error logged → None returned
        assert extract_features(tone(200)) is None
