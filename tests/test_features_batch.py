"""Golden tests: batched/bucketed feature extraction vs the serial path.

The batched path (one device program per batch, reflect-padded buckets,
masked statistics) must reproduce the per-clip features used to train
classifiers — otherwise trained models would mis-score batched inputs.
"""

import numpy as np
import pytest

from rho_tts_tpu.ops import features as feats
from rho_tts_tpu.validation.classifier.trainer import (
    extract_features,
    extract_features_batch_audio,
)

SR = 16000


def _clip(freq, dur, sr=SR, amp=0.4, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * sr)) / sr
    w = amp * np.sin(2 * np.pi * freq * t)
    if noise:
        w = w + noise * rng.standard_normal(t.size)
    return w.astype(np.float32)


def _yin_pick_loop(cmnd, e0, sr, tau_min, tau_max, frame_length, threshold, voiced_threshold):
    """Direct transcription of the classic per-frame YIN selection loop
    (the pre-vectorization implementation) as the oracle."""
    t_frames = cmnd.shape[0]
    f0 = np.full(t_frames, np.nan, np.float64)
    voiced = np.zeros(t_frames, bool)
    energy_gate = 1e-6 * (frame_length // 2)
    for t in range(t_frames):
        if e0[t] < energy_gate:
            continue
        c = cmnd[t]
        below = np.nonzero(c[tau_min:tau_max] < threshold)[0]
        if below.size:
            tau = tau_min + below[0]
            while tau + 1 < tau_max and c[tau + 1] < c[tau]:
                tau += 1
        else:
            tau = tau_min + int(np.argmin(c[tau_min:tau_max]))
        if c[tau] < voiced_threshold:
            if 0 < tau < tau_max - 1:
                a, b_, cc = c[tau - 1], c[tau], c[tau + 1]
                denom = a - 2 * b_ + cc
                shift = 0.5 * (a - cc) / denom if abs(denom) > 1e-12 else 0.0
            else:
                shift = 0.0
            f0[t] = sr / (tau + shift)
            voiced[t] = True
    return f0, voiced


class TestYinPickVectorized:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_loop_oracle(self, seed):
        rng = np.random.default_rng(seed)
        wav = np.concatenate(
            [
                _clip(220, 0.5, seed=seed),
                np.zeros(2000, np.float32),
                0.2 * rng.standard_normal(8000).astype(np.float32),
            ]
        )
        import jax.numpy as jnp

        tau_min = max(int(SR / 2093.0), 1)
        tau_max = min(int(SR / 65.41) + 1, 1024)
        cmnd, e0 = feats._yin_cmnd(jnp.asarray(wav), 2048, 512, tau_max)
        cmnd, e0 = np.asarray(cmnd), np.asarray(e0)
        f0_v, voiced_v = feats.yin_pick(cmnd, e0, SR, tau_min, tau_max, 2048, 0.1, 0.5)
        f0_l, voiced_l = _yin_pick_loop(cmnd, e0, SR, tau_min, tau_max, 2048, 0.1, 0.5)
        np.testing.assert_array_equal(voiced_v, voiced_l)
        # float32 interpolation arithmetic orders differ slightly
        np.testing.assert_allclose(f0_v[voiced_v], f0_l[voiced_l], rtol=1e-5)


class TestBatchedFeatures:
    def test_matches_serial_same_rate(self):
        clips = [
            _clip(220, 1.3, noise=0.01, seed=1),
            _clip(330, 2.1, noise=0.02, seed=2),
            _clip(150, 0.7, noise=0.05, seed=3),
        ]
        serial = [extract_features(c, sample_rate=SR) for c in clips]
        batched = extract_features_batch_audio(clips, SR)
        assert all(f is not None for f in batched)
        for s, b in zip(serial, batched):
            assert s.shape == b.shape == (286,)
            # Speaker embedding (first 256 dims): identical windows → tight
            np.testing.assert_allclose(b[:256], s[:256], atol=2e-4)
            # MFCC stats: identical up to reflect-pad boundary frames
            np.testing.assert_allclose(b[256:282], s[256:282], atol=5e-3, rtol=1e-3)
            # F0 mean/std and formants
            np.testing.assert_allclose(b[282:], s[282:], atol=1.0)

    def test_matches_serial_resampled(self):
        sr = 24000
        clips = [
            _clip(200, 1.1, sr=sr, noise=0.01, seed=4),
            _clip(340, 0.9, sr=sr, noise=0.03, seed=5),
        ]
        serial = [extract_features(c, sample_rate=sr) for c in clips]
        batched = extract_features_batch_audio(clips, sr)
        for s, b in zip(serial, batched):
            np.testing.assert_allclose(b[:256], s[:256], atol=2e-3)
            np.testing.assert_allclose(b[256:282], s[256:282], atol=2e-2, rtol=5e-3)

    def test_single_clip_batch(self):
        c = _clip(260, 1.0, noise=0.02, seed=7)
        out = extract_features_batch_audio([c], SR)
        assert len(out) == 1 and out[0].shape == (286,)

    def test_empty_batch(self):
        assert extract_features_batch_audio([], SR) == []
