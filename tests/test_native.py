"""Native C runtime library tests (auto-built; skipped without a compiler)."""

import os
import tempfile

import numpy as np
import pytest

from rho_tts_tpu import _native

pytestmark = pytest.mark.skipif(
    _native.get_lib() is None, reason="native library unavailable (no C compiler)"
)


class TestLevenshtein:
    @pytest.mark.parametrize(
        "a,b,d",
        [("", "", 0), ("abc", "", 3), ("kitten", "sitting", 3), ("same", "same", 0)],
    )
    def test_matches_python(self, a, b, d):
        assert _native.levenshtein(a, b) == d

    def test_agrees_with_python_fallback_on_random_words(self):
        from rho_tts_tpu.validation.stt import stt_validator as sv

        rng = np.random.default_rng(0)
        letters = "abcdefghij"
        for _ in range(50):
            w1 = "".join(rng.choice(list(letters), rng.integers(1, 12)))
            w2 = "".join(rng.choice(list(letters), rng.integers(1, 12)))
            # python rolling-row implementation (bypass native)
            py = sv._levenshtein_distance.__wrapped__(w1, w2) if hasattr(
                sv._levenshtein_distance, "__wrapped__"
            ) else None
            if py is None:
                # direct python recompute
                def pyd(s1, s2):
                    if len(s1) < len(s2):
                        s1, s2 = s2, s1
                    prev = list(range(len(s2) + 1))
                    for i, c1 in enumerate(s1):
                        cur = [i + 1]
                        for j, c2 in enumerate(s2):
                            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
                        prev = cur
                    return prev[-1]

                py = pyd(w1, w2)
            assert _native.levenshtein(w1, w2) == py


class TestWav:
    def test_f32_to_i16_clipping(self):
        out = _native.f32_to_i16(np.array([-2.0, -1.0, 0.0, 1.0, 2.0], np.float32))
        assert out.tolist() == [-32767, -32767, 0, 32767, 32767]

    def test_write_wav_roundtrip(self):
        t = np.arange(2400) / 24000
        wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = tempfile.mktemp(suffix=".wav")
        try:
            _native.write_wav(path, _native.f32_to_i16(wav).tobytes(), 24000)
            from rho_tts_tpu.audio_io import load_wav

            audio, sr = load_wav(path)
            assert sr == 24000
            np.testing.assert_allclose(audio, wav, atol=1e-3)
        finally:
            if os.path.exists(path):
                os.remove(path)
