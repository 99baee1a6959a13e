"""Static KV attention window (decode): bucketed cache-prefix reads must
be bit-identical to full-cache attention — every masked-out slot scored
-1e30 before, so the softmax ignores exactly the same entries."""

import jax
import numpy as np

from rho_tts_tpu.models.qwen import QwenTTSModel
from rho_tts_tpu.models.qwen.config import PRESETS


def _gen(model, **kw):
    return model.generate_codes(
        ["kv window parity check sentence"], speaker="Vivian",
        min_frames=24, max_frames=24, rng=jax.random.PRNGKey(3), **kw
    )[0]


def test_kv_window_decode_parity(monkeypatch):
    monkeypatch.setenv("RHO_TTS_TPU_DECODE_CHUNK", "8")  # several chunks
    model = QwenTTSModel(PRESETS["tiny"], seed=0)

    monkeypatch.setenv("RHO_TTS_TPU_KV_BUCKET", "0")  # windowing disabled
    full = _gen(model)
    monkeypatch.setenv("RHO_TTS_TPU_KV_BUCKET", "16")  # several buckets
    windowed = _gen(model)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(windowed))


def test_kv_window_helper_bounds():
    from rho_tts_tpu.models.qwen.model import _kv_window

    import os

    os.environ["RHO_TTS_TPU_KV_BUCKET"] = "512"
    try:
        assert _kv_window(130, 4096) == 512  # rounds up, below S
        assert _kv_window(513, 4096) == 1024
        assert _kv_window(4000, 4096) is None  # window >= S shares full program
        os.environ["RHO_TTS_TPU_KV_BUCKET"] = "0"
        assert _kv_window(130, 4096) is None  # disabled
    finally:
        os.environ.pop("RHO_TTS_TPU_KV_BUCKET", None)
