"""fp8 KV-cache storage (`RHO_TTS_TPU_KV_DTYPE=f8`).

Storage-only quantization: writes cast to the cache dtype, attention
einsums upcast in-register (f8 → bf16 so the dots are native MXU ops;
bf16 caches → f32) — no scale arrays. e4m3 keeps ~2
significant digits, so the pin is logit CLOSENESS and a functional decode,
not token equality (greedy sequences may legitimately diverge; the knob is
documented as a bandwidth/capacity lever with a quality tradeoff).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rho_tts_tpu.models import transformer as tfm


@pytest.fixture()
def f8_env(monkeypatch):
    monkeypatch.setenv("RHO_TTS_TPU_KV_DTYPE", "f8")


def test_env_selects_dtype(monkeypatch):
    assert tfm.kv_cache_dtype() == jnp.bfloat16
    monkeypatch.setenv("RHO_TTS_TPU_KV_DTYPE", "f8")
    assert tfm.kv_cache_dtype() == jnp.float8_e4m3fn
    monkeypatch.setenv("RHO_TTS_TPU_KV_DTYPE", "nope")
    with pytest.raises(ValueError, match="bf16"):
        tfm.kv_cache_dtype()


def test_f8_cache_logits_close_to_bf16():
    """One cached forward over a small stack: f8-cache logits stay within
    e4m3 quantization error of the bf16-cache logits."""
    cfg = tfm.TransformerConfig(
        hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128
    )
    params = tfm.init_stack(jax.random.PRNGKey(0), cfg)
    b, p, s = 2, 6, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, p, cfg.hidden), cfg.dtype) * 0.3
    pos = jnp.broadcast_to(jnp.arange(p), (b, p)).astype(jnp.int32)
    mask = jnp.ones((b, p), bool)

    outs = {}
    for dt in (jnp.bfloat16, jnp.float8_e4m3fn):
        ck, cv = tfm.make_kv_cache(cfg, b, s, dtype=dt)
        kv = jnp.zeros((b, s), bool)
        h, (ck, cv) = tfm.stack_forward(
            params, cfg, x, pos, kv_caches=(ck, cv), cache_len=jnp.int32(0),
            attn_mask=mask, key_valid=kv, fused_prefill=False,
        )
        kv = kv.at[:, :p].set(mask)
        # one decode step on top of the prefilled cache
        x1 = jax.random.normal(jax.random.PRNGKey(2), (b, 1, cfg.hidden), cfg.dtype) * 0.3
        h1, _ = tfm.stack_forward(
            params, cfg, x1, jnp.full((b, 1), p, jnp.int32),
            kv_caches=(ck, cv), cache_len=jnp.int32(p), key_valid=kv,
        )
        outs[dt] = np.asarray(h1, np.float32)
    ref, f8 = outs[jnp.bfloat16], outs[jnp.float8_e4m3fn]
    # e4m3 relative error ~2^-3 on K/V, diluted through softmax + residuals
    np.testing.assert_allclose(f8, ref, atol=0.12, rtol=0.12)
    assert np.abs(f8 - ref).max() > 0  # actually exercised the quantization


def test_f8_decode_runs_end_to_end(f8_env):
    from rho_tts_tpu.models.qwen import PRESETS
    from rho_tts_tpu.models.qwen.model import QwenTTSModel

    model = QwenTTSModel(PRESETS["tiny"], seed=0)
    waves, sr = model.synthesize(["fp8 kv cache run"], min_frames=8, max_frames=64)
    assert waves[0].shape[-1] >= 8 * model.config.codec.hop
    assert np.isfinite(np.asarray(waves[0], np.float32)).all()


def test_f8_serving_runs(f8_env):
    from rho_tts_tpu.models.qwen import PRESETS
    from rho_tts_tpu.models.qwen.model import QwenTTSModel
    from rho_tts_tpu.serving import ServingEngine

    model = QwenTTSModel(PRESETS["tiny"], seed=0)
    eng = ServingEngine(model, n_slots=2, max_prompt=64, max_frames=64, top_k=1)
    req = eng.submit("fp8 serving", min_frames=8, max_frames=64)
    eng.run_until_idle()
    wav, _sr = req.result(timeout=60)
    assert np.isfinite(wav).all() and wav.size >= 8 * model.config.codec.hop


def test_auto_dtype_shape_heuristic(monkeypatch):
    """auto: f8 iff batch x max_len clears the measured win boundary."""
    monkeypatch.setenv("RHO_TTS_TPU_KV_DTYPE", "auto")
    assert tfm.kv_cache_dtype(5, 256) == jnp.bfloat16  # 1280: measured loss
    assert tfm.kv_cache_dtype(5, 512) == jnp.float8_e4m3fn  # 2560: measured win
    assert tfm.kv_cache_dtype(16, 384) == jnp.float8_e4m3fn
    assert tfm.kv_cache_dtype() == jnp.bfloat16  # no shape -> conservative
    monkeypatch.setenv("RHO_TTS_TPU_KV_AUTO_THRESHOLD", "1000")
    assert tfm.kv_cache_dtype(5, 256) == jnp.float8_e4m3fn
    ck, _cv = tfm.make_kv_cache(
        tfm.TransformerConfig(hidden=32, layers=1, q_heads=2, kv_heads=1,
                              head_dim=16, ffn=64),
        5, 256,
    )
    assert ck.dtype == jnp.float8_e4m3fn
