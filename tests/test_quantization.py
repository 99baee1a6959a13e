"""Weight-only int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_tts_tpu.models import transformer as tfm
from rho_tts_tpu.models.quantization import (
    QUANT_KEYS,
    matmul,
    quantize_stack,
    quantize_weight,
    quantized_bytes,
)


def test_quantize_weight_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32) * 0.1
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8
    deq = q["q"].astype(jnp.float32) * q["s"][None, :]
    # per-channel int8: relative error well under 1%
    err = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.01


def test_matmul_dispatch():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32) * 0.1
    dense = np.asarray(matmul(x, w))
    quant = np.asarray(matmul(x, quantize_weight(w)))
    np.testing.assert_allclose(quant, dense, atol=5e-3 * np.abs(dense).max() + 1e-4, rtol=0.05)


def test_quantize_stack_halves_weight_bytes():
    cfg = tfm.TransformerConfig(
        hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128, dtype=jnp.bfloat16
    )
    params = tfm.init_stack(jax.random.PRNGKey(0), cfg)
    before = quantized_bytes(params)
    qparams = quantize_stack(params)
    after = quantized_bytes(qparams)
    assert after < before * 0.65  # int8 + f32 scales vs bf16
    for name in QUANT_KEYS:
        assert qparams["blocks"][name]["q"].dtype == jnp.int8


def test_quantized_forward_close_to_dense():
    cfg = tfm.TransformerConfig(
        hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128, dtype=jnp.float32
    )
    params = tfm.init_stack(jax.random.PRNGKey(0), cfg)
    qparams = quantize_stack(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 64), jnp.float32) * 0.3
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    dense, _ = tfm.stack_forward(params, cfg, x, pos)
    quant, _ = tfm.stack_forward(qparams, cfg, x, pos)
    d, q = np.asarray(dense), np.asarray(quant)
    rel = np.abs(d - q).max() / (np.abs(d).max() + 1e-6)
    assert rel < 0.05  # int8 weight noise stays small through 2 layers
