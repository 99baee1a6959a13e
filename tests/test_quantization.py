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


# ---------------------------------------------------------------------------
# w8a8 prefill (int8 activations × int8 weights on the MXU, opt-in)
# ---------------------------------------------------------------------------


def test_w8a8_matmul_close_to_weight_only():
    from rho_tts_tpu.models.quantization import _w8a8_matmul

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64), jnp.float32) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32) * 0.1
    qw = quantize_weight(w)
    wo = np.asarray(matmul(x, qw))  # weight-only path (flag off)
    a8 = np.asarray(_w8a8_matmul(x, qw["q"], qw["s"]))
    assert a8.dtype == x.dtype
    # per-token int8 activations add <1% on top of the int8 weight noise
    np.testing.assert_allclose(a8, wo, atol=0.02 * np.abs(wo).max() + 1e-4)


def test_w8a8_flag_gates_prefill_only(monkeypatch):
    """Flag on: T>1 goes through the int8 dot; T==1 (decode) stays dense."""
    from rho_tts_tpu.models import quantization as qz

    monkeypatch.setenv("RHO_TTS_TPU_W8A8_PREFILL", "1")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64), jnp.float32) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32) * 0.1
    qw = quantize_weight(w)
    on = np.asarray(matmul(x, qw))
    expected = np.asarray(qz._w8a8_matmul(x, qw["q"], qw["s"]))
    np.testing.assert_array_equal(on, expected)

    x1 = x[:, :1]  # decode step: weight-only path regardless of the flag
    on1 = np.asarray(matmul(x1, qw))
    monkeypatch.delenv("RHO_TTS_TPU_W8A8_PREFILL")
    off1 = np.asarray(matmul(x1, qw))
    np.testing.assert_array_equal(on1, off1)


def test_w8a8_stack_forward_tracks_weight_only(monkeypatch):
    cfg = tfm.TransformerConfig(
        hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128, dtype=jnp.float32
    )
    params = tfm.init_stack(jax.random.PRNGKey(0), cfg)
    qparams = quantize_stack(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 64), jnp.float32) * 0.3
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    wo, _ = tfm.stack_forward(qparams, cfg, x, pos)
    monkeypatch.setenv("RHO_TTS_TPU_W8A8_PREFILL", "1")
    a8, _ = tfm.stack_forward(qparams, cfg, x, pos)
    d, q = np.asarray(wo), np.asarray(a8)
    rel = np.abs(d - q).max() / (np.abs(d).max() + 1e-6)
    assert rel < 0.05
    assert np.isfinite(q).all()


# ---------------------------------------------------------------------------
# int4 packed-nibble mode
# ---------------------------------------------------------------------------


def test_int4_pack_unpack_roundtrip():
    from rho_tts_tpu.ops.pallas.int4_matmul import BITS_MAX, _unpack_nibbles, pack_int4

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32) * 0.1
    packed = pack_int4(w)
    assert packed["q4"].shape == (32, 32) and packed["q4"].dtype == jnp.int8
    vals = np.asarray(_unpack_nibbles(packed["q4"]))
    assert vals.min() >= -BITS_MAX and vals.max() <= BITS_MAX
    deq = vals * np.asarray(packed["s"])[None, :]
    err = np.abs(deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert err < 0.08  # 4-bit symmetric: step = absmax/7


def test_int4_matmul_matches_reference_dequant():
    from rho_tts_tpu.ops.pallas.int4_matmul import (
        dequant_matmul_reference,
        int4_matmul,
        pack_int4,
    )

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128), jnp.float32) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 64), jnp.float32) * 0.1
    p = pack_int4(w)
    out = np.asarray(int4_matmul(x, p["q4"], p["s"]))
    ref = np.asarray(dequant_matmul_reference(x, p["q4"], p["s"]))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # And it approximates the dense product
    dense = np.asarray(x @ w)
    rel = np.abs(out - dense).max() / np.abs(dense).max()
    assert rel < 0.15


def test_int4_stack_quarter_weight_bytes():
    cfg = tfm.TransformerConfig(
        hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128, dtype=jnp.bfloat16
    )
    params = tfm.init_stack(jax.random.PRNGKey(0), cfg)
    before = quantized_bytes(params)
    qparams = quantize_stack(params, "int4")
    after = quantized_bytes(qparams)
    assert after < before * 0.45  # ~quarter of bf16 + f32 scales
    for name in QUANT_KEYS:
        assert qparams["blocks"][name]["q4"].dtype == jnp.int8


def test_int4_forward_close_to_dense():
    cfg = tfm.TransformerConfig(
        hidden=64, layers=2, q_heads=4, kv_heads=2, head_dim=16, ffn=128, dtype=jnp.float32
    )
    params = tfm.init_stack(jax.random.PRNGKey(0), cfg)
    qparams = quantize_stack(params, "int4")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 64), jnp.float32) * 0.3
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    dense, _ = tfm.stack_forward(params, cfg, x, pos)
    quant, _ = tfm.stack_forward(qparams, cfg, x, pos)
    d, q = np.asarray(dense), np.asarray(quant)
    # int4 on gaussian random weights carries ~12% per-weight error that
    # compounds through residual layers; require the output to TRACK the
    # dense forward (high correlation), not match elementwise. (The exact
    # kernel-vs-dequant parity is asserted separately above.)
    corr = np.corrcoef(d.ravel(), q.ravel())[0, 1]
    assert corr > 0.9
    assert np.isfinite(q).all()


def test_int4_model_decode_runs():
    from rho_tts_tpu.models.qwen import QwenTTSModel

    model = QwenTTSModel.from_pretrained("tiny", quantization="int4")
    waves, sr = model.synthesize(["int four nibble weights"], speaker="Vivian", min_frames=8)
    assert waves[0].shape[-1] > 0
    assert np.isfinite(np.asarray(waves[0])).all()


class TestW8A8Kernel:
    """Pallas w8a8 kernel (fused int8 dot + rescale) vs the XLA oracle."""

    def test_kernel_matches_xla_oracle(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from rho_tts_tpu.models.quantization import quantize_weight
        from rho_tts_tpu.ops.pallas import w8a8_matmul as w8k

        m, k, n = 256, 256, 512
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
        qw = quantize_weight(w)

        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        ref = (
            jax.lax.dot_general(
                xq, qw["q"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            * sx * qw["s"]
        ).astype(x.dtype)

        out = w8k.w8a8_matmul_kernel(
            xq, sx.astype(jnp.float32), qw["q"], qw["s"].astype(jnp.float32),
            x.dtype, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ref, np.float32))

    def test_shapes_ok_gates(self):
        from rho_tts_tpu.ops.pallas import w8a8_matmul as w8k

        assert w8k.shapes_ok(4096, 2048, 6144)
        assert w8k.shapes_ok(4096, 6144, 2048)
        assert not w8k.shapes_ok(100, 2048, 6144)  # ragged M
        assert not w8k.shapes_ok(256, 130, 512)  # K not 128-aligned
