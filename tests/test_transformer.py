"""Transformer core numerics: KV-cache decode must match full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_tts_tpu.models import transformer as tfm


@pytest.fixture(scope="module")
def cfg():
    return tfm.TransformerConfig(
        hidden=32, layers=2, q_heads=4, kv_heads=2, head_dim=8, ffn=64, dtype=jnp.float32
    )


@pytest.fixture(scope="module")
def params(cfg):
    return tfm.init_stack(jax.random.PRNGKey(0), cfg)


def test_cached_decode_matches_full_forward(cfg, params):
    """Prefill + per-token cached decode == one uncached causal pass."""
    b, t_total, t_prompt = 2, 10, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t_total, cfg.hidden), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t_total), (b, t_total))

    # Reference: full causal forward, no cache
    full_out, _ = tfm.stack_forward(params, cfg, x, positions)

    # Cached: prefill the first t_prompt tokens, then decode one at a time
    ck, cv = tfm.make_kv_cache(cfg, b, t_total, dtype=jnp.float32)
    key_valid = jnp.zeros((b, t_total), bool)
    prefill_out, (ck, cv) = tfm.stack_forward(
        params,
        cfg,
        x[:, :t_prompt],
        positions[:, :t_prompt],
        kv_caches=(ck, cv),
        cache_len=jnp.int32(0),
        attn_mask=jnp.ones((b, t_prompt), bool),
        key_valid=key_valid,
    )
    key_valid = key_valid.at[:, :t_prompt].set(True)

    np.testing.assert_allclose(
        np.asarray(prefill_out), np.asarray(full_out[:, :t_prompt]), rtol=2e-4, atol=2e-5
    )

    outs = []
    for t in range(t_prompt, t_total):
        out, (ck, cv) = tfm.stack_forward(
            params,
            cfg,
            x[:, t : t + 1],
            positions[:, t : t + 1],
            kv_caches=(ck, cv),
            cache_len=jnp.int32(t),
            attn_mask=None,
            key_valid=key_valid,
        )
        key_valid = key_valid.at[:, t].set(True)
        outs.append(out)

    decoded = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(full_out[:, t_prompt:]), rtol=2e-4, atol=2e-5
    )


def test_left_padded_prompt_matches_unpadded(cfg, params):
    """A left-padded prompt (pad slots masked) must give the same last-token
    hidden state as the unpadded prompt."""
    b, n, pad = 1, 5, 3
    p = n + pad
    x_real = jax.random.normal(jax.random.PRNGKey(2), (b, n, cfg.hidden), jnp.float32)

    # Unpadded
    ck, cv = tfm.make_kv_cache(cfg, b, n, dtype=jnp.float32)
    out_ref, _ = tfm.stack_forward(
        params,
        cfg,
        x_real,
        jnp.broadcast_to(jnp.arange(n), (b, n)),
        kv_caches=(ck, cv),
        cache_len=jnp.int32(0),
        attn_mask=jnp.ones((b, n), bool),
        key_valid=jnp.zeros((b, n), bool),
    )

    # Left-padded with garbage in the pad region
    garbage = jax.random.normal(jax.random.PRNGKey(3), (b, pad, cfg.hidden), jnp.float32) * 50
    x_pad = jnp.concatenate([garbage, x_real], axis=1)
    rope_pos = jnp.maximum(jnp.arange(p) - pad, 0)[None]
    mask = (jnp.arange(p) >= pad)[None]
    ck, cv = tfm.make_kv_cache(cfg, b, p, dtype=jnp.float32)
    out_pad, _ = tfm.stack_forward(
        params,
        cfg,
        x_pad,
        rope_pos,
        kv_caches=(ck, cv),
        cache_len=jnp.int32(0),
        attn_mask=mask,
        key_valid=jnp.zeros((b, p), bool),
    )

    np.testing.assert_allclose(
        np.asarray(out_pad[:, -1]), np.asarray(out_ref[:, -1]), rtol=2e-4, atol=2e-5
    )


def test_gqa_grouping_matches_repeated_heads(cfg, params):
    """GQA scores equal full MHA with kv heads repeated per group."""
    b, t = 1, 4
    q = jax.random.normal(jax.random.PRNGKey(4), (b, t, 4, 8))
    k = jax.random.normal(jax.random.PRNGKey(5), (b, t, 2, 8))
    scores = tfm._gqa_scores(q, k)
    k_rep = jnp.repeat(k, 2, axis=2)
    ref = jnp.einsum("bqhd,bkhd->bhqk", q, k_rep)
    # GQA head ordering: head h uses kv head h // group
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rope_rotation_preserves_norm():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 4, 16))
    pos = jnp.broadcast_to(jnp.arange(3), (2, 3))
    rotated = tfm.apply_rope(x, pos, 10000.0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rotated), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_position_zero_identity():
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 2, 8))
    pos = jnp.zeros((1, 1), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(tfm.apply_rope(x, pos, 10000.0)), np.asarray(x), rtol=1e-6
    )
