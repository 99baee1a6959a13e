"""Pallas fused attention vs the einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rho_tts_tpu.ops.pallas.attention import (
    fused_gqa_attention,
    reference_gqa_attention,
)


def make_inputs(b=2, t=40, s=40, hq=4, hkv=2, d=64, seed=0, valid_from=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, t, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hkv, d), jnp.float32)
    mask = jnp.arange(s)[None, :] >= valid_from
    mask = jnp.broadcast_to(mask, (b, s))
    return q, k, v, mask


@pytest.mark.parametrize("causal", [True, False])
def test_matches_reference(causal):
    q, k, v, mask = make_inputs()
    ours = fused_gqa_attention(q, k, v, mask, causal=causal, interpret=True)
    ref = reference_gqa_attention(q, k, v, mask, causal=causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_left_padded_mask():
    """Invalid (left-pad) keys must not leak into the softmax.

    Queries in the pad region have no valid keys; their outputs are
    unspecified (masked downstream), so only valid-query rows compare.
    """
    q, k, v, mask = make_inputs(valid_from=13)
    ours = fused_gqa_attention(q, k, v, mask, causal=True, interpret=True)
    ref = reference_gqa_attention(q, k, v, mask, causal=True)
    np.testing.assert_allclose(
        np.asarray(ours)[:, 13:], np.asarray(ref)[:, 13:], atol=2e-5, rtol=2e-5
    )


def test_nonsquare_lengths():
    q, k, v, mask = make_inputs(t=17, s=33)
    ours = fused_gqa_attention(q, k, v, mask, causal=False, interpret=True)
    ref = reference_gqa_attention(q, k, v, mask, causal=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_head_dim_128():
    q, k, v, mask = make_inputs(d=128, hq=8, hkv=4)
    ours = fused_gqa_attention(q, k, v, mask, causal=True, interpret=True)
    ref = reference_gqa_attention(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16_inputs():
    q, k, v, mask = make_inputs()
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ours = fused_gqa_attention(qb, kb, vb, mask, causal=True, interpret=True)
    ref = reference_gqa_attention(qb, kb, vb, mask, causal=True)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )
