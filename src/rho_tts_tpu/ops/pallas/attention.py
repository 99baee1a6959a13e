"""Fused GQA prefill attention as a Pallas TPU kernel.

One program per (batch, query-head, query-block): the query block, the
full key/value rows for the matching KV head, and the validity mask live
in VMEM; scores, masking, softmax, and the value mix all happen in one
kernel with no HBM intermediates. Grouped-query attention is expressed in
the BlockSpec index maps (query head h reads KV head ``h // group``), so
no KV replication is ever materialized.

Prompt lengths in this stack are bucketed (≤ a few thousand frames), so
the whole K/V row fits VMEM comfortably; a streaming flash variant is
unnecessary at these shapes.

Used by the codec-LM prefill (``models.transformer.stack_forward``) on TPU
backends; the einsum reference path remains for CPU and as the test
oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
_LANE = 128


def _attention_kernel(
    q_ref, off_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, causal, block_q
):
    """q (BQ, D), off (1,), k/v (S, D), mask (1, S) int8 → o (BQ, D).

    ``off`` is the GLOBAL position of the first query row — nonzero when
    the queries are one sequence-parallel shard of a longer prompt whose
    keys were all-gathered (``sp_fused_gqa_attention``)."""
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (S, D)

    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, S)

    s = scores.shape[1]
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 1)
    valid = mask_ref[0, 0, :][None, :] != 0
    if causal:
        q_pos = (
            off_ref[0]
            + qi * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 0)
        )
        valid = valid & (key_pos <= q_pos)
    scores = jnp.where(valid, scores, -1e30)

    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(denom, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def fused_gqa_attention(
    q: jnp.ndarray,  # (B, T, Hq, D)
    k: jnp.ndarray,  # (B, S, Hkv, D)
    v: jnp.ndarray,  # (B, S, Hkv, D)
    attn_mask: jnp.ndarray,  # (B, S) bool — key validity
    causal: bool = True,
    interpret: bool = None,
    q_offset=None,  # global position of query row 0 (scalar; SP shards)
) -> jnp.ndarray:
    """Fused attention; returns (B, T, Hq, D) in q's dtype.

    Queries/keys are padded to the 128-lane tile internally; ``attn_mask``
    gates padded keys so padding never leaks into the softmax.
    ``interpret=None`` auto-selects interpret mode off-TPU (the kernel
    then runs as plain JAX — used by CPU tests and virtual-device meshes).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, t, hq, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    group = hq // hkv
    scale = 1.0 / np.sqrt(d)

    # Pad head_dim to the lane width and seq dims to the query block.
    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    t_pad = ((t + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    s_pad = ((s + _LANE - 1) // _LANE) * _LANE

    qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, Hq, T, D)
    kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, Hkv, S, D)
    vt = jnp.transpose(v, (0, 2, 1, 3))

    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)))
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))
    mask8 = jnp.pad(attn_mask.astype(jnp.int8), ((0, 0), (0, s_pad - s)))[:, None, :]

    grid = (b, hq, t_pad // BLOCK_Q)
    off = (
        jnp.zeros((1,), jnp.int32)
        if q_offset is None
        else jnp.asarray(q_offset, jnp.int32).reshape(1)
    )

    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, scale=scale, causal=causal, block_q=BLOCK_Q
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, t_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, BLOCK_Q, d_pad),
                lambda bi, hi, qi: (bi, hi, qi, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # query-offset scalar
            pl.BlockSpec(
                (1, 1, s_pad, d_pad),
                lambda bi, hi, qi, g=group: (bi, hi // g, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d_pad),
                lambda bi, hi, qi, g=group: (bi, hi // g, 0, 0),
            ),
            pl.BlockSpec((1, 1, s_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BLOCK_Q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        interpret=interpret,
    )(qt, off, kt, vt, mask8)

    out = out[:, :, :t, :d]
    return jnp.transpose(out, (0, 2, 1, 3))


def sp_fused_gqa_attention(
    q: jnp.ndarray,  # (B, T, Hq, D) — T sharded over mesh 'model'
    k: jnp.ndarray,  # (B, T, Hkv, D) — same sharding
    v: jnp.ndarray,
    attn_mask: jnp.ndarray,  # (B, T) bool
    mesh,
    causal: bool = True,
    interpret: bool = None,
) -> jnp.ndarray:
    """Sequence-parallel wrapper: the fused kernel under ``shard_map``.

    GSPMD has no partitioning rule for ``pallas_call``, so sequence-
    parallel prefill used to fall back to the einsum path
    (``parallel/inference.py``) and forfeit the kernel's +19% prefill
    win. Manual partitioning restores it: each chip all-gathers K/V/mask
    over the ``model`` axis (the one unavoidable SP collective, riding
    ICI) and runs the kernel on its LOCAL query shard with a global
    query-position offset so the causal mask is computed against
    absolute positions. Batch rows stay split over ``data``.

    Output sharding equals the input sharding (B over data, T over
    model) — exactly what GSPMD propagates for the surrounding matmuls,
    so no resharding is inserted at the region boundary.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mp = mesh.shape.get("model", 1)
    shard_t = q.shape[1] // mp

    def local(q_l, k_l, v_l, m_l):
        k_f = jax.lax.all_gather(k_l, "model", axis=1, tiled=True)
        v_f = jax.lax.all_gather(v_l, "model", axis=1, tiled=True)
        m_f = jax.lax.all_gather(m_l, "model", axis=1, tiled=True)
        off = jax.lax.axis_index("model").astype(jnp.int32) * shard_t
        return fused_gqa_attention(
            q_l, k_f, v_f, m_f, causal=causal, interpret=interpret,
            q_offset=off,
        )

    seq4 = P("data", "model", None, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(seq4, seq4, seq4, P("data", "model")),
        out_specs=seq4,
        check_rep=False,
    )(q, k, v, attn_mask)


def reference_gqa_attention(q, k, v, attn_mask, causal=True):
    """Einsum oracle with identical semantics (used off-TPU and in tests)."""
    b, t, hq, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    group = hq // hkv
    scale = 1.0 / np.sqrt(d)

    qg = q.reshape(b, t, hkv, group, d).astype(jnp.float32)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k.astype(jnp.float32)) * scale
    scores = scores.reshape(b, hq, t, s)

    valid = attn_mask[:, None, None, :]
    if causal:
        key_pos = jnp.arange(s)[None, None, None, :]
        q_pos = jnp.arange(t)[None, None, :, None]
        valid = valid & (key_pos <= q_pos)
    scores = jnp.where(valid, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    pg = probs.reshape(b, hkv, group, t, s)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", pg, v.astype(jnp.float32))
    return out.reshape(b, t, hq, d).astype(q.dtype)
