"""Fused single-token (decode) GQA attention with in-kernel KV dequant.

One program per batch row: the row's queries (all Hq heads), its full
K/V cache slab (S, Hkv, D), and the key-validity mask live in VMEM; the
f8 (or bf16) K/V loads convert to f32 IN-REGISTER as part of the read,
and scores → mask → softmax → value-mix happen per KV head (a static
unrolled loop — Hkv is 8 or less everywhere here) with no HBM
intermediates. Blocking note: Mosaic requires the last two dims of every
block to be divisible by (8, 128) or equal to the array dims, so the
cache's (…, Hkv, D) trailing dims must be taken WHOLE — a per-head block
of (1, S, 1, D) does not lower on real TPUs (it only works in interpret
mode). Taking the full slab per program keeps total HBM traffic
identical (each program reads exactly its row's cache once).

Why this exists: with fp8 KV-cache storage (``RHO_TTS_TPU_KV_DTYPE=f8``,
``models.transformer.kv_cache_dtype``) XLA's decode attention at SMALL
shapes (batch-5 / 256-frame, the headline config) spends more on its
separate f8→f32 convert pass than the halved KV read saves — BASELINE
5k8 measured 127× → 95× (−25%). Folding the convert into the kernel's
loads removes that pass entirely, so fp8's bandwidth win survives at
small shapes instead of only at batch-16/384+.

The cache layout (B, S, Hkv, D) is consumed directly — the BlockSpec
picks the (1, S, Hkv, D) slab per program, no transpose of the cache is
ever materialized. Reads are bounded to ``kv_window`` by slicing before
the call (static shapes).

STATUS — measured NEGATIVE, default OFF (2026-08-20, real v5e): at the
batch-5/256-frame headline shape this kernel decodes at 24× RT vs 129×
for the einsum path — the per-(row, layer) pallas_call with the whole
(S, Hkv, D) slab resident in VMEM serializes against the decode scan's
weight streaming, where XLA's einsum lowering pipelines the KV reads
under the block matmuls. The f8 small-shape dequant regression it
targeted is closed in ``models.transformer._kv_compute_dtype`` instead
(f8 → bf16 upcast is exact for e4m3 and feeds the MXU natively). Kept
as an opt-in (``RHO_TTS_TPU_DECODE_KERNEL=1``, used by the CPU parity
tests in interpret mode) and as the starting point for a grid-over-
(row, head) rework; ``0``/unset keeps the einsum path.

Reference scope: decode attention lives inside the reference's opaque
CUDA deps (flash-attn / torch sdpa under ``qwen_tts``); this is the
TPU-native equivalent for the serving hot loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANE = 128


def _decode_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, hkv):
    """q (1, Hkv, G, D), k/v (1, S, Hkv, D), mask (1, 1, S) int8 →
    o (1, Hkv, G, D). Static unrolled loop over the Hkv heads."""
    valid = mask_ref[0, 0, :][None, :] != 0  # (1, S)
    for hi in range(hkv):
        q = q_ref[0, hi].astype(jnp.float32)  # (G, D)
        k = k_ref[0, :, hi, :].astype(jnp.float32)  # (S, D) — dequant in-register
        v = v_ref[0, :, hi, :].astype(jnp.float32)

        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, S)
        scores = jnp.where(valid, scores, -1e30)

        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(denom, 1e-30)
        o_ref[0, hi] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_gqa_attention(
    q: jnp.ndarray,  # (B, 1, Hq, D) — the single decode-step queries
    k: jnp.ndarray,  # (B, S, Hkv, D) KV cache slice (f8 / bf16 storage)
    v: jnp.ndarray,  # (B, S, Hkv, D)
    mask: jnp.ndarray,  # (B, S) bool — the COMPLETE validity mask (the
    # caller folds in slot causality / ring key_valid / windows)
    interpret: bool = None,
) -> jnp.ndarray:
    """Fused decode attention; returns (B, 1, Hq, D) in q's dtype.

    ``interpret=None`` auto-selects interpret mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, t, hq, d = q.shape
    assert t == 1, "decode kernel handles single-token steps"
    s, hkv = k.shape[1], k.shape[2]
    group = hq // hkv
    scale = 1.0 / np.sqrt(d)

    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    s_pad = ((s + _LANE - 1) // _LANE) * _LANE

    qg = q[:, 0].reshape(b, hkv, group, d)  # (B, Hkv, G, D)
    if d_pad != d:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
    if s_pad != s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    mask8 = jnp.pad(mask.astype(jnp.int8), ((0, 0), (0, s_pad - s)))[:, None, :]

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, hkv=hkv),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d_pad), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, group, d_pad), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, s_pad, hkv, d_pad), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, s_pad, hkv, d_pad), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, group, d_pad), lambda bi: (bi, 0, 0, 0)
        ),
        interpret=interpret,
    )(qg, k, v, mask8)

    return out.reshape(b, 1, hq, d_pad)[..., :d]


def reference_decode_attention(q, k, v, mask):
    """Einsum oracle with identical semantics (tests; off-TPU path is the
    transformer's own einsum branch)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    scale = 1.0 / np.sqrt(d)
    qg = q.reshape(b, t, hkv, group, d).astype(jnp.float32)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k.astype(jnp.float32)) * scale
    scores = jnp.where(mask[:, None, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, hq, d).astype(q.dtype)
