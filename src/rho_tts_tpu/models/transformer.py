"""Decoder-only transformer core, shared by the codec-LM TTS model families.

Pure-functional: parameters are pytrees of jax arrays (bf16 by default),
all ops are jit/scan/shard_map friendly. Architecture features:

* grouped-query attention (GQA) with a preallocated static-shape KV cache
* rotary position embeddings (RoPE)
* RMSNorm + SwiGLU MLP (Qwen/Llama-family style)
* f32 attention/softmax accumulation over bf16 weights (MXU-friendly)

The same stack serves prefill (batched full-sequence attention over the
text + reference prompt) and incremental decode (one token per step inside
``lax.scan``). Tensor-parallel sharding for the weight tree is defined in
``rho_tts_tpu.parallel.sharding`` by matching the parameter names used here.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .quantization import matmul as qmm

Params = Dict[str, Any]


def _decode_attention_available() -> bool:
    """Use the Pallas decode-attention kernel (``RHO_TTS_TPU_DECODE_KERNEL``).

    Default OFF: measured on a real v5e (2026-08-20, batch-5/256-frame
    f8 decode) the whole-slab kernel runs ~5× slower than the einsum
    path (24× vs 129× RT end-to-end) — the per-(row,layer) pallas_call
    with the full (S, Hkv, D) cache slab in VMEM defeats XLA's software
    pipelining across the decode scan. The f8 small-shape regression it
    was written for is instead closed in ``_kv_compute_dtype`` (f8 →
    bf16 upcast, which XLA feeds to the MXU natively). ``1`` forces the
    kernel (auto-interprets off-TPU — used by the CPU parity tests);
    ``0`` disables explicitly.
    """
    import os

    return os.environ.get("RHO_TTS_TPU_DECODE_KERNEL", "0") == "1"


def _fused_attention_available() -> bool:
    """Use the Pallas prefill kernel on TPU backends (env-overridable)."""
    import os

    flag = os.environ.get("RHO_TTS_TPU_FUSED_ATTENTION", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        # "axon" is the relay-attached TPU backend name on dev hosts —
        # same hardware, same Mosaic lowering path as "tpu".
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    hidden: int = 2048
    layers: int = 28
    q_heads: int = 16
    kv_heads: int = 8
    head_dim: int = 128
    ffn: int = 6144
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _dense_init(key, in_dim, out_dim, dtype):
    scale = 1.0 / np.sqrt(in_dim)
    return (jax.random.normal(key, (in_dim, out_dim), jnp.float32) * scale).astype(dtype)


def init_block(key, cfg: TransformerConfig) -> Params:
    ks = jax.random.split(key, 8)
    qkv_out = (cfg.q_heads + 2 * cfg.kv_heads) * cfg.head_dim
    return {
        "attn_norm": jnp.ones((cfg.hidden,), jnp.float32),
        "wqkv": _dense_init(ks[0], cfg.hidden, qkv_out, cfg.dtype),
        "wo": _dense_init(ks[1], cfg.q_heads * cfg.head_dim, cfg.hidden, cfg.dtype),
        "mlp_norm": jnp.ones((cfg.hidden,), jnp.float32),
        "w_gate": _dense_init(ks[2], cfg.hidden, cfg.ffn, cfg.dtype),
        "w_up": _dense_init(ks[3], cfg.hidden, cfg.ffn, cfg.dtype),
        "w_down": _dense_init(ks[4], cfg.ffn, cfg.hidden, cfg.dtype),
    }


def init_stack(key, cfg: TransformerConfig) -> Params:
    keys = jax.random.split(key, cfg.layers)
    blocks = [init_block(k, cfg) for k in keys]
    # Stack per-layer params along a leading axis so the whole stack is one
    # pytree of (layers, ...) arrays — scan-over-layers ready.
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {"blocks": stacked, "final_norm": jnp.ones((cfg.hidden,), jnp.float32)}


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight).astype(x.dtype)


def rope_freqs(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotate pairs (x[..., :d/2], x[..., d/2:]) — Llama/Qwen convention.

    x: (B, T, H, D); positions: (B, T).
    """
    d = x.shape[-1]
    inv = jnp.asarray(rope_freqs(d, theta), jnp.float32)
    angles = positions[..., None].astype(jnp.float32) * inv  # (B, T, D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def _split_qkv(qkv: jnp.ndarray, cfg: TransformerConfig):
    b, t, _ = qkv.shape
    q_sz = cfg.q_heads * cfg.head_dim
    kv_sz = cfg.kv_heads * cfg.head_dim
    q = qkv[..., :q_sz].reshape(b, t, cfg.q_heads, cfg.head_dim)
    k = qkv[..., q_sz : q_sz + kv_sz].reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = qkv[..., q_sz + kv_sz :].reshape(b, t, cfg.kv_heads, cfg.head_dim)
    return q, k, v


def _kv_compute_dtype(kv: jnp.ndarray):
    """Upcast dtype for attention dots over the KV cache.

    bf16 caches keep the f32 upcast: XLA recognizes bf16→f32 + dot as a
    native bf16 MXU dot with f32 accumulation, so nothing materializes.
    f8 caches upcast to bf16 instead — e4m3 → bf16 is EXACT (4-bit
    exponent and 3-bit mantissa both fit) and the dot then runs as the
    same native bf16 MXU op; upcasting f8 to f32 would instead force XLA
    to emit a separate convert pass whose materialized f32 K/V costs more
    than the halved f8 read saves (BASELINE 5k8's −25% at small shapes).
    Accumulation stays f32 via preferred_element_type either way.

    Deliberate extra truncation for f8 caches: ``_gqa_mix`` also casts
    the f32 softmax probs down to bf16 so the P·V dot is a native bf16
    MXU op (a mixed bf16×f32 dot would not be). This is lossy relative
    to the bf16-cache path (which keeps probs f32) but sits well inside
    the documented f8 quality tradeoff — covered by
    ``test_f8_cache_logits_close_to_bf16``.
    """
    return jnp.bfloat16 if kv.dtype == jnp.float8_e4m3fn else jnp.float32


def _gqa_scores(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """(B,Tq,Hq,D) x (B,Tk,Hkv,D) -> (B,Hq,Tq,Tk) with GQA head grouping."""
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    ct = _kv_compute_dtype(k)
    qg = q.reshape(b, tq, hkv, group, d)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg.astype(ct), k.astype(ct),
        preferred_element_type=jnp.float32,
    )
    return scores.reshape(b, hkv * group, tq, k.shape[1])


def _gqa_mix(probs: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B,Hq,Tq,Tk) x (B,Tk,Hkv,D) -> (B,Tq,Hq,D)."""
    b, hq, tq, tk = probs.shape
    hkv = v.shape[2]
    group = hq // hkv
    ct = _kv_compute_dtype(v)
    pg = probs.reshape(b, hkv, group, tq, tk)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", pg.astype(ct), v.astype(ct),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, tq, hq, v.shape[3])


# ---------------------------------------------------------------------------
# Block forward (prefill and single-step decode share this path)
# ---------------------------------------------------------------------------


def block_forward(
    params: Params,
    cfg: TransformerConfig,
    x: jnp.ndarray,  # (B, T, hidden)
    positions: jnp.ndarray,  # (B, T) RoPE positions of the current tokens
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (B, S, Hkv, D) each
    cache_len: Optional[jnp.ndarray],  # scalar or (B,): cache slots already used
    attn_mask: Optional[jnp.ndarray],  # (B, T) validity of current tokens
    key_valid: Optional[jnp.ndarray] = None,  # (B, S) validity of cache slots
    fused_prefill: bool = False,  # chunk fills an empty cache → Pallas kernel
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One transformer block. Returns (output, updated_kv).

    With a cache: new K/V are written at slots ``cache_len + arange(T)`` and
    attention spans the cache (slots gated by ``key_valid``) plus the new
    tokens, causal in slot order. Prompts are left-padded into the cache so
    every row's last real token lands on the same slot; ``key_valid`` masks
    the pad slots. Without a cache: plain causal attention over T.
    """
    b, t, _ = x.shape
    scale = 1.0 / np.sqrt(cfg.head_dim)

    h = rms_norm(x, params["attn_norm"], cfg.rms_eps)
    qkv = qmm(h, params["wqkv"])
    q, k, v = _split_qkv(qkv, cfg)
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)

    if kv_cache is not None:
        raise ValueError(
            "Cached attention moved to the stacked-cache path inside "
            "stack_forward (_block_forward_cached); pass caches there."
        )

    scores = _gqa_scores(q, k) * scale  # (B, Hq, T, T)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    mask = causal
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, None, :]
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    attn = _gqa_mix(probs, v)
    new_cache = (k, v)

    attn = attn.reshape(b, t, cfg.q_heads * cfg.head_dim).astype(x.dtype)
    x = x + qmm(attn, params["wo"])

    h = rms_norm(x, params["mlp_norm"], cfg.rms_eps)
    gate = jax.nn.silu(qmm(h, params["w_gate"]).astype(jnp.float32))
    up = qmm(h, params["w_up"]).astype(jnp.float32)
    x = x + qmm((gate * up).astype(x.dtype), params["w_down"])
    return x, new_cache


def _block_forward_cached(
    params: Params,
    cfg: TransformerConfig,
    x: jnp.ndarray,  # (B, T, hidden)
    positions: jnp.ndarray,  # (B, T)
    ck_all: jnp.ndarray,  # (L, B, S, Hkv, D) — full stacked K cache
    cv_all: jnp.ndarray,  # (L, B, S, Hkv, D)
    layer: int,  # static layer index
    slot: jnp.ndarray,  # int32 write slot: scalar (batch-uniform) or (B,)
    attn_mask: Optional[jnp.ndarray],
    key_valid: Optional[jnp.ndarray],  # (B, S), ALREADY includes new slots
    fused_prefill: bool,
    kv_window: Optional[int] = None,  # static: attend only to slots [0, kv_window)
    slot_causal: bool = True,  # static: slot index reflects time order
    block_causal: bool = False,  # static: with slot_causal=False, causal WITHIN
    # the newly written block (ring-buffer T>1 writes, e.g. speculative verify)
    sp_mesh=None,  # static Mesh: sequence-parallel prefill — run the fused
    # kernel under shard_map (q/k/v sharded over the mesh 'model' axis)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One cached transformer block, writing into the stacked cache.

    Cache slots are batch-uniform (prompts are left-padded so every row
    writes the same slot range), so the write is one dynamic_update_slice
    of shape (1, B, T, Hkv, D) into the carried (L, B, S, Hkv, D) array —
    XLA updates it in place. The per-layer read is a static slice that
    fuses into the attention einsum. The previous formulation (per-row
    scatter + scan-over-layers emitting caches as ys) re-materialized the
    entire cache every decode step — ~1 ms/step at S=384 on v5e.

    ``kv_window`` (static) bounds the attention read to the cache prefix
    ``[0, kv_window)`` — decode steps early in a long utterance then read
    only the slots that can be occupied instead of the full static-S
    cache, cutting per-step attention HBM traffic proportionally. The
    caller guarantees every occupied (and newly written) slot is below
    the window.

    ``slot_causal=False`` (static) drops the slot-order causality term
    from the mask, leaving ``key_valid`` as the only gate. Correct ONLY
    for single-token decode steps (T==1): the query is the newest token
    and may attend to every valid slot regardless of where it sits.
    This is what ring-buffer KV caches need (``rho_tts_tpu.serving``):
    after a wrap, a row's older keys live at HIGHER slot indices than
    the write column, which the positional term would wrongly mask.

    ``block_causal=True`` (static, only with ``slot_causal=False``)
    restores causality WITHIN the newly written block ``[slot, slot+T)``:
    query ``j`` may not see block keys past its own position. This is the
    T>1 ring-buffer write mode (speculative verification forwards):
    the block is contiguous by construction (per-row columns rewind after
    acceptance and never wrap — the serving ring is sized so a row's
    lifetime fits), older history stays key_valid-gated regardless of
    where it sits in the ring.

    ``slot`` may be a (B,) vector — per-row write columns. The write then
    scatters each row's T new slots at its own offset (speculative
    serving: rows desynchronize, each reuses its rejected columns).
    Out-of-range per-row columns drop (rows past their frame budget are
    about to be retired by the host; their emissions are discarded).
    """
    b, t, _ = x.shape
    scale = 1.0 / np.sqrt(cfg.head_dim)

    h = rms_norm(x, params["attn_norm"], cfg.rms_eps)
    qkv = qmm(h, params["wqkv"])
    q, k, v = _split_qkv(qkv, cfg)
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)

    s = ck_all.shape[2]
    per_row = slot.ndim == 1
    if per_row:
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        cols = slot[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        ck_all = ck_all.at[layer, rows, cols].set(
            k.astype(ck_all.dtype), mode="drop"
        )
        cv_all = cv_all.at[layer, rows, cols].set(
            v.astype(cv_all.dtype), mode="drop"
        )
    else:
        lz = jnp.int32(layer)
        z = jnp.int32(0)
        ck_all = jax.lax.dynamic_update_slice(
            ck_all, k.astype(ck_all.dtype)[None], (lz, z, slot, z, z)
        )
        cv_all = jax.lax.dynamic_update_slice(
            cv_all, v.astype(cv_all.dtype)[None], (lz, z, slot, z, z)
        )

    if fused_prefill and t > 1 and _fused_attention_available():
        # The chunk IS the whole attention context (empty cache): run
        # the fused Pallas kernel over the fresh q/k/v directly. Under
        # sequence-parallel prefill the kernel runs inside shard_map
        # (GSPMD can't partition a pallas_call): K/V all-gather over
        # 'model', queries stay local with a global position offset.
        from ..ops.pallas.attention import (
            fused_gqa_attention,
            sp_fused_gqa_attention,
        )

        mask = attn_mask if attn_mask is not None else jnp.ones((b, t), bool)
        if sp_mesh is not None:
            attn = sp_fused_gqa_attention(
                q, k, v, mask, mesh=sp_mesh, causal=True
            ).astype(jnp.float32)
        else:
            attn = fused_gqa_attention(q, k, v, mask, causal=True).astype(jnp.float32)
    elif t == 1 and key_valid is not None and _decode_attention_available():
        # Single-token decode through the fused kernel: the complete
        # (B, w) validity mask (slot causality + ring key_valid) is cheap
        # VPU work built here; the expensive S×D KV reads happen inside
        # the kernel with the f8→f32 convert folded into the loads.
        from ..ops.pallas.decode_attention import decode_gqa_attention

        w = s if kv_window is None else min(kv_window, s)
        mask2 = key_valid[:, :w]
        if slot_causal:
            key_pos = jnp.arange(w, dtype=jnp.int32)[None, :]
            slot_b2 = slot[:, None] if per_row else slot
            mask2 = mask2 & (key_pos <= slot_b2)
        attn = decode_gqa_attention(
            q, ck_all[layer][:, :w], cv_all[layer][:, :w],
            jnp.broadcast_to(mask2, (b, w)),
        ).astype(jnp.float32)
    else:
        w = s if kv_window is None else min(kv_window, s)
        scores = _gqa_scores(q, ck_all[layer][:, :w]) * scale  # (B, Hq, T, w)
        # Broadcastable block start: (1,1,1,1) scalar or (B,1,1,1) per-row.
        slot_b = slot[:, None, None, None] if per_row else slot
        if slot_causal:
            key_pos = jnp.arange(w)[None, None, None, :]
            query_abs = slot_b + jnp.arange(t)[None, None, :, None]
            mask = key_pos <= query_abs
            if key_valid is not None:
                mask = mask & key_valid[:, None, None, :w]
        else:
            mask = key_valid[:, None, None, :w]
            if block_causal and t > 1:
                key_pos = jnp.arange(w)[None, None, None, :]
                q_idx = jnp.arange(t)[None, None, :, None]
                in_block = (key_pos >= slot_b) & (key_pos < slot_b + t)
                future = in_block & ((key_pos - slot_b) > q_idx)
                mask = mask & ~future
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = _gqa_mix(probs, cv_all[layer][:, :w])  # (B, T, Hq, D)

    attn = attn.reshape(b, t, cfg.q_heads * cfg.head_dim).astype(x.dtype)
    x = x + qmm(attn, params["wo"])

    h = rms_norm(x, params["mlp_norm"], cfg.rms_eps)
    gate = jax.nn.silu(qmm(h, params["w_gate"]).astype(jnp.float32))
    up = qmm(h, params["w_up"]).astype(jnp.float32)
    x = x + qmm((gate * up).astype(x.dtype), params["w_down"])
    return x, ck_all, cv_all


def stack_forward(
    params: Params,
    cfg: TransformerConfig,
    x: jnp.ndarray,
    positions: jnp.ndarray,
    kv_caches: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (L,B,S,Hkv,D) x2
    cache_len: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    key_valid: Optional[jnp.ndarray] = None,
    fused_prefill: bool = False,
    kv_window: Optional[int] = None,  # static attention-read bound (see
    # _block_forward_cached)
    slot_causal: bool = True,  # static; False = key_valid-only mask (T==1
    # ring-buffer decode, see _block_forward_cached)
    block_causal: bool = False,  # static; in-block causality for T>1 ring
    # writes (speculative verify, see _block_forward_cached)
    sp_mesh=None,  # static Mesh: SP prefill keeps the fused kernel (see
    # _block_forward_cached)
):
    """Run the full block stack via scan-over-layers.

    Returns (hidden_states, new_caches) where caches are stacked
    (layers, B, S, Hkv, D) K and V arrays.
    """
    blocks = params["blocks"]

    if kv_caches is None:
        def body(carry, layer_params):
            h = carry
            out, (k, v) = block_forward(
                layer_params, cfg, h, positions, None, None, attn_mask
            )
            return out, (k, v)

        x, (ks, vs) = jax.lax.scan(body, x, blocks)
    else:
        ck_all, cv_all = kv_caches  # (L, B, S, Hkv, D) each
        b, t, _ = x.shape
        slot = jnp.asarray(cache_len, jnp.int32)
        if key_valid is not None:
            # Mark this forward's slots valid ONCE for all layers (the old
            # per-layer scatter re-materialized a (B, S) mask 30×/step).
            new_valid = (
                jnp.ones((b, t), bool) if attn_mask is None else attn_mask
            )
            if slot.ndim == 1:  # per-row write columns
                cols = slot[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
                key_valid = key_valid.at[
                    jnp.arange(b, dtype=jnp.int32)[:, None], cols
                ].set(new_valid, mode="drop")
            else:
                key_valid = jax.lax.dynamic_update_slice(
                    key_valid, new_valid, (jnp.int32(0), slot)
                )
        # Python-unrolled layers: the stacked caches thread through as a
        # carried value updated in place; a scan-over-layers would emit
        # them as ys, copying the whole cache every step.
        for layer in range(int(ck_all.shape[0])):
            lp = jax.tree.map(lambda a: a[layer], blocks)
            x, ck_all, cv_all = _block_forward_cached(
                lp, cfg, x, positions, ck_all, cv_all, layer, slot,
                attn_mask, key_valid, fused_prefill, kv_window, slot_causal,
                block_causal, sp_mesh,
            )
        ks, vs = ck_all, cv_all

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return x, (ks, vs)


def kv_cache_dtype(batch=None, max_len=None):
    """KV-cache storage dtype, env-selectable (``RHO_TTS_TPU_KV_DTYPE``).

    ``bf16`` (default), ``f8`` (float8_e4m3fn), or ``auto``. fp8
    STORAGE-ONLY quantization halves per-step KV HBM reads with no scale
    bookkeeping: writes already cast to the cache dtype and the
    attention einsums upcast in-register (bf16 caches → f32; f8 caches →
    bf16 so the dots stay native MXU ops, see ``_kv_compute_dtype``), so
    the convert fuses into the reads.

    The win is SHAPE-DEPENDENT (BASELINE 5k8, re-measured r5 after the
    bf16-dots fix): f8 pays when the KV read is a large share of step
    HBM traffic — batch 16×384 +23%, batch 5×512 +23% — but at small
    shapes XLA's f8 read path costs more than the bandwidth it saves
    (batch 5×256: −27%). ``auto`` applies exactly that boundary: f8
    when ``batch × max_len ≥ RHO_TTS_TPU_KV_AUTO_THRESHOLD`` (default
    2048 rows×frames, between the measured 1280-loss and 2560-win
    points), bf16 below. ``auto`` stays opt-in because e4m3 carries ~2
    significant digits — greedy token sequences can diverge from the
    bf16 cache, and a QUALITY property should not flip silently with
    batch shape (quality-sensitive gates keep the default).
    """
    name = _os.environ.get("RHO_TTS_TPU_KV_DTYPE", "bf16")
    if name == "auto":
        if batch is None or max_len is None:
            return jnp.bfloat16  # no shape at hand — conservative
        threshold = int(_os.environ.get("RHO_TTS_TPU_KV_AUTO_THRESHOLD", "2048"))
        return jnp.float8_e4m3fn if batch * max_len >= threshold else jnp.bfloat16
    table = {"bf16": jnp.bfloat16, "f8": jnp.float8_e4m3fn, "fp8": jnp.float8_e4m3fn}
    if name not in table:
        raise ValueError(f"RHO_TTS_TPU_KV_DTYPE={name!r}; expected bf16|f8|auto")
    return table[name]


def make_kv_cache(cfg: TransformerConfig, batch: int, max_len: int, dtype=None):
    if dtype is None:
        dtype = kv_cache_dtype(batch, max_len)
    shape = (cfg.layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
