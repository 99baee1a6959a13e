"""Speculative decoding inside the continuous-batching ServingEngine.

The single-stream speculative path (``models.qwen.speculative``) shifts
sequential work onto a cheap distilled draft; this module batches the
draft-propose / target-verify round over the serving SLOT BATCH, so every
resident request gets the speculation win at once. This attacks the
reference's hot loop (``/root/reference/src/rho_tts/base_tts.py:770-898``)
with the framework's two biggest levers combined: continuous batching and
speculation.

Design (``RHO_TTS_TPU_SPEC_ROUNDS`` rounds — default 4 — scanned into
ONE compiled program per dispatch, zero host syncs; a single round's
structure below):

* **Draft phase** — the draft model decodes ``gamma+1`` single-token steps
  over the whole slot batch into its OWN ring cache (same ring design as
  the target: batch-uniform write column, ``key_valid`` masking,
  RoPE-by-logical-position). Proposals sample per-row from the
  schedule-reproducible ``fold_in(seed, frame, tag)`` keys.
* **Verify phase** — the target scores all proposals in ONE ``T=gamma+1``
  forward (the MXU-shaped replacement for gamma sequential target steps).
  The verify block writes ``gamma+1`` consecutive columns at each row's
  OWN write column, and the ``block_causal`` mask mode
  (``models.transformer``) restores in-block causality while history
  stays ``key_valid``-gated wherever it sits.
* **Per-row acceptance + column rewind** — standard speculative sampling
  (min(1, p/q), Leviathan et al. arXiv:2211.17192) vmapped over rows.
  Rows desynchronize (each accepts 1..gamma+1 tokens per round); per-row
  write columns absorb this: after acceptance each row REWINDS its
  column to just past its last kept key, so rejected columns are reused
  by the next round instead of being consumed forever. Per-row
  RoPE/frame counters advance by each row's own acceptance count, and
  the code log scatters at per-row logical frame positions. With
  ``top_k=1`` the process is exact target greedy (a rejected slot
  resamples from ``norm(max(p-q,0))`` = the target argmax), so greedy
  parity vs the one-shot path is preserved.
* **Cache capacity** — with rewind, a row's columns are exactly its
  prompt plus its emitted keys plus a transient ``gamma+1`` block, so
  the cache is sized like the non-speculative ring
  (``max_prompt + max_frames + slack``) — NOT ``(gamma+1) x max_frames``.
  Rows reset to column 0 at admission (columns are private to a row:
  the batch dimension already separates rows), so there is no wrap at
  all; the per-step attention HBM read stays the size speculation is
  trying to beat, which is what makes the draft/verify round a net win
  (one target forward + gamma+1 tiny draft steps replacing gamma+1
  target steps).

``residual_mode`` follows the single-stream semantics
(``models.qwen.speculative._spec_decode``): "strict" truncates acceptance
at the first draft/target residual-codebook disagreement (provably
exactly-conditioned emissions — the greedy-parity mode), "draft" emits
the distilled draft's residual books on accepted slots (no truncation,
the serving throughput mode).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .models import transformer as tfm
from .models.qwen.model import _predict_residuals

Params = Dict[str, Any]

# Distinct fold tags so the draft-proposal, acceptance, and resample draws
# at the same (seed, frame) are independent streams.
_TAG_DRAFT = 1
_TAG_ACCEPT = 2
_TAG_EXTRA = 3


def _fold_keys(seeds: jnp.ndarray, frames: jnp.ndarray, tag: int):
    """Per-element PRNG keys from (seed, frame, tag); any matching shapes."""
    base = jax.random.fold_in(jax.random.PRNGKey(0x5BEC), tag)
    flat_s = seeds.reshape(-1).astype(jnp.uint32)
    flat_f = frames.reshape(-1).astype(jnp.uint32)
    keys = jax.vmap(
        lambda s, f: jax.random.fold_in(jax.random.fold_in(base, s), f)
    )(flat_s, flat_f)
    return keys, seeds.shape


def _embed_codes(params: Params, codes: jnp.ndarray) -> jnp.ndarray:
    """(…, nq) code vectors → (…, H): sum over codebook embeddings."""
    embs = params["audio_embed"]
    e = embs[0][codes[..., 0]]
    for q in range(1, codes.shape[-1]):
        e = e + embs[q][codes[..., q]]
    return e


def _topk_dist_rows(logits: jnp.ndarray, temperature: jnp.ndarray, top_k: int):
    """Row-wise full-vocab distribution of the top-k/temperature sampler.

    logits (..., V), temperature broadcastable to logits[..., 0] → (..., V).
    """
    v = logits.shape[-1]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-5)[..., None]
    vals, idxs = jax.lax.top_k(scaled, top_k)
    probs_k = jax.nn.softmax(vals, axis=-1)
    flat_i = idxs.reshape(-1, top_k)
    flat_p = probs_k.reshape(-1, top_k)
    out = jnp.zeros((flat_i.shape[0], v), jnp.float32)
    out = jax.vmap(lambda o, i, p: o.at[i].set(p))(out, flat_i, flat_p)
    return out.reshape(logits.shape[:-1] + (v,))


def _sample_rows(dist: jnp.ndarray, seeds, frames, tag: int) -> jnp.ndarray:
    """Sample one index per row of ``dist`` (..., V) with (seed, frame, tag)
    keys; shapes of seeds/frames match dist[..., 0]."""
    keys, shape = _fold_keys(seeds, frames, tag)
    flat = dist.reshape(-1, dist.shape[-1])
    logp = jnp.log(jnp.maximum(flat, 1e-30))
    g = jax.vmap(lambda k: jax.random.gumbel(k, (flat.shape[-1],)))(keys)
    pick = jnp.argmax(jnp.where(flat > 0, logp + g, -jnp.inf), axis=-1)
    return pick.reshape(shape).astype(jnp.int32)


def _uniform_rows(seeds, frames, tag: int) -> jnp.ndarray:
    keys, shape = _fold_keys(seeds, frames, tag)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
    return u.reshape(shape)


def _spec_round_body(
    tp: Params,
    dp: Params,
    t_ck, t_cv, t_kv,  # target ring caches (L,B,S,h,d) ×2 + key_valid (B,S)
    d_ck, d_cv, d_kv,  # draft ring caches
    codes_buf,  # (B, F, nq) device-resident per-row code log
    cfg_t,  # static QwenTTSConfig (target)
    cfg_d,  # static (draft)
    cols,  # (B,) int32: per-row block start column (target & draft share
    # the layout: same prompts prefilled into both caches, same keeps)
    rope_next,  # (B,) rope position of each row's next input token
    last_codes,  # (B, nq) last emitted code vector per row
    done,  # (B,) bool
    active,  # (B,) bool
    seeds,  # (B,) int32 per-request sampling seeds
    temperature,  # (B,) f32
    frames_done,  # (B,) int32 real frames emitted so far per row
    min_frames,  # (B,) int32 EOS floor per row
    gamma: int,
    top_k: int,
    residual_mode: str,
):
    """One batched draft-propose / target-verify / accept round.

    Returns ``(harvest, t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
    last_codes, done, cols, rope_next, frames_done)`` where ``harvest``
    is a packed (B, 2) int32 array of ``[n_real, hit_eos]`` per row —
    ``n_real`` counts the REAL frames appended this round (EOS and pads
    excluded), ``hit_eos`` marks rows that finished. The packed array is
    the only per-round host fetch (lagged, like the non-speculative done
    bitmap). ``cols`` comes back rewound per row to just past its last
    kept key.
    """
    b = last_codes.shape[0]
    nq = cfg_t.codec.n_codebooks
    eos = cfg_t.audio_eos
    live = active & ~done

    # ---- 1. Draft proposes gamma tokens per row (gamma+1 steps: the last
    # writes x_gamma's K/V so an all-accepted round leaves no hole) -------
    def draft_step(carry, i):
        d_ck, d_cv, d_kv, codes_in = carry
        x = _embed_codes(dp, codes_in)[:, None, :]
        pos = (rope_next + i)[:, None]
        slot = cols + i  # (B,) per-row write columns
        h, (d_ck, d_cv) = tfm.stack_forward(
            dp["talker"], cfg_d.talker, x, pos,
            kv_caches=(d_ck, d_cv), cache_len=slot,
            attn_mask=live[:, None], key_valid=d_kv, slot_causal=False,
        )
        d_kv2 = d_kv.at[jnp.arange(b, dtype=jnp.int32), slot].set(
            live, mode="drop"
        )
        logits = jax.lax.dot(
            h[:, -1], dp["lm_head"], preferred_element_type=jnp.float32
        )
        sup = (frames_done + i) < min_frames
        eos_col = jnp.where(sup, -1e30, logits[:, cfg_d.audio_eos])
        logits = logits.at[:, cfg_d.audio_eos].set(eos_col)
        q = _topk_dist_rows(logits, temperature, top_k)  # (B, V)
        prim = _sample_rows(q, seeds, frames_done + i, _TAG_DRAFT)
        res_d = _predict_residuals(
            dp, cfg_d, h[:, -1], jnp.minimum(prim, cfg_d.codec.codebook_size - 1)
        )
        nxt = jnp.concatenate([prim[:, None], res_d], axis=-1)  # (B, nq)
        return (d_ck, d_cv, d_kv2, nxt), (nxt, q)

    (d_ck, d_cv, d_kv, _), (d_codes_all, qs_all) = jax.lax.scan(
        draft_step, (d_ck, d_cv, d_kv, last_codes), jnp.arange(gamma + 1)
    )
    d_codes = jnp.transpose(d_codes_all[:gamma], (1, 0, 2))  # (B, gamma, nq)
    qs = jnp.transpose(qs_all[:gamma], (1, 0, 2))  # (B, gamma, V)
    d_prim = d_codes[..., 0]  # (B, gamma)

    # ---- 2. Target verifies all proposals in ONE T=gamma+1 forward ------
    seq_codes = jnp.concatenate([last_codes[:, None, :], d_codes], axis=1)
    x = _embed_codes(tp, seq_codes)  # (B, gamma+1, H)
    positions = rope_next[:, None] + jnp.arange(gamma + 1)[None, :]
    h, (t_ck, t_cv) = tfm.stack_forward(
        tp["talker"], cfg_t.talker, x, positions,
        kv_caches=(t_ck, t_cv), cache_len=cols,
        attn_mask=jnp.broadcast_to(live[:, None], (b, gamma + 1)),
        key_valid=t_kv, slot_causal=False, block_causal=True,
    )
    hidden = cfg_t.talker.hidden
    logits_all = jax.lax.dot(
        h.reshape(b * (gamma + 1), hidden), tp["lm_head"],
        preferred_element_type=jnp.float32,
    ).reshape(b, gamma + 1, -1)
    sup = (frames_done[:, None] + jnp.arange(gamma + 1)[None, :]) < min_frames[:, None]
    eos_col = jnp.where(sup, -1e30, logits_all[..., eos])
    logits_all = logits_all.at[..., eos].set(eos_col)
    ps = _topk_dist_rows(
        logits_all, jnp.broadcast_to(temperature[:, None], (b, gamma + 1)), top_k
    )  # (B, gamma+1, V)

    # ---- 3. Accept / reject per row --------------------------------------
    p_of = jnp.take_along_axis(ps[:, :gamma], d_prim[..., None], axis=-1)[..., 0]
    q_of = jnp.take_along_axis(qs, d_prim[..., None], axis=-1)[..., 0]
    fr = frames_done[:, None] + jnp.arange(gamma)[None, :]
    u = _uniform_rows(jnp.broadcast_to(seeds[:, None], (b, gamma)), fr, _TAG_ACCEPT)
    accept = u < jnp.minimum(1.0, p_of / jnp.maximum(q_of, 1e-30))  # (B, gamma)
    acc_pad = jnp.concatenate([accept, jnp.zeros((b, 1), bool)], axis=1)
    rej = jnp.argmin(acc_pad, axis=1)  # first False
    n_p = jnp.where(accept.all(axis=1), gamma, rej).astype(jnp.int32)  # (B,)

    if residual_mode == "strict":
        res_t_draft = _predict_residuals(
            tp, cfg_t,
            h[:, :gamma].reshape(b * gamma, hidden),
            jnp.minimum(d_prim.reshape(-1), cfg_t.codec.codebook_size - 1),
        ).reshape(b, gamma, nq - 1)
        res_match = (res_t_draft == d_codes[..., 1:]).all(axis=-1)  # (B, gamma)
        m = jnp.where(
            res_match.all(axis=1), gamma, jnp.argmin(res_match, axis=1)
        ).astype(jnp.int32)
        truncated = n_p > m
        n_eff = jnp.where(truncated, m + 1, n_p)
    else:
        truncated = jnp.zeros((b,), bool)
        n_eff = n_p
    has_extra = ~truncated

    # Extra token: bonus (all accepted) from ps[:, gamma], else resample
    # from norm(max(p - q, 0)) at the rejection slot.
    p_rej = jnp.take_along_axis(
        ps, jnp.minimum(n_p, gamma)[:, None, None], axis=1
    )[:, 0]  # (B, V)
    q_rej = jnp.take_along_axis(
        qs, jnp.minimum(n_p, gamma - 1)[:, None, None], axis=1
    )[:, 0]
    resid = jnp.maximum(p_rej - q_rej, 0.0)
    resid_ok = resid.sum(axis=-1, keepdims=True) > 1e-12
    resid = jnp.where(
        resid_ok, resid / jnp.maximum(resid.sum(axis=-1, keepdims=True), 1e-30),
        p_rej,
    )
    extra_dist = jnp.where(accept.all(axis=1)[:, None], ps[:, gamma], resid)
    extra = _sample_rows(extra_dist, seeds, frames_done + n_p, _TAG_EXTRA)  # (B,)

    # ---- 4. Emit tokens + residual codebooks ------------------------------
    idx = jnp.arange(gamma + 1)[None, :]  # (1, gamma+1)
    d_prim_pad = jnp.concatenate([d_prim, jnp.zeros((b, 1), jnp.int32)], axis=1)
    emit_prim = jnp.where(
        idx < n_eff[:, None],
        d_prim_pad,
        jnp.where(
            (idx == n_eff[:, None]) & has_extra[:, None],
            extra[:, None],
            cfg_t.audio_pad,
        ),
    )  # (B, gamma+1)
    res_emit = _predict_residuals(
        tp, cfg_t,
        h.reshape(b * (gamma + 1), hidden),
        jnp.minimum(emit_prim.reshape(-1), cfg_t.codec.codebook_size - 1),
    ).reshape(b, gamma + 1, nq - 1)
    if residual_mode == "draft" and nq > 1:
        d_res_pad = jnp.concatenate(
            [d_codes[..., 1:], jnp.zeros((b, 1, nq - 1), jnp.int32)], axis=1
        )
        res_emit = jnp.where((idx < n_eff[:, None])[..., None], d_res_pad, res_emit)
    codes_vec = jnp.concatenate([emit_prim[..., None], res_emit], axis=-1)
    n_new_raw = n_eff + has_extra.astype(jnp.int32)  # (B,) tokens incl. extra

    is_eos = emit_prim == eos  # (B, gamma+1)
    eos_hit_mask = is_eos & (idx < n_new_raw[:, None])
    # Rows that were ALREADY done at round start (e.g. EOS sampled at
    # admission, frame 0) must still surface an EOS report so the host
    # retires them — they ride along as dead compute otherwise.
    hit_eos = (eos_hit_mask.any(axis=1) & live) | (active & done)
    eos_at = jnp.argmax(eos_hit_mask, axis=1)  # first EOS slot (valid w/ hit)
    n_total = jnp.where(hit_eos, eos_at + 1, n_new_raw)  # emitted incl. EOS
    n_real = jnp.where(live, n_total - hit_eos.astype(jnp.int32), 0)

    # Scatter real frames into the device code log at per-row positions.
    write = (idx < n_real[:, None]) & live[:, None]
    codes_z = jnp.where(write[..., None], codes_vec, 0)
    f_cap = codes_buf.shape[1]
    pos_w = jnp.where(write, frames_done[:, None] + idx, f_cap)
    codes_buf = codes_buf.at[
        jnp.arange(b, dtype=jnp.int32)[:, None], pos_w
    ].set(codes_z, mode="drop")

    # ---- 5. Commit cache validity & per-row pointers ----------------------
    keep = n_eff - truncated.astype(jnp.int32)  # cols [col, col+keep] valid
    valid_block = (idx <= keep[:, None]) & live[:, None]  # (B, gamma+1)
    rows_b = jnp.arange(b, dtype=jnp.int32)[:, None]
    cols_blk = cols[:, None] + idx  # (B, gamma+1)
    t_kv = t_kv.at[rows_b, cols_blk].set(valid_block, mode="drop")
    d_kv = d_kv.at[rows_b, cols_blk].set(valid_block, mode="drop")
    # Rewind: the next round's block starts right after the last kept key —
    # rejected columns are reused, so a row's column usage equals its
    # emitted keys (+ prompt), independent of acceptance rate.
    cols = jnp.where(live, cols + keep + 1, cols)

    last_i = jnp.maximum(n_total - 1, 0)
    new_last = jnp.take_along_axis(
        codes_vec, last_i[:, None, None], axis=1
    )[:, 0]  # (B, nq)
    eos_vec = jnp.zeros((nq,), jnp.int32).at[0].set(eos)
    new_last = jnp.where(hit_eos[:, None], eos_vec[None], new_last)
    last_codes = jnp.where(live[:, None], new_last, last_codes)

    rope_next = rope_next + jnp.where(live, n_total, 0)
    frames_done = frames_done + n_real
    done = done | hit_eos
    harvest = jnp.stack([n_real, hit_eos.astype(jnp.int32)], axis=1)  # (B, 2)
    return (
        harvest,
        t_ck, t_cv, t_kv,
        d_ck, d_cv, d_kv,
        codes_buf,
        last_codes,
        done,
        cols,
        rope_next,
        frames_done,
    )


_spec_serve_round = partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "gamma", "top_k", "residual_mode"),
    donate_argnums=(2, 3, 4, 5, 6, 7, 8),
)(_spec_round_body)


@partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "gamma", "top_k", "residual_mode", "k"),
    donate_argnums=(2, 3, 4, 5, 6, 7, 8),
)
def _spec_serve_rounds(
    tp: Params,
    dp: Params,
    t_ck, t_cv, t_kv,
    d_ck, d_cv, d_kv,
    codes_buf,
    cfg_t,
    cfg_d,
    cols,
    rope_next,
    last_codes,
    done,
    active,
    seeds,
    temperature,
    frames_done,
    min_frames,
    gamma: int,
    top_k: int,
    residual_mode: str,
    k: int,
):
    """``k`` draft/verify rounds fused into ONE compiled program.

    A speculative round harvests ~accepted-frames per dispatch where the
    non-speculative chunk harvests ``steps`` frames, so per-dispatch host
    overhead (Python + device→host round trip; tens of ms on
    relay-attached hosts) weighs ~an-order-of-magnitude heavier per
    frame. Scanning ``k`` rounds inside one program amortizes it the
    same way the decode chunk does: one dispatch, one lagged (k, B, 2)
    harvest fetch. Rows that finish mid-scan ride along masked
    (``live = active & ~done``), exactly like EOS rows inside a chunk.
    """

    def body(carry, _):
        (t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
         cols, rope_next, last_codes, done, frames_done) = carry
        (harvest, t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
         last_codes, done, cols, rope_next, frames_done) = _spec_round_body(
            tp, dp, t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
            cfg_t, cfg_d, cols, rope_next, last_codes, done,
            active, seeds, temperature, frames_done, min_frames,
            gamma, top_k, residual_mode,
        )
        return (
            (t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
             cols, rope_next, last_codes, done, frames_done),
            harvest,
        )

    carry0 = (t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
              cols, rope_next, last_codes, done, frames_done)
    carry, harvests = jax.lax.scan(body, carry0, None, length=k)
    (t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, codes_buf,
     cols, rope_next, last_codes, done, frames_done) = carry
    return (
        harvests,  # (k, B, 2)
        t_ck, t_cv, t_kv,
        d_ck, d_cv, d_kv,
        codes_buf,
        last_codes,
        done,
        cols,
        rope_next,
        frames_done,
    )
