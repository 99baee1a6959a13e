"""Speculative decoding for the codec-LM (draft-verify, single stream).

Standard speculative sampling (Leviathan et al., arXiv:2211.17192; applied
to codec-token TTS by arXiv:2410.21951 and arXiv:2410.13839, PAPERS.md): a
small DRAFT model proposes ``gamma`` primary-codebook tokens
autoregressively, the TARGET model scores all of them in ONE forward pass,
and tokens are accepted with probability ``min(1, p(x)/q(x))`` — the
combined process provably samples from the target distribution while
shifting most sequential work onto the cheap draft.

TPU-first design points:

* The whole speculation loop runs as ONE ``lax.while_loop`` program —
  zero host round-trips until the final token fetch. Dynamic acceptance
  counts are handled with traced scalar cache slots: the in-place
  ``dynamic_update_slice`` KV caches (models.transformer) accept traced
  slot offsets, so "rolling back" a rejected suffix is just not marking
  its slots valid — the next round overwrites them.
* Verification is a T=gamma+1 batched forward — exactly the shape the MXU
  wants, replacing gamma sequential target steps.
* Residual codebooks come from the target's hidden states at the accepted
  positions (same one-shot code-predictor convention as normal decode).

Single-stream (B=1) only: rows desynchronize under per-row acceptance,
which would break the batch-uniform cache-slot invariant. Batched serving
already reaches its throughput ceiling without speculation (BASELINE.md
5/5a); speculation targets single-stream latency.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import transformer as tfm
from .config import QwenTTSConfig
from .model import _predict_residuals

Params = Dict[str, Any]


def _topk_dist(logits: jnp.ndarray, temperature, top_k: int) -> jnp.ndarray:
    """Full-vocab probabilities of the top-k + temperature sampler.

    Matches ``model._sample_token_seeded``'s distribution: softmax over the
    top-k logits at the given temperature, zero elsewhere. (V,) → (V,).
    """
    v = logits.shape[-1]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-5)
    vals, idxs = jax.lax.top_k(scaled, top_k)
    probs_k = jax.nn.softmax(vals)
    return jnp.zeros((v,), jnp.float32).at[idxs].set(probs_k)


def _sample_from(dist: jnp.ndarray, rng) -> jnp.ndarray:
    """Sample an index from a (V,) probability vector (gumbel over log p)."""
    logp = jnp.log(jnp.maximum(dist, 1e-30))
    g = jax.random.gumbel(rng, dist.shape)
    return jnp.argmax(jnp.where(dist > 0, logp + g, -jnp.inf))


def _mask_eos(logits, eos: int, suppress) -> jnp.ndarray:
    return jnp.where(suppress, logits.at[..., eos].set(-1e30), logits)


@partial(
    jax.jit,
    static_argnames=(
        "cfg_t", "cfg_d", "gamma", "max_rounds", "top_k", "cap", "residual_mode"
    ),
)
def _spec_decode(
    tp: Params,
    dp: Params,
    cfg_t: QwenTTSConfig,
    cfg_d: QwenTTSConfig,
    t_ck, t_cv, t_kv,  # target caches (L,1,S,h,d) ×2 + key_valid (1,S)
    d_ck, d_cv, d_kv,  # draft caches
    t_slot0, d_slot0,  # scalars int32: first free slot after prefill
    pos0,  # scalar int32: rope position of the NEXT token
    last_codes,  # (nq,) int32: last emitted full code vector
    rng,
    temperature,
    min_frames,  # scalar int32: EOS suppressed below this emitted count
    gamma: int,
    max_rounds: int,
    top_k: int,
    cap: int,
    residual_mode: str = "strict",
):
    """Speculation loop. Returns (codes (cap, nq), n_emitted, rounds_used).

    Emitted entries beyond the EOS (if any) are pads; the caller slices.

    ``residual_mode``:

    * ``"strict"`` — emitted residual codebooks always come from the
      TARGET's code predictor; acceptance truncates at the first position
      where the draft's residuals (which the verification forward consumed
      as inputs) disagree, so every accepted primary was sampled from the
      exactly-conditioned target distribution.
    * ``"draft"`` — accepted slots emit the DRAFT's residual codebooks
      (the verification inputs and the emitted stream are then identical,
      so no truncation is needed; the bonus/resampled token still gets the
      target's residuals). Primaries keep the provable target-distribution
      guarantee; residual books ride the distilled draft predictor. With
      exact-match truncation, residual disagreement (an argmax over
      codebook_size classes per book, per position) caps acceptance far
      below the primary overlap — measured 1.16 tok/round at 0.70 primary
      acceptance on the small/draft pair — which is why serving uses this
      mode by default (``models.qwen.distill`` trains the draft's
      predictor toward the target's argmax, bounding the quality delta).
    """
    eos = cfg_t.audio_eos
    nq = cfg_t.codec.n_codebooks

    def round_body(carry):
        (t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, t_slot, d_slot, pos, last,
         rng, out, n_out, done, rounds) = carry

        def embed_codes(params, codes):
            """(…, nq) code vectors → (…, H): sum over codebook embeddings
            (the same conditioning the sequential decode uses)."""
            embs = params["audio_embed"]
            e = embs[0][codes[..., 0]]
            for q in range(1, nq):
                e = e + embs[q][codes[..., q]]
            return e

        # ---- 1. Draft proposes gamma full code vectors sequentially ------
        # The scan runs gamma+1 steps: the final step's proposal is unused
        # but it writes x_gamma's K/V into the draft cache, so an
        # all-accepted round leaves no hole in the draft's context.
        def draft_step(c, i):
            d_ck, d_cv, d_kv, codes_in, rng2 = c
            x = embed_codes(dp, codes_in)[None, None, :]  # (1,1,H)
            h, (d_ck, d_cv) = tfm.stack_forward(
                dp["talker"], cfg_d.talker, x, (pos + i)[None, None],
                kv_caches=(d_ck, d_cv), cache_len=d_slot + i,
                attn_mask=None, key_valid=d_kv,
            )
            d_kv2 = d_kv.at[:, d_slot + i].set(True)
            logits = jax.lax.dot(
                h[0, -1][None], dp["lm_head"], preferred_element_type=jnp.float32
            )[0]
            # emission slot i is global frame n_out + 1 + i (tok0 = frame 0)
            logits = _mask_eos(logits, cfg_d.audio_eos, (n_out + 1 + i) < min_frames)
            q = _topk_dist(logits, temperature, top_k)
            rng2, k = jax.random.split(rng2)
            prim = _sample_from(q, k).astype(jnp.int32)
            res_d = _predict_residuals(dp, cfg_d, h[0, -1][None], prim[None])[0]
            nxt = jnp.concatenate([prim[None], res_d])  # (nq,)
            return (d_ck, d_cv, d_kv2, nxt, rng2), (nxt, q)

        (d_ck, d_cv, d_kv, _, rng), (d_codes_all, qs_all) = jax.lax.scan(
            draft_step, (d_ck, d_cv, d_kv, last, rng), jnp.arange(gamma + 1)
        )
        d_codes = d_codes_all[:gamma]  # (gamma, nq) proposals x1..x_gamma
        qs = qs_all[:gamma]  # (gamma, V)
        d_prim = d_codes[:, 0]

        # ---- 2. Target verifies all gamma (+ bonus) in ONE forward -------
        seq_codes = jnp.concatenate([last[None], d_codes])  # (gamma+1, nq)
        x = embed_codes(tp, seq_codes)[None]  # (1, gamma+1, H)
        # `last` occupies rope position `pos` (same as the draft assigned it)
        positions = (pos + jnp.arange(gamma + 1))[None]
        h, (t_ck, t_cv) = tfm.stack_forward(
            tp["talker"], cfg_t.talker, x, positions,
            kv_caches=(t_ck, t_cv), cache_len=t_slot,
            attn_mask=None, key_valid=t_kv,
        )
        logits_all = jax.lax.dot(
            h[0], tp["lm_head"], preferred_element_type=jnp.float32
        )  # (gamma+1, V)
        sup = (n_out + 1 + jnp.arange(gamma + 1)) < min_frames
        logits_all = jax.vmap(lambda l, s: _mask_eos(l, eos, s))(logits_all, sup)
        ps = jax.vmap(lambda l: _topk_dist(l, temperature, top_k))(
            logits_all
        )  # (gamma+1, V)

        # ---- 3. Accept / reject (primary) + residual consistency ----------
        p_of_draft = jax.vmap(lambda p, t: p[t])(ps[:gamma], d_prim)
        q_of_draft = jax.vmap(lambda q, t: q[t])(qs, d_prim)
        rng, k_acc = jax.random.split(rng)
        u = jax.random.uniform(k_acc, (gamma,))
        accept = u < jnp.minimum(1.0, p_of_draft / jnp.maximum(q_of_draft, 1e-30))
        rej = jnp.argmin(jnp.concatenate([accept, jnp.array([False])]))
        n_p = jnp.where(accept.all(), gamma, rej).astype(jnp.int32)

        if residual_mode == "strict":
            # Residual consistency: the verification forward consumed the
            # DRAFT's residual codebooks as inputs; the emitted stream
            # carries the TARGET's. Positions after the first disagreement
            # saw wrong inputs, so acceptance truncates there (the
            # disagreeing slot's own emission is still valid — its hidden
            # state predates the mismatch).
            res_t_draft = _predict_residuals(tp, cfg_t, h[0, :gamma], d_prim)  # (g, nq-1)
            res_match = (res_t_draft == d_codes[:, 1:]).all(axis=-1)  # (gamma,)
            m = jnp.where(
                res_match.all(), gamma, jnp.argmin(res_match)
            ).astype(jnp.int32)
            truncated = n_p > m
        else:
            # "draft": emitted residuals for accepted slots ARE the
            # verification inputs — no inconsistency to truncate on.
            truncated = jnp.bool_(False)
        n_eff = jnp.where(truncated, m + 1, n_p) if residual_mode == "strict" else n_p
        has_extra = ~truncated

        # Extra token: bonus (all accepted) from ps[gamma], else resample
        # from norm(max(p - q, 0)) at the rejection slot. Only used when
        # not residual-truncated.
        p_rej = ps[jnp.minimum(n_p, gamma)]
        q_rej = qs[jnp.minimum(n_p, gamma - 1)]
        resid = jnp.maximum(p_rej - q_rej, 0.0)
        resid_ok = resid.sum() > 1e-12
        resid = jnp.where(resid_ok, resid / jnp.maximum(resid.sum(), 1e-30), p_rej)
        extra_dist = jnp.where(accept.all(), ps[gamma], resid)
        rng, k_x = jax.random.split(rng)
        extra = _sample_from(extra_dist, k_x).astype(jnp.int32)

        # ---- 4. Emit tokens + residual codebooks ---------------------------
        idx = jnp.arange(gamma + 1)
        d_prim_pad = jnp.concatenate([d_prim, jnp.zeros((1,), jnp.int32)])
        emit_prim = jnp.where(
            idx < n_eff,
            d_prim_pad,
            jnp.where((idx == n_eff) & has_extra, extra, cfg_t.audio_pad),
        )
        # Emitted residuals: target's predictor at the producing position
        # (h[i] produced emission slot i); in "draft" mode accepted slots
        # carry the draft's residuals instead (see docstring).
        res_emit = _predict_residuals(tp, cfg_t, h[0], emit_prim)  # (g+1, nq-1)
        if residual_mode == "draft" and nq > 1:
            d_res_pad = jnp.concatenate(
                [d_codes[:, 1:], jnp.zeros((1, nq - 1), jnp.int32)]
            )  # (g+1, nq-1)
            res_emit = jnp.where((idx < n_eff)[:, None], d_res_pad, res_emit)
        codes_vec = jnp.concatenate([emit_prim[:, None], res_emit], axis=-1)
        n_new = n_eff + has_extra.astype(jnp.int32)

        # EOS handling: anything at or after an EOS is pad; stop emitting
        is_eos = emit_prim == eos
        seen = jnp.cumsum(is_eos.astype(jnp.int32))
        valid = (idx < n_new) & (seen - is_eos.astype(jnp.int32) == 0)
        codes_vec = jnp.where(
            valid[:, None],
            codes_vec,
            jnp.full((gamma + 1, nq), cfg_t.audio_pad, jnp.int32),
        )
        out = jax.lax.dynamic_update_slice(out, codes_vec, (n_out, jnp.int32(0)))
        hit_eos = (is_eos & (idx < n_new)).any()
        n_emit = jnp.where(hit_eos, jnp.argmax(is_eos & (idx < n_new)) + 1, n_new)
        n_out = jnp.minimum(n_out + n_emit.astype(jnp.int32), cap - (gamma + 1))

        # ---- 5. Commit cache validity & pointers ---------------------------
        # Both caches keep [base, base + n_eff - truncated]: with an extra
        # token the slot of x_{n_eff} is valid; under residual truncation
        # x_{n_eff}'s K/V saw mismatched inputs and is recomputed next
        # round (the next round's first input is the re-emitted token with
        # the TARGET's residuals). next_slot = keep + 1 in both cases.
        cut = truncated.astype(jnp.int32)
        keep_t = t_slot + n_eff - cut  # `last` at t_slot + accepted inputs
        s_t = t_kv.shape[-1]
        ar_t = jnp.arange(s_t)
        t_kv = jnp.where((ar_t > keep_t)[None, :], False, t_kv)
        t_kv = t_kv | ((ar_t >= t_slot) & (ar_t <= keep_t))[None, :]
        keep_d = d_slot + n_eff - cut
        s_d = d_kv.shape[-1]
        ar_d = jnp.arange(s_d)
        d_kv = jnp.where((ar_d > keep_d)[None, :], False, d_kv)

        # Next round's first input = the LAST EMITTED full code vector
        last_idx = jnp.maximum(n_emit.astype(jnp.int32) - 1, 0)
        new_last = jnp.where(
            hit_eos,
            jnp.full((nq,), eos, jnp.int32).at[1:].set(0),
            codes_vec[last_idx],
        )
        t_slot = keep_t + 1
        d_slot = keep_d + 1
        pos = pos + n_emit.astype(jnp.int32)
        done = done | hit_eos
        return (t_ck, t_cv, t_kv, d_ck, d_cv, d_kv, t_slot, d_slot, pos,
                new_last, rng, out, n_out, done, rounds + 1)

    def cond(carry):
        n_out, done, rounds = carry[12], carry[13], carry[14]
        return (~done) & (rounds < max_rounds) & (n_out < cap - (gamma + 1))

    out0 = jnp.full((cap, nq), cfg_t.audio_pad, jnp.int32)
    carry0 = (
        t_ck, t_cv, t_kv, d_ck, d_cv, d_kv,
        jnp.asarray(t_slot0, jnp.int32), jnp.asarray(d_slot0, jnp.int32),
        jnp.asarray(pos0, jnp.int32),
        jnp.asarray(last_codes, jnp.int32).reshape(nq),
        # done starts true when the FIRST sampled token is already EOS
        # (matches the batch path in model.py: done = tok0 == eos); without
        # this the loop would decode max_rounds conditioned on the EOS
        # embedding before the host strip discards everything.
        rng, out0, jnp.int32(0),
        jnp.asarray(last_codes, jnp.int32).reshape(nq)[0] == eos,
        jnp.int32(0),
    )
    final = jax.lax.while_loop(cond, round_body, carry0)
    return final[11], final[12], final[14]


def speculative_generate_codes(
    target,
    draft,
    text: str,
    speaker: Optional[str] = None,
    language: str = "English",
    ref_audio: Optional[str] = None,
    ref_text: Optional[str] = None,
    max_frames: Optional[int] = None,
    min_frames: int = 0,
    gamma: int = 4,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    rng=None,
    residual_mode: str = "draft",
) -> Tuple[np.ndarray, Dict[str, float]]:
    """Single-stream speculative decode: returns (codes (T, nq), stats).

    ``target`` / ``draft`` are :class:`~rho_tts_tpu.models.qwen.QwenTTSModel`
    instances sharing the codec vocabulary (e.g. 1.7B target + 0.6B draft).
    Stats include the realized acceptance ratio (emitted tokens per round
    vs the gamma+1 upper bound). ``residual_mode`` ("draft" default /
    "strict") — see :func:`_spec_decode`.
    """
    if residual_mode not in ("strict", "draft"):
        raise ValueError(f"Unknown residual_mode: {residual_mode!r}")
    cfg_t, cfg_d = target.config, draft.config
    if cfg_t.audio_vocab != cfg_d.audio_vocab:
        raise ValueError("target and draft must share the codec vocabulary")
    temperature = cfg_t.temperature if temperature is None else temperature
    top_k = cfg_t.top_k if top_k is None else top_k
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if max_frames is None:
        max_frames = int(np.clip(len(text) * 1.0 + 50, 64, 1500))
    cap = int(max_frames + gamma + 1)
    max_rounds = max(int(max_frames), 1)  # ≥1 token emitted per round

    # Prefill BOTH models on the same prompt (each with its own program)
    t_pre = _prefill_single(target, text, speaker, language, ref_audio, ref_text, cap, gamma)
    d_pre = _prefill_single(draft, text, speaker, language, ref_audio, ref_text, cap, gamma)

    rng, k0 = jax.random.split(rng)
    # First token from the target's prefill logits (standard decode step)
    logits0 = t_pre["logits"]
    if min_frames > 0:
        logits0 = logits0.at[cfg_t.audio_eos].set(-1e30)
    tok0 = _sample_from(_topk_dist(logits0, jnp.float32(temperature), top_k), k0)

    nq = cfg_t.codec.n_codebooks
    first_codes = jnp.zeros((nq,), jnp.int32).at[0].set(tok0.astype(jnp.int32))
    codes, n_out, rounds = _spec_decode(
        target.params, draft.params, cfg_t, cfg_d,
        t_pre["ck"], t_pre["cv"], t_pre["kv"],
        d_pre["ck"], d_pre["cv"], d_pre["kv"],
        t_pre["slot0"], d_pre["slot0"], t_pre["pos0"],
        first_codes, rng,
        jnp.float32(temperature), jnp.int32(min_frames),
        gamma, int(max_rounds), int(top_k), cap, residual_mode,
    )
    codes_np, n, r = jax.device_get((codes, n_out, rounds))
    n, r = int(n), max(int(r), 1)
    first = np.full((1, cfg_t.codec.n_codebooks), 0, np.int32)
    first[0, 0] = int(jax.device_get(tok0))
    out = np.concatenate([first, np.asarray(codes_np[:n])])
    # Strip any trailing pads/EOS rows
    keep = out[:, 0] < cfg_t.codec.codebook_size
    if not keep.all():
        end = int(np.argmin(keep))
        out = out[:max(end, 1)]
    stats = {
        "rounds": r,
        "emitted": n,
        "tokens_per_round": n / r,
        "acceptance_upper": gamma + 1,
    }
    return out, stats


def _prefill_single(model, text, speaker, language, ref_audio, ref_text, decode_cap, gamma):
    """Run the model's standard prefill for one text; returns cache state."""
    pre = model._single_prefill(
        text, speaker, language, ref_audio, ref_text, int(decode_cap) + gamma + 2
    )
    return {
        "logits": pre["logits"],
        "ck": pre["ck"], "cv": pre["cv"], "kv": pre["kv"],
        "slot0": jnp.int32(pre["p"]),
        "pos0": jnp.int32(pre["len0"]),
    }
