"""Draft-model distillation for speculative decoding.

Speculative decoding's speedup is gated by the acceptance rate — the
overlap ``Σ_x min(p(x), q(x))`` between the target's and draft's
next-token distributions (Leviathan et al., arXiv:2211.17192; PAPERS.md).
This module trains a small draft to maximize exactly that overlap:

* **On-policy data**: code sequences are SAMPLED from the target (the
  state distribution speculation will visit), conditioned through the
  real prompt path (``_build_prompt_arrays`` + ``prompt_embeds``), so the
  draft sees the same [spk][text][BOS] layout at decode time.
* **Distribution-matching loss**: cross-entropy of the draft's softmax
  against the target's *sampler* distribution — the top-k + temperature
  distribution the decode loop actually draws from (``_topk_dist``) —
  not hard sampled labels, which converge far slower.
* **Residual-head matching**: the speculation loop truncates acceptance
  when the draft's residual-codebook argmax disagrees with the target's
  (``speculative._spec_decode`` residual-consistency check), so the
  draft's code-predictor is trained with CE toward the target's argmax.

The reference has no speculation (and no trainer at all); this is part of
the TPU-native single-stream latency story (BASELINE.md 5s).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import transformer as tfm
from .config import QwenTTSConfig
from .model import prompt_embeds
from .speculative import _topk_dist

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

_WORDS = (
    "the quick brown fox jumps over a lazy dog while bright voices carry "
    "soft music through evening air and children listen near the open "
    "window as distant bells ring slowly across the quiet valley town"
).split()


def make_corpus(n: int, seed: int = 0, lo: int = 3, hi: int = 6) -> List[str]:
    """Deterministic synthetic sentences for rollouts (no datasets on host).

    ``hi`` is kept small so every prompt (with the "English: " prefix and
    the byte-fallback tokenizer) lands in the same 64-slot prompt bucket —
    one compiled distill-step shape (build_batches enforces this).
    """
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(lo, hi + 1))
        out.append(" ".join(rng.choice(_WORDS, size=k)))
    return out


def _teacher_forced_hidden(params, cfg: QwenTTSConfig, batch):
    """Hidden states that predict frames 0..T-1, teacher-forced.

    Inputs: the prompt (its BOS slot predicts frame 0) followed by the
    audio embeddings of frames 0..T-2. Mirrors the decode loop's
    conditioning exactly (sum of codebook embeddings per frame).
    """
    codes = batch["codes"]  # (B, T, nq)
    b, t, nq = codes.shape
    p = batch["ids_slotted"].shape[1]

    emb_p = prompt_embeds(
        params, cfg,
        batch["ids_slotted"], batch["text_mask"], batch["codes_slotted"],
        batch["code_mask"], batch["spk_ids"], batch["spk_mask"],
        batch["attn_mask"],
    )
    audio_in = params["audio_embed"][0][codes[:, :-1, 0]]
    for q in range(1, nq):
        audio_in = audio_in + params["audio_embed"][q][codes[:, :-1, q]]
    x = jnp.concatenate([emb_p, audio_in.astype(emb_p.dtype)], axis=1)

    lens = batch["lens"]  # (B,) prompt lengths (rope position of frame 0)
    pos_audio = lens[:, None] + jnp.arange(t - 1)[None, :]
    positions = jnp.concatenate(
        [batch["rope_pos"], pos_audio.astype(jnp.int32)], axis=1
    )
    attn = jnp.concatenate(
        [batch["attn_mask"], jnp.ones((b, t - 1), bool)], axis=1
    )
    h, _ = tfm.stack_forward(params["talker"], cfg.talker, x, positions,
                             attn_mask=attn)
    return h[:, p - 1 : p + t - 1]  # (B, T, H): h[i] predicts frame i


def _residual_logits(params, cfg: QwenTTSConfig, h, tok0):
    """Code-predictor logits (nq-1, B, T, C) given hidden + primary code."""
    n_res = cfg.codec.n_codebooks - 1
    if n_res == 0:
        return None
    e0 = params["audio_embed"][0][tok0]
    cp_in = jnp.concatenate([h, e0], axis=-1).astype(
        params["code_predictor"]["w1"].dtype
    )
    hidden = jax.nn.silu(
        jnp.einsum("btd,qdc->qbtc", cp_in, params["code_predictor"]["w1"]).astype(
            jnp.float32
        )
    )
    return jnp.einsum(
        "qbtc,qce->qbte",
        hidden.astype(params["code_predictor"]["w2"].dtype),
        params["code_predictor"]["w2"],
    ).astype(jnp.float32)


def distill_loss(
    draft_params: Params,
    target_params: Params,
    cfg_d: QwenTTSConfig,
    cfg_t: QwenTTSConfig,
    batch,
    temperature: float,
    top_k: int,
):
    """CE(teacher sampler-dist ‖ draft) + residual argmax CE."""
    codes = batch["codes"]
    tok0 = codes[..., 0]

    h_t = jax.lax.stop_gradient(
        _teacher_forced_hidden(target_params, cfg_t, batch)
    )
    logits_t = h_t.astype(jnp.float32) @ target_params["lm_head"].astype(jnp.float32)
    p_t = jax.lax.stop_gradient(
        jax.vmap(jax.vmap(lambda l: _topk_dist(l, temperature, top_k)))(logits_t)
    )  # (B, T, V) — the target sampler's actual distribution

    h_d = _teacher_forced_hidden(draft_params, cfg_d, batch)
    logits_d = h_d.astype(jnp.float32) @ draft_params["lm_head"].astype(jnp.float32)
    logq = jax.nn.log_softmax(logits_d / jnp.maximum(temperature, 1e-5), axis=-1)
    primary = -jnp.sum(p_t * logq, axis=-1)  # (B, T)
    loss = jnp.mean(primary)

    res_t = _residual_logits(target_params, cfg_t, h_t, tok0)
    if res_t is not None:
        labels = jax.lax.stop_gradient(jnp.argmax(res_t, axis=-1))  # (nq-1, B, T)
        res_d = _residual_logits(draft_params, cfg_d, h_d, tok0)
        ce = optax.softmax_cross_entropy_with_integer_labels(res_d, labels)
        loss = loss + jnp.mean(ce)

    # Acceptance proxy for logging: Σ min(p, q_topk) under the draft's own
    # top-k sampler distribution.
    q_s = jax.vmap(jax.vmap(lambda l: _topk_dist(l, temperature, top_k)))(
        jax.lax.stop_gradient(logits_d)
    )
    overlap = jnp.sum(jnp.minimum(p_t, q_s), axis=-1).mean()
    return loss, overlap


@partial(
    jax.jit,
    static_argnames=("cfg_d", "cfg_t", "top_k", "optimizer"),
    donate_argnums=(0, 1),
)
def distill_step(
    draft_params: Params,
    opt_state,
    target_params: Params,
    batch,
    cfg_d: QwenTTSConfig,
    cfg_t: QwenTTSConfig,
    temperature,
    top_k: int,
    optimizer,
):
    (loss, overlap), grads = jax.value_and_grad(distill_loss, has_aux=True)(
        draft_params, target_params, cfg_d, cfg_t, batch, temperature, top_k
    )
    updates, opt_state = optimizer.update(grads, opt_state, draft_params)
    draft_params = optax.apply_updates(draft_params, updates)
    return draft_params, opt_state, loss, overlap


def build_batches(
    target,
    texts: Sequence[str],
    seq_frames: int,
    batch_size: int,
    speaker: Optional[str] = "Vivian",
    language: str = "English",
    rng: Optional[jnp.ndarray] = None,
) -> List[Dict[str, jnp.ndarray]]:
    """Roll out the target on ``texts`` and pack fixed-shape batches.

    All prompts must land in the same prompt bucket (keep the corpus
    sentences short); rollouts are exactly ``seq_frames`` long
    (min_frames == max_frames suppresses EOS), so every batch compiles to
    one step shape.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if len(texts) < batch_size:
        raise ValueError(
            f"corpus of {len(texts)} texts cannot fill a batch of {batch_size}"
        )
    batches = []
    for start in range(0, len(texts) - batch_size + 1, batch_size):
        chunk = list(texts[start : start + batch_size])
        arrays, lens, p = target._build_prompt_arrays(
            chunk, speaker, language, None, None
        )
        rng, k = jax.random.split(rng)
        codes = target.generate_codes(
            chunk, speaker=speaker, language=language,
            min_frames=seq_frames, max_frames=seq_frames, rng=k,
            prebuilt_prompt=(arrays, lens, p),
        )
        codes = np.stack([c[:seq_frames] for c in codes])  # (B, T, nq)
        batch = {k2: jnp.asarray(v) for k2, v in arrays.items()}
        batch["codes"] = jnp.asarray(codes, jnp.int32)
        batch["lens"] = jnp.asarray(lens, jnp.int32)
        batches.append(batch)
    ps = {int(b["ids_slotted"].shape[1]) for b in batches}
    if len(ps) != 1:
        raise ValueError(f"corpus spans multiple prompt buckets: {sorted(ps)}")
    return batches


def distill_draft(
    target,
    draft,
    n_texts: int = 64,
    seq_frames: int = 96,
    batch_size: int = 8,
    steps: int = 300,
    learning_rate: float = 1e-3,
    speaker: Optional[str] = "Vivian",
    seed: int = 0,
    log_every: int = 50,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    texts: Optional[Sequence[str]] = None,
) -> Dict[str, float]:
    """Distill ``draft`` toward ``target``'s sampler distribution in place.

    Returns summary stats (final loss, final acceptance-overlap proxy).
    Both models must share the codec vocabulary. ``temperature``/``top_k``
    override the target config's sampler params — match them to the
    deployment sampler (acceptance is the overlap of the two top-k
    distributions actually drawn from, so train toward that one).

    ``texts`` overrides the synthetic rollout corpus. Acceptance is
    PROMPT-DISTRIBUTION-dependent: prompt keys stay in the attention
    window for the whole generation, so a draft distilled only on short
    ``make_corpus`` sentences realizes a fraction of its measured
    overlap on longer deployment prompts (measured 4.6 → 1.2 accepted
    tokens/round at γ=4 on a structured 1.7B pair). Distill on
    deployment-shaped prompts; all must share one prompt bucket.
    """
    cfg_t, cfg_d = target.config, draft.config
    if cfg_t.audio_vocab != cfg_d.audio_vocab:
        raise ValueError("target and draft must share the codec vocabulary")
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")

    texts = list(texts) if texts is not None else make_corpus(n_texts, seed=seed)
    batches = build_batches(
        target, texts, seq_frames, batch_size, speaker=speaker,
        rng=jax.random.PRNGKey(seed),
    )
    logger.info("distill: %d batches of %d×%d frames", len(batches),
                batch_size, seq_frames)

    # Warmup + cosine decay: the plateau under a flat LR (overlap ~0.70 at
    # step 250 with 1e-3) is an LR floor, not a capacity limit.
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=min(20, max(steps // 10, 1)),
        decay_steps=max(steps, 2), end_value=learning_rate * 0.02,
    )
    optimizer = optax.adamw(schedule, weight_decay=0.0)
    params = draft.params
    opt_state = optimizer.init(params)
    temperature = jnp.float32(
        cfg_t.temperature if temperature is None else temperature
    )
    top_k = int(cfg_t.top_k if top_k is None else top_k)

    loss = overlap = None
    for step in range(steps):
        batch = batches[step % len(batches)]
        params, opt_state, loss, overlap = distill_step(
            params, opt_state, target.params, batch, cfg_d, cfg_t,
            temperature, top_k, optimizer,
        )
        if log_every and (step + 1) % log_every == 0:
            logger.info(
                "distill step %d: loss %.4f, acceptance-overlap %.3f",
                step + 1, float(loss), float(overlap),
            )
    draft.params = params
    return {"loss": float(loss), "overlap": float(overlap), "steps": steps}
