"""Training / fine-tuning step for the codec-LM (voice adaptation).

Teacher-forced next-token loss over codec tokens given the text prompt:
primary codebook through the LM head, residual codebooks through the code
predictor. Runs under ``jit`` over a (data, model) mesh — parameters carry
tensor-parallel shardings (see ``parallel.sharding``), batches are
data-sharded, and XLA inserts the psums.

The reference trains nothing on-accelerator (its only trainer is the
host-side sklearn drift classifier, SURVEY.md §2 item 7); this module is
the TPU-native capability extension that voice adaptation requires.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import transformer as tfm
from .config import QwenTTSConfig
from .model import init_params

Params = Dict[str, Any]


def _constrain(x: jnp.ndarray, *spec) -> jnp.ndarray:
    """Activation-sharding hint; no-op when no mesh is in context so the
    same train_step also runs unsharded on a single device."""
    try:
        return jax.lax.with_sharding_constraint(x, jax.sharding.PartitionSpec(*spec))
    except RuntimeError:  # no mesh in context (raised at trace time)
        return x


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def init_train_state(cfg: QwenTTSConfig, seed: int = 0, optimizer=None):
    params = init_params(jax.random.PRNGKey(seed), cfg)
    optimizer = optimizer or make_optimizer()
    opt_state = optimizer.init(params)
    return params, opt_state


def _forward_loss(
    params: Params,
    cfg: QwenTTSConfig,
    batch: Dict[str, jnp.ndarray],
    stack_fn=None,
):
    """Teacher-forced CE loss.

    batch:
      text_ids:   (B, Tt) int32
      codes:      (B, Tc, nq) int32 target codec tokens
      codes_mask: (B, Tc) bool

    ``stack_fn`` swaps the talker forward implementation (same contract as
    ``transformer.stack_forward`` uncached) — ``parallel.pipeline`` passes
    its GPipe-microbatched forward here for pipeline-parallel training.
    """
    if stack_fn is None:
        stack_fn = tfm.stack_forward
    text_ids = batch["text_ids"]
    codes = batch["codes"]
    mask = batch["codes_mask"]
    b, tt = text_ids.shape
    tc = codes.shape[1]
    nq = cfg.codec.n_codebooks

    text_emb = params["text_embed"][text_ids]
    bos = jnp.broadcast_to(
        params["audio_embed"][0][cfg.audio_bos][None, None, :], (b, 1, text_emb.shape[-1])
    )
    audio_in = 0.0
    for q in range(nq):
        audio_in = audio_in + params["audio_embed"][q][codes[:, :-1, q]]
    embeds = jnp.concatenate([text_emb, bos, audio_in], axis=1)  # (B, Tt+Tc, H)
    embeds = _constrain(embeds, "data", None, None)

    t_total = tt + tc
    positions = jnp.broadcast_to(jnp.arange(t_total), (b, t_total))
    h, _ = stack_fn(params["talker"], cfg.talker, embeds, positions)
    h_audio = h[:, tt : tt + tc]  # hidden states predicting each code step

    logits = h_audio.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32)
    logits = _constrain(logits, "data", None, None)
    primary_ce = optax.softmax_cross_entropy_with_integer_labels(logits, codes[..., 0])
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(primary_ce * mask) / denom

    if nq > 1:
        e0 = params["audio_embed"][0][codes[..., 0]]
        cp_in = jnp.concatenate([h_audio, e0], axis=-1).astype(
            params["code_predictor"]["w1"].dtype
        )
        hidden = jax.nn.silu(
            jnp.einsum("btd,qdc->qbtc", cp_in, params["code_predictor"]["w1"]).astype(
                jnp.float32
            )
        )
        res_logits = jnp.einsum(
            "qbtc,qce->qbte",
            hidden.astype(params["code_predictor"]["w2"].dtype),
            params["code_predictor"]["w2"],
        ).astype(jnp.float32)
        for q in range(1, nq):
            ce = optax.softmax_cross_entropy_with_integer_labels(
                res_logits[q - 1], codes[..., q]
            )
            loss = loss + jnp.sum(ce * mask) / denom / (nq - 1)

    return loss


@partial(jax.jit, static_argnames=("cfg", "optimizer"), donate_argnums=(0, 1))
def train_step(
    params: Params,
    opt_state,
    batch: Dict[str, jnp.ndarray],
    cfg: QwenTTSConfig,
    optimizer,
) -> Tuple[Params, Any, jnp.ndarray]:
    """One optimizer step; donates params/opt_state buffers."""
    loss, grads = jax.value_and_grad(_forward_loss)(params, cfg, batch)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


# ---------------------------------------------------------------------------
# Checkpoint / resume (orbax)
#
# The reference has no accelerator-side training and therefore no training
# checkpoints; this completes the voice-adaptation loop with durable
# save/resume. Sharded params round-trip: orbax records each leaf's
# sharding, so a restore under the same mesh context comes back sharded.
# ---------------------------------------------------------------------------


def save_train_state(path: str, params: Params, opt_state, step: int) -> None:
    """Durably save {params, opt_state, step} to ``path`` (a directory)."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(os.path.expanduser(path)),
            {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )


def restore_train_state(path: str, cfg: QwenTTSConfig, optimizer=None):
    """Restore (params, opt_state, step) saved by :func:`save_train_state`.

    The target structure (shapes/dtypes) is rebuilt from ``cfg`` so the
    checkpoint can be loaded into a fresh process.
    """
    import os

    import orbax.checkpoint as ocp

    params0, opt_state0 = init_train_state(cfg, optimizer=optimizer)
    target = {"params": params0, "opt_state": opt_state0, "step": 0}
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(os.path.expanduser(path)), abstract)
    return state["params"], state["opt_state"], int(state["step"])
