"""LoRA voice adaptation for the codec-LM talker.

Low-rank adapters over the talker's projection weights: for a target
weight ``W (L, in, out)`` (the per-layer stacked trees of
``transformer.init_stack``), LoRA trains ``A (L, in, r)`` and
``B (L, r, out)`` with ``B`` zero-initialized, serving
``W + scale * A @ B``. Per-voice adaptation then costs ``2*r*(in+out)``
params per layer instead of a full finetune — checkpoints are megabytes,
and many voices can share one frozen base.

Integration is MERGE-FOR-FORWARD: the train step materializes the merged
weights functionally and reuses the exact teacher-forced loss of
``train.py``, so the transformer forward is untouched and gradients flow
only into the adapters (the base is a closure constant — XLA never
materializes base grads). Serving merges once (:func:`apply_lora`) and
the result is an ordinary parameter tree: it quantizes, exports to native
checkpoints, and serves through the continuous-batching engine
unchanged.

The reference has no accelerator-side training at all (SURVEY.md §5.4);
its notion of voice adaptation is prompt conditioning only. This module
extends the repo's full-finetune voice adaptation (``train.py``) with the
production-typical cheap path.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from .config import QwenTTSConfig
from .train import _forward_loss, make_optimizer

Params = Dict[str, Any]

#: talker block weights eligible for adapters (stacked (L, in, out))
TARGETS = ("wqkv", "wo", "w_gate", "w_up", "w_down")
DEFAULT_TARGETS = ("wqkv", "wo")


def init_lora(
    cfg: QwenTTSConfig,
    params: Params,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    seed: int = 0,
) -> Params:
    """Initialize adapters for ``targets`` against ``params``' shapes.

    ``A`` is Gaussian (1/rank scale), ``B`` is ZERO — the merged model is
    bit-identical to the base until the first optimizer step, which the
    tests pin.
    """
    unknown = [t for t in targets if t not in TARGETS]
    if unknown:
        raise ValueError(f"unknown LoRA targets {unknown}; choose from {TARGETS}")
    blocks = params["talker"]["blocks"]
    key = jax.random.PRNGKey(seed)
    lora: Params = {}
    for name in targets:
        w = blocks[name]  # (L, in, out)
        l, d_in, d_out = w.shape
        key, ka = jax.random.split(key)
        lora[name] = {
            "a": (jax.random.normal(ka, (l, d_in, rank), jnp.float32) / rank).astype(
                jnp.float32
            ),
            "b": jnp.zeros((l, rank, d_out), jnp.float32),
        }
    return lora


def apply_lora(params: Params, lora: Params, scale: float = 1.0) -> Params:
    """Functionally merge adapters into a fresh parameter tree.

    Returns ordinary params (same dtypes as the base), usable everywhere
    the base is: generation, quantization, export, serving.
    """
    blocks = dict(params["talker"]["blocks"])
    for name, ab in lora.items():
        w = blocks[name]
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scale
        blocks[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    talker = dict(params["talker"])
    talker["blocks"] = blocks
    return {**params, "talker": talker}


def n_lora_params(lora: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))


@partial(jax.jit, static_argnames=("cfg", "optimizer", "scale"), donate_argnums=(1, 2))
def lora_train_step(
    base_params: Params,
    lora: Params,
    opt_state,
    batch: Dict[str, jnp.ndarray],
    cfg: QwenTTSConfig,
    optimizer,
    scale: float = 1.0,
) -> Tuple[Params, Any, jnp.ndarray]:
    """One optimizer step on the ADAPTERS only (base stays frozen).

    Same teacher-forced loss and batch layout as ``train.train_step``;
    under a mesh the merged weights inherit the base's TP shardings and
    the batch its data sharding, so the same step runs sharded.
    """

    def loss_fn(lora_):
        merged = apply_lora(base_params, lora_, scale=scale)
        return _forward_loss(merged, cfg, batch)

    loss, grads = jax.value_and_grad(loss_fn)(lora)
    updates, opt_state = optimizer.update(grads, opt_state, lora)
    lora = optax.apply_updates(lora, updates)
    return lora, opt_state, loss


def init_lora_train_state(
    cfg: QwenTTSConfig,
    params: Params,
    rank: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    seed: int = 0,
    optimizer=None,
):
    """(lora, opt_state, optimizer) ready for :func:`lora_train_step`."""
    optimizer = optimizer or make_optimizer()
    lora = init_lora(cfg, params, rank=rank, targets=targets, seed=seed)
    return lora, optimizer.init(lora), optimizer


# ---------------------------------------------------------------------------
# Persistence — adapters are small; orbax keeps mesh-awareness consistent
# with the trainer's checkpoints.
# ---------------------------------------------------------------------------


def save_lora(path: str, lora: Params, meta: Dict[str, Any] | None = None) -> None:
    """Adapters via orbax; meta (scale, voice id, …) as a JSON sidecar
    (orbax's standard handler stores arrays only)."""
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "adapter"), lora, force=True)
    with open(os.path.join(path, "lora_meta.json"), "w") as f:
        json.dump(meta or {}, f)


def load_lora(path: str) -> Tuple[Params, Dict[str, Any]]:
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    with ocp.StandardCheckpointer() as ckptr:
        lora = ckptr.restore(os.path.join(path, "adapter"))
    meta = {}
    meta_file = os.path.join(path, "lora_meta.json")
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            meta = json.load(f)
    return lora, meta
