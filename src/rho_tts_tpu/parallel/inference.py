"""Multi-chip inference: replicated weights, batch sharded over ``data``.

For serving, a codec-LM fits one chip, so scale-out means data parallelism:
parameters are replicated across the mesh and every batched tensor entering
the compiled stages (prompt embeddings, KV caches, masks) carries a
``data``-axis sharding — XLA then runs each chip's rows locally with no
collectives on the decode path at all.

Usage::

    mesh = create_mesh(8, model_parallel=1)
    model = QwenTTSModel(cfg)
    enable_data_parallel(model, mesh)
    model.synthesize([...])  # batch rows spread across the mesh

Tensor-parallel serving (weights sharded over ``model``) reuses
``sharding.qwen_param_specs`` and is wired in the training dryrun; the
serving default is DP because the 1.7B talker fits a single v5e chip.
"""

from __future__ import annotations

import logging

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def replicate_params(params, mesh: Mesh):
    """device_put the whole tree replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def shard_batch(tree, mesh: Mesh):
    """device_put array(s) with the leading axis split over ``data``."""

    def place(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def enable_data_parallel(model, mesh: Mesh) -> None:
    """Switch a model instance to mesh execution (in place).

    Parameters are replicated now; the model's generate path consults
    ``model.mesh`` to shard its batched tensors (see
    ``models.qwen.model.QwenTTSModel._shard``). Batch sizes must be a
    multiple of the ``data`` axis (the engine's batch paths pad with
    repeated rows when needed).
    """
    model.params = replicate_params(model.params, mesh)
    model.mesh = mesh
    logger.info(
        "Data-parallel inference enabled: mesh=%s", dict(mesh.shape)
    )
