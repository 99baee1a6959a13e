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

Tensor-parallel serving (:func:`enable_tensor_parallel`) shards the talker
weights over ``model`` via ``sharding.qwen_param_specs`` — Megatron-style
column/row splits with XLA-inserted psums — and still spreads batch rows
over ``data``. The serving default is DP because the 1.7B talker fits a
single v5e chip; TP covers models that span more than one chip.
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


def enable_parallelism(model, mode: str, n_devices=None) -> None:
    """Provider-level mesh setup: resolve a device count and axis split
    from a ``parallelism`` mode string, then enable DP or TP in place.

    ``mode`` is "data" or "tensor". With "tensor", the TP degree is the
    largest of (4, 2) dividing both the device count and the model's KV
    heads (the cache shards over heads); leftover devices form a ``data``
    axis. A single visible device logs and leaves the model unmeshed.
    """
    import jax as _jax

    from .mesh import create_mesh

    if mode not in ("data", "tensor"):
        raise ValueError(f"Unknown parallelism mode: {mode!r}")
    n = n_devices or len(_jax.devices())
    if n <= 1:
        logger.warning(
            "parallelism=%r requested but only %d device(s) visible", mode, n
        )
        return
    if mode == "data":
        enable_data_parallel(model, create_mesh(n, model_parallel=1))
    else:
        kv_heads = model.config.talker.kv_heads
        mp = 1
        for cand in (4, 2):
            if n % cand == 0 and kv_heads % cand == 0:
                mp = cand
                break
        enable_tensor_parallel(model, create_mesh(n, model_parallel=mp))


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


def enable_sequence_parallel(model, mesh: Mesh) -> None:
    """Shard the PREFILL sequence axis over the mesh ``model`` axis.

    Context/sequence parallelism for long-prompt prefill (the reference has
    no parallelism at all — it bounds sequence length at the text level,
    `/root/reference/src/rho_tts/base_tts.py:538-585`; here long reference
    prompts can instead be split across chips): weights are replicated
    (DP-style), batch rows spread over ``data``, and the prompt axis of
    every prefill input is sharded over ``model`` — the per-token matmuls
    (qkv/wo/ffn projections, RoPE, embedding gathers) then run on 1/mp of
    the tokens per chip, and GSPMD inserts the one unavoidable collective:
    an all-gather of K/V for the causal attention contraction. Decode is
    unchanged (DP layout); the KV cache is pinned back to the decode
    sharding at the prefill boundary.

    The Pallas prefill-attention kernel runs under SP too: GSPMD has no
    partitioning rule for pallas_call, so it executes inside a
    ``shard_map`` manual-partitioning region (K/V all-gathered over
    'model', local queries with a global position offset —
    ``ops.pallas.attention.sp_fused_gqa_attention``). Off-TPU (or with
    ``RHO_TTS_TPU_FUSED_ATTENTION=0``) the einsum path is used.
    """
    if mesh.shape.get("model", 1) < 2:
        raise ValueError(
            "sequence-parallel prefill needs a mesh 'model' axis >= 2 "
            f"(got mesh {dict(mesh.shape)}); create_mesh(n, model_parallel=mp)"
        )
    model.params = replicate_params(model.params, mesh)
    model.mesh = mesh
    model.seq_parallel = True
    logger.info(
        "Sequence-parallel prefill enabled: mesh=%s", dict(mesh.shape)
    )


def enable_tensor_parallel(model, mesh: Mesh) -> None:
    """Shard a model instance's weights over the mesh ``model`` axis.

    Megatron-style tensor parallelism for serving models that exceed one
    chip's HBM: wqkv / w_gate / w_up columns and wo / w_down rows split
    over ``model`` (two psums per block, inserted by XLA and riding ICI),
    vocab-sharded text embedding, and the KV caches sharded over the KV
    heads (see ``QwenTTSModel._shard_kv``). Batch rows still spread over
    ``data`` when the mesh has both axes. Works for both codec-LM
    families (``QwenTTSModel`` and ``ChatterboxModel`` — the spec tree is
    chosen from the parameter-tree shape, ``sharding.param_specs_for``).
    """
    from .sharding import param_specs_for, shard_params

    mp = mesh.shape.get("model", 1)
    kv_heads = model.config.talker.kv_heads
    if kv_heads % mp != 0:
        raise ValueError(
            f"model axis ({mp}) must divide kv_heads ({kv_heads}) so the "
            "KV cache shards evenly over heads"
        )
    model.params = shard_params(mesh, model.params, param_specs_for(model.params))
    model.mesh = mesh
    logger.info(
        "Tensor-parallel inference enabled: mesh=%s", dict(mesh.shape)
    )
