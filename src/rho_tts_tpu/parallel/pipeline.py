"""Pipeline parallelism: the talker layer stack staged over a ``pipe`` axis.

The reference has no parallelism of any kind (SURVEY.md §2.3 — it bounds
work at the text level, `/root/reference/src/rho_tts/base_tts.py:538-585`);
tensor parallelism here covers models that exceed one chip's HBM up to a
handful of chips. Pipeline parallelism is the axis that scales *deeper*:
layers are split into contiguous stages, one stage per device along a
``pipe`` mesh axis, and microbatches flow through the stages GPipe-style —
each tick every stage runs its layers on a different microbatch and hands
its activations to the next stage over ICI with ``ppermute``.

Design (idiomatic JAX, no hand-written schedules):

* The stacked block tree (``(L, ...)`` leaves from ``models.transformer``)
  is sharded over ``pipe`` on the layer axis — each device holds ``L/P``
  layers. No parameter ever moves.
* One ``shard_map`` program runs the whole schedule: ``M + P - 1`` ticks,
  each tick = local layers forward + ``ppermute`` shift of the activation
  (and its RoPE positions / validity mask, which travel with it).
* Bubbles compute on zeros (SPMD — every device executes every tick); the
  bubble fraction is ``(P-1)/(M+P-1)``, so use ``n_microbatches >= P``.
* The backward pass needs no extra code: ``ppermute`` has a transpose rule
  (the reversed permutation), so ``jax.grad`` through this forward IS the
  GPipe backward schedule — gradients pipeline stage-to-stage in reverse.
* Composes with data parallelism: on a ``(data, pipe)`` mesh, microbatch
  rows shard over ``data`` while stages ride ``pipe``.

Per-row math is untouched (attention/norms never mix batch rows), so the
pipelined forward matches the unmeshed ``stack_forward`` to float
tolerance — the only divergence source is XLA reordering contraction sums
at the smaller microbatch shapes, not the schedule.

Decode (KV-cached, one token per step) is intentionally NOT pipelined: a
single autoregressive stream cannot fill a pipeline (every tick depends on
the previous token), and at batch sizes where interleaving streams could,
tensor parallelism is strictly better on a TPU pod slice (two psums per
block over fast ICI vs a P-deep latency chain). PP here targets the
teacher-forced paths: training / LoRA voice adaptation and scoring.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def create_pipeline_mesh(
    n_devices: Optional[int] = None,
    n_stages: Optional[int] = None,
    devices=None,
) -> Mesh:
    """A ``(data, pipe)`` mesh: stages on the minor axis, the rest data.

    ``n_stages`` defaults to all devices (pure pipeline, data=1).
    """
    from jax.experimental import mesh_utils

    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_stages is None:
        n_stages = n_devices
    if n_devices % n_stages:
        raise ValueError(f"n_stages ({n_stages}) must divide n_devices ({n_devices})")
    mesh_devices = mesh_utils.create_device_mesh(
        (n_devices // n_stages, n_stages), devices=devices
    )
    return Mesh(mesh_devices, axis_names=("data", "pipe"))


def stage_specs(blocks: Params) -> Params:
    """PartitionSpec tree sharding every stacked-block leaf's layer axis
    over ``pipe`` (works for dense bf16 and quantized ``{"q","s"}`` leaves
    alike — the leading axis is layers in all of them)."""
    return jax.tree.map(lambda _: P("pipe"), blocks)


def shard_stack_for_pipeline(mesh: Mesh, stack_params: Params) -> Params:
    """device_put a transformer stack with blocks staged over ``pipe``
    (final_norm replicated)."""
    blocks = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        stack_params["blocks"],
        stage_specs(stack_params["blocks"]),
    )
    final_norm = jax.device_put(
        stack_params["final_norm"], NamedSharding(mesh, P())
    )
    return {"blocks": blocks, "final_norm": final_norm}


def _layer_count(blocks: Params) -> int:
    return int(jax.tree.leaves(blocks)[0].shape[0])


def pipeline_stack_forward(
    params: Params,
    cfg,
    x: jnp.ndarray,  # (B, T, hidden)
    positions: jnp.ndarray,  # (B, T)
    attn_mask: Optional[jnp.ndarray] = None,  # (B, T)
    *,
    mesh: Mesh,
    n_microbatches: Optional[int] = None,
) -> Tuple[jnp.ndarray, None]:
    """GPipe-microbatched ``stack_forward`` (uncached path) over ``pipe``.

    Same contract as ``models.transformer.stack_forward`` without caches:
    returns ``(hidden_states, None)``. Batch must divide into
    ``n_microbatches`` (default: one per stage); with a ``data`` axis the
    microbatch rows additionally shard over it.
    """
    from ..models import transformer as tfm

    blocks = params["blocks"]
    n_layers = _layer_count(blocks)
    n_stages = mesh.shape["pipe"]
    if n_layers % n_stages:
        raise ValueError(
            f"pipe axis ({n_stages}) must divide the layer count ({n_layers})"
        )
    layers_per_stage = n_layers // n_stages

    b, t, hidden = x.shape
    m = n_stages if n_microbatches is None else int(n_microbatches)
    if m < 1:
        raise ValueError(f"n_microbatches must be >= 1, got {m}")
    if b % m:
        raise ValueError(f"batch ({b}) must divide into n_microbatches ({m})")
    mb = b // m
    dp = mesh.shape.get("data", 1)
    if mb % dp:
        raise ValueError(
            f"microbatch rows ({mb}) must divide over the data axis ({dp})"
        )

    if attn_mask is None:
        attn_mask = jnp.ones((b, t), bool)

    xm = x.reshape(m, mb, t, hidden)
    pm = positions.reshape(m, mb, t).astype(jnp.int32)
    am = attn_mask.reshape(m, mb, t).astype(jnp.uint8)  # uint8: travels
    # through ppermute alongside the activations (bool collectives are
    # backend-dependent)

    shift = [(d, d + 1) for d in range(n_stages - 1)]

    def stage_fn(blocks_local, xm, pm, am):
        stage = jax.lax.axis_index("pipe")
        is_first = stage == 0
        is_last = stage == n_stages - 1

        h = jnp.zeros_like(xm[0])
        pos = jnp.zeros_like(pm[0])
        msk = jnp.zeros_like(am[0])
        outs = jnp.zeros_like(xm)

        for s in range(m + n_stages - 1):
            if s < m:  # feed the next microbatch into stage 0
                h = jnp.where(is_first, xm[s], h)
                pos = jnp.where(is_first, pm[s], pos)
                msk = jnp.where(is_first, am[s], msk)
            # Bubble ticks carry an all-invalid mask (zeros travel with the
            # activations through ppermute). Force those rows to "all
            # valid" so the bubble forward is self-safe: it must not depend
            # on block_forward filling masked scores with a finite -1e30
            # rather than -inf (an all-masked softmax row would be NaN and
            # could poison the backward via 0*NaN even though bubble
            # outputs are discarded).
            msk_b = msk.astype(bool)
            safe_msk = msk_b | ~jnp.any(msk_b, axis=-1, keepdims=True)
            for i in range(layers_per_stage):
                lp = jax.tree.map(lambda a: a[i], blocks_local)
                h, _ = tfm.block_forward(
                    lp, cfg, h, pos, None, None, safe_msk
                )
            o = s - (n_stages - 1)
            if 0 <= o < m:  # collect finished microbatch from the last stage
                outs = outs.at[o].set(jnp.where(is_last, h, jnp.zeros_like(h)))
            if s < m + n_stages - 2:
                h = jax.lax.ppermute(h, "pipe", shift)
                pos = jax.lax.ppermute(pos, "pipe", shift)
                msk = jax.lax.ppermute(msk, "pipe", shift)
        # Only the last stage wrote non-zero outputs; the psum both moves
        # them off the final stage and replicates them over ``pipe``.
        return jax.lax.psum(outs, "pipe")

    data_ax = "data" if "data" in mesh.shape else None
    io_spec = P(None, data_ax, None, None)
    io_spec3 = P(None, data_ax, None)
    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(stage_specs(blocks), io_spec, io_spec3, io_spec3),
        out_specs=io_spec,
        check_vma=False,
    )(blocks, xm, pm, am)

    out = out.reshape(b, t, hidden)
    out = tfm.rms_norm(out, params["final_norm"], cfg.rms_eps)
    return out, None


@partial(
    jax.jit,
    static_argnames=("cfg", "optimizer", "mesh", "n_microbatches"),
    donate_argnums=(0, 1),
)
def pipeline_train_step(
    params: Params,
    opt_state,
    batch: Dict[str, jnp.ndarray],
    cfg,
    optimizer,
    mesh: Mesh,
    n_microbatches: Optional[int] = None,
):
    """One optimizer step with the talker forward pipelined over ``pipe``.

    Same loss as ``models.qwen.train.train_step`` (teacher-forced codec CE);
    the backward pipelines automatically through the ``ppermute`` transpose.
    Embeddings / heads / codec stay replicated (they are small next to the
    talker); only the layer stack is staged.
    """
    import optax

    from ..models.qwen.train import _forward_loss

    stack_fn = partial(
        pipeline_stack_forward, mesh=mesh, n_microbatches=n_microbatches
    )
    loss, grads = jax.value_and_grad(_forward_loss)(
        params, cfg, batch, stack_fn=stack_fn
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
