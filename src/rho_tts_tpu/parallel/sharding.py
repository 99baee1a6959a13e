"""Sharding specs for the codec-LM parameter tree.

Tensor-parallel layout (Megatron-style, collectives inserted by XLA):

* ``wqkv``   (L, hidden, qkv_out)   → shard output columns over ``model``
* ``wo``     (L, q_heads*d, hidden) → shard input rows over ``model``
  (row-parallel: XLA reduces the partial sums with a psum over ICI)
* ``w_gate`` / ``w_up`` (L, hidden, ffn) → column-parallel
* ``w_down`` (L, ffn, hidden)           → row-parallel
* embeddings / heads: vocab-sharded over ``model``
* norms: replicated

Activations are batch-sharded over ``data``; inside blocks the head and
ffn dims follow the weight sharding so the only cross-chip traffic is the
two psums per block — the standard TP recipe.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

# Per-block parameter specs; leading axis is the stacked layer dim.
_BLOCK_SPECS = {
    "attn_norm": P(None, None),
    "wqkv": P(None, None, "model"),
    "wo": P(None, "model", None),
    "mlp_norm": P(None, None),
    "w_gate": P(None, None, "model"),
    "w_up": P(None, None, "model"),
    "w_down": P(None, "model", None),
}


def stack_specs() -> Params:
    """PartitionSpec tree for a transformer stack (see models.transformer)."""
    return {"blocks": dict(_BLOCK_SPECS), "final_norm": P(None)}


def _quantized_block_specs(blocks: Params, bspecs: Params) -> None:
    """Swap dense block specs for quantized-leaf dict specs in place.

    Weight-only int8/int4 talker blocks carry ``{"q"/"q4", "s"}`` leaves
    (models.quantization.quantize_stack): ``q`` keeps the dense layout
    spec and the per-output-channel scale ``s`` drops the input axis.
    int4 packs K/2 rows; the contraction-axis spec still applies (packing
    halves rows, it does not change which axis is sharded).
    """
    for name, leaf in blocks.items():
        if isinstance(leaf, dict) and "s" in leaf and ("q" in leaf or "q4" in leaf):
            dense = tuple(bspecs[name])
            qkey = "q" if "q" in leaf else "q4"
            bspecs[name] = {qkey: P(*dense), "s": P(*(dense[:-2] + dense[-1:]))}


def qwen_param_specs(params: Params) -> Params:
    """PartitionSpec tree matching models.qwen.model.init_params."""
    specs: Params = {
        # Text vocab is large and divisible; audio vocab (codebook + 3
        # specials) is intentionally replicated — it's a few MB.
        "text_embed": P("model", None),
        "audio_embed": P(None, None, None),
        "speaker_embed": P(None, None),
        "talker": stack_specs(),
        "lm_head": P(None, None),
        "code_predictor": {"w1": P(None, None, "model"), "w2": P(None, "model", None)},
        "codec": jax.tree.map(lambda _: P(), params["codec"]),
    }
    _quantized_block_specs(params["talker"]["blocks"], specs["talker"]["blocks"])
    return specs


def chatterbox_param_specs(params: Params) -> Params:
    """PartitionSpec tree matching models.chatterbox.model.init_params.

    Same Megatron recipe as the Qwen tree over the shared transformer
    stack; the CFG family's extras stay replicated — ``speech_embed``
    (codebook + 3 specials: not evenly divisible) and ``spk_proj`` /
    ``lm_head`` / codec are all a few MB. ``text_embed`` vocab-shards
    over ``model`` like the Qwen tree (every preset's text vocab is a
    power of two).
    """
    specs: Params = {
        "text_embed": P("model", None),
        "speech_embed": P(None, None),
        "spk_proj": P(None, None),
        "talker": stack_specs(),
        "lm_head": P(None, None),
        "codec": jax.tree.map(lambda _: P(), params["codec"]),
    }
    _quantized_block_specs(params["talker"]["blocks"], specs["talker"]["blocks"])
    return specs


def param_specs_for(params: Params) -> Params:
    """Spec tree for either codec-LM family, keyed on the tree's shape
    (the Chatterbox tree carries ``spk_proj``; the Qwen tree
    ``code_predictor``)."""
    if "spk_proj" in params:
        return chatterbox_param_specs(params)
    return qwen_param_specs(params)


def param_shardings(mesh: Mesh, params: Params, specs: Params) -> Params:
    """Materialize NamedShardings for every leaf (spec trees may be partial:
    any leaf missing from the spec tree is replicated)."""

    def build(spec):
        return NamedSharding(mesh, spec)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    spec_map = _flatten_specs(specs)
    out = {}
    for path, _leaf in flat_p:
        key = _path_key(path)
        out[key] = build(spec_map.get(key, P()))
    return out


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _flatten_specs(specs, prefix=()) -> Dict[str, Any]:
    from jax.sharding import PartitionSpec

    out = {}
    if isinstance(specs, dict):
        for k, v in specs.items():
            out.update(_flatten_specs(v, prefix + (str(k),)))
    elif isinstance(specs, (list, tuple)) and not isinstance(specs, PartitionSpec):
        for i, v in enumerate(specs):
            out.update(_flatten_specs(v, prefix + (str(i),)))
    else:
        out["/".join(prefix)] = specs
    return out


def shard_params(mesh: Mesh, params: Params, specs: Params) -> Params:
    """Device-put a parameter tree with the given spec tree (partial ok)."""
    spec_map = _flatten_specs(specs)

    def place(path, leaf):
        key = _path_key(path)
        spec = spec_map.get(key, jax.sharding.PartitionSpec())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
