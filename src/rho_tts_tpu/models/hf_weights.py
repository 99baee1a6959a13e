"""Shared host-side checkpoint conversion utilities (HF/torch → JAX trees).

Used by the per-family converters (``models.qwen.weights``,
``models.chatterbox.weights``, ``models.speaker.encoder.load_pretrained``).
All matching is scoped: a tensor can only map into a component when its
name passes that component's scope filter, so same-suffix tensors from
different submodules (talker vs codec vs predictor all have
``q_proj.weight``-style names) can never cross-map.
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

Tensors = Dict[str, np.ndarray]


def read_safetensors(model_path: str) -> Optional[Tensors]:
    """All *.safetensors under a checkpoint dir, merged (host numpy)."""
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        return None
    from safetensors.numpy import load_file

    tensors: Tensors = {}
    for f in files:
        tensors.update(load_file(f))
    return tensors


def read_torch_state(path: str) -> Optional[Tensors]:
    """A torch ``.pt`` checkpoint as numpy tensors.

    Handles both raw state dicts and ``{"model_state": ...}`` wrappers
    (the resemblyzer/GE2E convention).
    """
    if not os.path.isfile(path):
        return None
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("model_state", "state_dict", "model"):
        if isinstance(state, dict) and wrapper in state and isinstance(state[wrapper], dict):
            state = state[wrapper]
            break
    out: Tensors = {}
    for k, v in state.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


def scope(tensors: Tensors, include: Optional[Sequence[str]] = None,
          exclude: Sequence[str] = ()) -> Tensors:
    """Filter tensors to one component's namespace.

    ``include``: keep names containing ANY of these substrings (None =
    keep all). ``exclude``: then drop names containing any of these.
    """
    out = {}
    for name, t in tensors.items():
        if include is not None and not any(s in name for s in include):
            continue
        if any(s in name for s in exclude):
            continue
        out[name] = t
    return out


def find(tensors: Tensors, *suffixes: str) -> Optional[np.ndarray]:
    """First tensor whose name ends with one of the suffixes."""
    for s in suffixes:
        for name, t in tensors.items():
            if name.endswith(s):
                return t
    return None


def layer_tensor(tensors: Tensors, layer: int, *suffixes: str) -> Optional[np.ndarray]:
    """Tensor for transformer layer ``layer`` matched by suffix.

    Requires the HF ``…layers.{i}.…`` pattern (word-bounded so layer 1
    can't match layer 11).
    """
    pat = re.compile(rf"(^|\.)layers\.{layer}\.")
    for s in suffixes:
        for name, t in tensors.items():
            if name.endswith(s) and pat.search(name):
                return t
    return None


def map_llama_blocks(
    tensors: Tensors,
    blocks: Dict[str, Any],
    n_layers: int,
    count: Callable[[], None],
) -> Dict[str, np.ndarray]:
    """Map llama/qwen-family per-layer tensors into a stacked block tree.

    HF layout: separate ``{q,k,v,o}_proj`` / ``{gate,up,down}_proj``
    linears stored (out, in); ours is a fused (in, q+k+v) ``wqkv`` plus
    (in, out) matrices stacked over a leading layer axis. ``count`` is
    called once per tensor that lands (for match accounting).

    ``tensors`` must already be scoped to ONE transformer stack.

    Two-pass so the fallback tree is only read when needed: checkpoint
    rows are collected first, and a stacked leaf is rebuilt purely from
    them when every layer matched. Only a partially-matched leaf pulls the
    existing (possibly device-resident) array back to host — on relay
    backends with ~MB/s device→host links that fetch is the cold-start
    killer, and a complete checkpoint never pays it.
    """
    collected: Dict[str, Dict[int, np.ndarray]] = {}

    def land(name: str, layer: int, value: np.ndarray) -> None:
        want = tuple(np.shape(blocks[name])[1:])
        if value.shape != want:
            logger.warning("Layer %d %s shape %s != %s", layer, name,
                           value.shape, want)
            return
        collected.setdefault(name, {})[layer] = value
        count()

    for layer in range(n_layers):
        g = lambda *names: layer_tensor(tensors, layer, *names)  # noqa: E731
        q, k, v, o = (g(f"{n}_proj.weight") for n in ("q", "k", "v", "o"))
        gate, up, down = (g(f"{n}_proj.weight") for n in ("gate", "up", "down"))
        ln1 = g("input_layernorm.weight")
        ln2 = g("post_attention_layernorm.weight")
        if q is None or k is None or v is None:
            continue
        land("wqkv", layer, np.concatenate([q.T, k.T, v.T], axis=1))
        if o is not None:
            land("wo", layer, o.T)
        for name, t in (("w_gate", gate), ("w_up", up), ("w_down", down)):
            if t is not None:
                land(name, layer, t.T)
        for name, t in (("attn_norm", ln1), ("mlp_norm", ln2)):
            if t is not None:
                land(name, layer, t)

    new_blocks: Dict[str, Any] = {}
    for name, base in blocks.items():
        got = collected.get(name, {})
        if len(got) == n_layers:
            new_blocks[name] = np.stack([got[i] for i in range(n_layers)])
        elif got:
            patched = np.array(base)  # partial match: fetch fallback rows
            for i, t in got.items():
                patched[i] = t
            new_blocks[name] = patched
        else:
            new_blocks[name] = base  # untouched — may stay on device
    return new_blocks
