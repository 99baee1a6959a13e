"""Checkpoint loading: HF safetensors → JAX parameter tree.

Maps Qwen-family transformer weights (q/k/v/o projections, gate/up/down
MLP, norms, embeddings) into the fused-QKV layout used by
``rho_tts_tpu.models.transformer``. Codec / code-predictor tensors are
mapped when present under recognizable prefixes; anything unmatched keeps
its random initialization (logged).

Runs fully host-side and converts to bf16 device arrays at the end.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from .config import QwenTTSConfig

logger = logging.getLogger(__name__)


def _read_safetensors(model_path: str) -> Optional[Dict[str, np.ndarray]]:
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        return None
    from safetensors.numpy import load_file

    tensors: Dict[str, np.ndarray] = {}
    for f in files:
        tensors.update(load_file(f))
    return tensors


def _find(tensors: Dict[str, np.ndarray], *suffixes: str) -> Optional[np.ndarray]:
    for name, t in tensors.items():
        for s in suffixes:
            if name.endswith(s):
                return t
    return None


def load_checkpoint(model_path: str, cfg: QwenTTSConfig) -> Optional[Dict[str, Any]]:
    """Load and convert a local checkpoint. Returns None when absent."""
    if not os.path.isdir(model_path):
        return None
    tensors = _read_safetensors(model_path)
    if tensors is None:
        return None

    import jax
    import jax.numpy as jnp

    from .model import init_params

    t = cfg.talker
    params = init_params(jax.random.PRNGKey(0), cfg)
    matched = 0

    def put(tree, path, value, cast=True):
        nonlocal matched
        node = tree
        for p in path[:-1]:
            node = node[p]
        ref = node[path[-1]]
        if tuple(value.shape) != tuple(ref.shape):
            logger.warning("Shape mismatch at %s: %s vs %s", path, value.shape, ref.shape)
            return
        node[path[-1]] = jnp.asarray(value, ref.dtype) if cast else value
        matched += 1

    emb = _find(tensors, "embed_tokens.weight", "tok_embeddings.weight")
    if emb is not None:
        put(params, ("text_embed",), emb)

    # Per-layer mapping: HF stores q/k/v separately; fuse into wqkv.
    blocks = params["talker"]["blocks"]
    n_layers = t.layers
    new_blocks = {k: np.asarray(v) for k, v in blocks.items()}
    for layer in range(n_layers):
        def g(*names):
            for n in names:
                for key, tt in tensors.items():
                    if f".{layer}." in key and key.endswith(n):
                        return tt
            return None

        q = g("q_proj.weight")
        k = g("k_proj.weight")
        v = g("v_proj.weight")
        o = g("o_proj.weight")
        gate = g("gate_proj.weight")
        up = g("up_proj.weight")
        down = g("down_proj.weight")
        ln1 = g("input_layernorm.weight")
        ln2 = g("post_attention_layernorm.weight")
        if q is None or k is None or v is None:
            continue
        # HF linear weights are (out, in) — transpose to (in, out) and fuse.
        wqkv = np.concatenate([q.T, k.T, v.T], axis=1)
        if wqkv.shape == tuple(new_blocks["wqkv"][layer].shape):
            new_blocks["wqkv"][layer] = wqkv
            matched += 1
        if o is not None and o.T.shape == tuple(new_blocks["wo"][layer].shape):
            new_blocks["wo"][layer] = o.T
            matched += 1
        for name, tt in (("w_gate", gate), ("w_up", up), ("w_down", down)):
            if tt is not None and tt.T.shape == tuple(new_blocks[name][layer].shape):
                new_blocks[name][layer] = tt.T
                matched += 1
        for name, tt in (("attn_norm", ln1), ("mlp_norm", ln2)):
            if tt is not None and tt.shape == tuple(new_blocks[name][layer].shape):
                new_blocks[name][layer] = tt
                matched += 1

    import jax.numpy as jnp  # noqa: F811

    params["talker"]["blocks"] = {
        k: jnp.asarray(v, blocks[k].dtype) for k, v in new_blocks.items()
    }

    final_norm = _find(tensors, "model.norm.weight", "final_layernorm.weight")
    if final_norm is not None:
        put(params["talker"], ("final_norm",), final_norm)

    head = _find(tensors, "lm_head.weight", "codec_head.weight")
    if head is not None and head.T.shape == tuple(params["lm_head"].shape):
        put(params, ("lm_head",), head.T)

    if matched == 0:
        logger.warning("Checkpoint at %s matched no tensors; using random init", model_path)
        return None
    logger.info("Converted %d tensor groups from %s", matched, model_path)
    return params
