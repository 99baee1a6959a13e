"""Chatterbox checkpoint conversion → JAX parameter tree.

The upstream chatterbox-tts package ships a T3 AR model (llama-style
backbone with text/speech embeddings, a speech head and a speaker-
conditioning projection) plus separate voice-encoder / s3gen vocoder
files. This converter maps the T3 tensors into the
:mod:`rho_tts_tpu.models.chatterbox.model` layout from either a
``*.safetensors`` directory or a ``t3_cfg.pt`` torch file.

Reference behavior being replaced: eager upstream weight load at ctor,
``src/rho_tts/providers/chatterbox.py:78-96``.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Any, Dict, Optional

from ..hf_weights import find, map_llama_blocks, read_safetensors, read_torch_state, scope

logger = logging.getLogger(__name__)

# Chatterbox checkpoints bundle non-T3 components in separate namespaces /
# files; exclude them from AR-backbone matching.
_NON_T3 = ("s3gen", "ve.", "voice_encoder", "tokenizer", "watermark", "codec")


def _read(model_path: str) -> Optional[Dict[str, Any]]:
    if os.path.isdir(model_path):
        tensors = read_safetensors(model_path)
        if tensors:
            return tensors
        merged: Dict[str, Any] = {}
        for pt in sorted(glob.glob(os.path.join(model_path, "*.pt"))):
            base = os.path.basename(pt)
            if any(x in base for x in ("ve", "s3gen")):
                continue  # voice encoder / vocoder live in other modules
            state = read_torch_state(pt)
            if state:
                merged.update(state)
        return merged or None
    if model_path.endswith((".pt", ".safetensors")) and os.path.isfile(model_path):
        return read_torch_state(model_path)
    return None


def load_checkpoint(model_path: str, cfg) -> Optional[Dict[str, Any]]:
    """Convert a chatterbox T3 checkpoint; None when absent/unmatched."""
    tensors = _read(model_path)
    if not tensors:
        return None

    import jax
    import jax.numpy as jnp

    from .model import init_params

    params = init_params(jax.random.PRNGKey(0), cfg)
    matched = 0

    def count():
        nonlocal matched
        matched += 1

    def put(key, value, transpose=False):
        ref = params[key]
        v = value.T if transpose else value
        if tuple(v.shape) != tuple(ref.shape):
            logger.warning("Shape mismatch at %s: %s vs %s", key, v.shape, ref.shape)
            return
        params[key] = jnp.asarray(v, ref.dtype)
        count()

    t3 = scope(tensors, exclude=_NON_T3)

    emb = find(t3, "text_emb.weight", "text_embed.weight")
    if emb is not None:
        put("text_embed", emb)
    spe = find(t3, "speech_emb.weight", "speech_embed.weight")
    if spe is not None:
        put("speech_embed", spe)
    head = find(t3, "speech_head.weight", "lm_head.weight")
    if head is not None:
        put("lm_head", head, transpose=True)
    spk = find(t3, "spkr_enc.weight", "spk_proj.weight", "cond_proj.weight")
    if spk is not None:
        put("spk_proj", spk, transpose=True)

    blocks = params["talker"]["blocks"]
    new_blocks = map_llama_blocks(t3, blocks, cfg.talker.layers, count)
    params["talker"]["blocks"] = {
        k: jnp.asarray(v, blocks[k].dtype) for k, v in new_blocks.items()
    }
    final_norm = find(t3, "tfmr.norm.weight", "model.norm.weight", "final_layernorm.weight")
    if final_norm is not None:
        ref = params["talker"]["final_norm"]
        if tuple(final_norm.shape) == tuple(ref.shape):
            params["talker"]["final_norm"] = jnp.asarray(final_norm, ref.dtype)
            count()

    if matched == 0:
        logger.warning("Chatterbox checkpoint at %s matched no tensors", model_path)
        return None
    logger.info("Converted %d chatterbox tensor groups from %s", matched, model_path)
    return params
