"""Checkpoint loading: HF safetensors → JAX parameter tree.

Maps Qwen-family transformer weights (q/k/v/o projections, gate/up/down
MLP, norms, embeddings) into the fused-QKV layout used by
``rho_tts_tpu.models.transformer``. Matching is SCOPED per component —
talker tensors are selected only after excluding codec / code-predictor /
speaker namespaces — so same-suffix tensors (every submodule has a
``q_proj.weight``) can never cross-map. Anything unmatched keeps its
random initialization (logged).

Runs fully host-side and converts to bf16 device arrays at the end.
Replaces the reference's in-package torch loading
(``src/rho_tts/providers/qwen.py:143-197`` — from_pretrained ladder).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

from ..hf_weights import find, map_llama_blocks, read_safetensors, scope
from .config import QwenTTSConfig

logger = logging.getLogger(__name__)

# Namespaces that are NOT the AR talker stack. A multi-component TTS
# checkpoint (talker + codec vocoder + residual-code predictor + speaker
# modules) reuses llama-style tensor names inside each component.
_NON_TALKER = (
    "codec", "code2wav", "token2wav", "wav2vec", "speaker",
    "code_predictor", "sub_talker", "thinker", "vocoder", "s3gen",
)


# Namespace markers that select codec (vocoder/encoder/quantizer) tensors
# inside a multi-component checkpoint.
_CODEC_NS = ("codec.", "token2wav.", "code2wav.", "vocoder.")


def _fit_conv(value, ref_shape):
    """Adapt a conv kernel to our (K, Cin, Cout) HIO layout.

    Accepts our native layout, torch ``Conv1d`` (Cout, Cin, K), and torch
    ``ConvTranspose1d`` (Cin, Cout, K). Returns None when no permutation
    matches (the caller logs and keeps the random leaf)."""
    import numpy as np

    v = np.asarray(value)
    if v.ndim != len(ref_shape):
        return None
    if tuple(v.shape) == tuple(ref_shape):
        return v
    for perm in ((2, 1, 0), (2, 0, 1)):
        if tuple(np.transpose(v, perm).shape) == tuple(ref_shape):
            return np.ascontiguousarray(np.transpose(v, perm))
    return None


def _codec_leaves(codec_params):
    """(tree path, canonical tensor suffix) for every codec conv/codebook.

    The suffix naming mirrors the tree itself (``decoder.ups.0.weight``…)
    — the layout ``models.qwen.export``-produced HF dirs use, and a
    close match for HiFiGAN-family vocoder checkpoints."""
    leaves = []
    for branch, updown in (("decoder", "ups"), ("encoder", "downs")):
        b = codec_params[branch]
        leaves.append((("codec", branch, "conv_pre"), f"{branch}.conv_pre.weight"))
        leaves.append((("codec", branch, "conv_post"), f"{branch}.conv_post.weight"))
        for i in range(len(b[updown])):
            leaves.append(
                ((("codec", branch, updown, i)), f"{branch}.{updown}.{i}.weight")
            )
            rb = b["resblocks"][i]
            for j in range(len(rb["convs_d"])):
                leaves.append((
                    ("codec", branch, "resblocks", i, "convs_d", j),
                    f"{branch}.resblocks.{i}.convs_d.{j}.weight",
                ))
                leaves.append((
                    ("codec", branch, "resblocks", i, "convs_p", j),
                    f"{branch}.resblocks.{i}.convs_p.{j}.weight",
                ))
    return leaves


def _map_codec(tensors, params, put) -> None:
    """Map codec (encoder/RVQ/decoder) tensors from their own namespace.

    Judged against the reference's opaque codec dependency
    (``src/rho_tts/providers/qwen.py:218-266`` calls ``qwen_tts`` which
    vocodes internally): here the codec is first-party, so its weights
    ride the same HF-safetensors path as the talker. Unmatched leaves
    keep their random init (logged by ``load_checkpoint``'s counter)."""
    import numpy as np

    cod = scope(tensors, include=_CODEC_NS)
    if not cod:
        return
    for path, suffix in _codec_leaves(params["codec"]):
        t = find(cod, suffix)
        if t is None:
            continue
        node = params
        for p in path[:-1]:
            node = node[p]
        fitted = _fit_conv(t, np.shape(node[path[-1]]))
        if fitted is None:
            logger.warning("Codec layout mismatch at %s: %s", suffix, t.shape)
            continue
        put(params, path, fitted)
    books = find(cod, "rvq.codebooks", "quantizer.codebooks")
    if books is not None:
        put(params, ("codec", "rvq", "codebooks"), books)
    else:
        # Per-layer codebooks (encodec/DAC-style export)
        import numpy as np

        nq = params["codec"]["rvq"]["codebooks"].shape[0]
        per = [
            find(cod, f"rvq.codebooks.{q}", f"quantizer.layers.{q}.codebook",
                 f"quantizer.layers.{q}._codebook.embed")
            for q in range(nq)
        ]
        if all(b is not None for b in per):
            put(params, ("codec", "rvq", "codebooks"), np.stack(per))


def load_checkpoint(
    model_path: str, cfg: QwenTTSConfig, quantization: Optional[str] = None
) -> Optional[Dict[str, Any]]:
    """Load and convert a local checkpoint. Returns None when absent.

    Cold-start discipline: the random fallback tree is built by ONE fused
    jitted program and stays on device; matched tensors are assembled
    host-side (optionally quantized host-side too, halving/quartering the
    bytes moved) and shipped in a single ``jax.device_put`` of the whole
    tree. A complete checkpoint therefore never fetches device memory back
    to host — critical on relay hosts with ~MB/s device→host links.
    """
    if not os.path.isdir(model_path):
        return None
    tensors = read_safetensors(model_path)
    if tensors is None:
        return None

    import jax
    import numpy as np

    from .model import init_params

    t = cfg.talker
    params = jax.jit(init_params, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    matched = 0

    def count():
        nonlocal matched
        matched += 1

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        ref = node[path[-1]]
        if tuple(value.shape) != tuple(ref.shape):
            logger.warning("Shape mismatch at %s: %s vs %s", path, value.shape, ref.shape)
            return
        node[path[-1]] = np.asarray(value).astype(ref.dtype)
        count()

    talker_ns = scope(tensors, exclude=_NON_TALKER)

    emb = find(talker_ns, "embed_tokens.weight", "tok_embeddings.weight")
    if emb is not None:
        put(params, ("text_embed",), emb)

    blocks = params["talker"]["blocks"]
    new_blocks = map_llama_blocks(talker_ns, blocks, t.layers, count)
    params["talker"]["blocks"] = {
        k: v.astype(np.dtype(blocks[k].dtype)) if isinstance(v, np.ndarray) else v
        for k, v in new_blocks.items()
    }

    final_norm = find(talker_ns, "model.norm.weight", "final_layernorm.weight")
    if final_norm is not None:
        put(params["talker"], ("final_norm",), final_norm)

    head = find(talker_ns, "lm_head.weight", "codec_head.weight")
    if head is not None and head.T.shape == tuple(params["lm_head"].shape):
        put(params, ("lm_head",), head.T)

    # Non-talker components, matched by suffix against plausible multi-
    # component TTS checkpoint names. A full native export covers these
    # exactly (models.checkpoint); here is the best-effort HF-side map.
    aud = find(tensors, "audio_embed.weight", "codec_embedding.weight",
               "codec_embed.weight")
    if aud is not None:
        want = params["audio_embed"].shape
        if aud.shape == tuple(want):
            put(params, ("audio_embed",), aud)
        elif aud.shape == (want[0] * want[1], want[2]):
            put(params, ("audio_embed",), aud.reshape(want))
    spk = find(tensors, "speaker_embed.weight", "speaker_embedding.weight")
    if spk is not None:
        put(params, ("speaker_embed",), spk)

    _map_codec(tensors, params, put)

    if matched == 0:
        logger.warning("Checkpoint at %s matched no tensors; using random init", model_path)
        return None

    if quantization in ("int8", "int4"):
        from ..quantization import QUANT_KEYS, quantize_host

        blocks = params["talker"]["blocks"]
        for name in QUANT_KEYS:
            w = blocks.get(name)
            if isinstance(w, np.ndarray):
                blocks[name] = quantize_host(w, quantization)

    params = jax.device_put(params)
    logger.info("Converted %d tensor groups from %s", matched, model_path)
    return params
