"""Native serving checkpoints: full parameter trees saved/loaded via orbax.

The reference serves models straight from HF checkpoints through torch
``from_pretrained`` (``/root/reference/src/rho_tts/providers/qwen.py:
143-197``); the cold-start cost there is torch's own loader. Here the
TPU-native equivalent is an **export-once, serve-many** flow:

1. Convert/inititialize a model however is convenient (HF safetensors via
   ``models.qwen.weights``, training via ``models.qwen.train``, or random
   init), then ``model.save_checkpoint(dir)``.
2. Serving processes call ``from_pretrained(dir)`` — the full tree
   (including codec / embeddings / code-predictor, which the HF talker
   mapper alone cannot cover) restores with orbax.

Quantization folds into the export: saving an int8-quantized model writes
the ``{"q": int8, "s": f32}`` leaves, so a serving load moves half the
bytes of bf16 and skips the quantize pass entirely — the key lever for
time-to-ready on hosts with slow host↔device links.

A ``rho_tts_tpu.json`` manifest records the preset/config name and the
quantization mode so ``from_pretrained`` can rebuild the right config
without guessing from the directory name.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

logger = logging.getLogger(__name__)

MANIFEST = "rho_tts_tpu.json"
_PARAMS_SUBDIR = "params"


def is_native_checkpoint(path: str) -> bool:
    """True when ``path`` holds a checkpoint written by :func:`save_params`."""
    return os.path.isfile(os.path.join(str(path), MANIFEST))


def save_params(
    path: str,
    params: Dict[str, Any],
    *,
    family: str,
    preset: str,
    quantization: Optional[str] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Save a parameter tree + manifest under ``path`` (a directory).

    ``family`` names the model family ("qwen", "chatterbox", …) so a
    loader can refuse a tree from the wrong stack; ``preset`` is the
    config key needed to rebuild shapes.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(str(path)))
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, _PARAMS_SUBDIR), params, force=True)
    manifest = {
        "format": "rho-tts-tpu-checkpoint",
        "version": 1,
        "family": family,
        "preset": preset,
        "quantization": quantization,
    }
    if extra:
        manifest.update(extra)
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    logger.info("Saved %s/%s checkpoint to %s", family, preset, path)


def load_manifest(path: str) -> Dict[str, Any]:
    with open(os.path.join(str(path), MANIFEST)) as f:
        return json.load(f)


def load_params(
    path: str, *, family: str, sharding=None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore (params, manifest) saved by :func:`save_params`.

    Without ``sharding`` the tree restores to host memory in its saved
    dtypes (orbax records shape/dtype per leaf, so no target tree is
    needed). With a ``jax.sharding.Sharding`` (applied to every leaf) it
    restores DIRECTLY onto devices — per-leaf disk reads overlap the
    host→device transfers instead of staging the whole tree on host
    first, which is the fast path for serving cold starts.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(str(path)))
    manifest = load_manifest(path)
    if manifest.get("family") != family:
        raise ValueError(
            f"Checkpoint at {path} is for family {manifest.get('family')!r}, "
            f"not {family!r}"
        )
    item = os.path.join(path, _PARAMS_SUBDIR)
    with ocp.StandardCheckpointer() as ckptr:
        if sharding is None:
            params = ckptr.restore(item)
        else:
            import jax

            meta = ckptr.metadata(item)
            meta = getattr(meta, "item_metadata", meta)
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
                meta,
            )
            params = ckptr.restore(item, abstract)
    return params, manifest
