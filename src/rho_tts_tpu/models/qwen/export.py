"""Offline checkpoint export: HF safetensors / preset → native serving dir.

    python -m rho_tts_tpu.models.qwen.export SRC DST [--quantization int8]

SRC is an HF-layout checkpoint directory (converted through the scoped
mapper in ``models.qwen.weights``) or a preset name ("1.7B", "0.6B",
"tiny" — random-init export, useful for sizing/benchmarks). DST receives
the full-tree orbax checkpoint + manifest that
``QwenTTSModel.from_pretrained`` serves directly.

Conversion runs on the CPU backend so no accelerator (or relay
bandwidth) is needed: quantization happens host-side and the saved bytes
are exactly what serving will move host→device. This replaces the
reference's serve-straight-from-HF flow
(``/root/reference/src/rho_tts/providers/qwen.py:143-197``) with an
export-once model that prices model load once, offline.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("src", help="HF checkpoint dir or preset name")
    parser.add_argument("dst", help="output native checkpoint dir")
    parser.add_argument(
        "--quantization", choices=["int8", "int4"], default=None,
        help="quantize talker matmul weights host-side before saving",
    )
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax

    # Host-side conversion: the sitecustomize pins the TPU backend, so the
    # switch must happen via jax.config after import (env vars alone are
    # ignored at this point).
    jax.config.update("jax_platforms", "cpu")

    from .model import QwenTTSModel

    model = QwenTTSModel.from_pretrained(
        args.src, seed=args.seed, quantization=args.quantization
    )
    model.save_checkpoint(args.dst)
    print(f"exported {model.config.name} (quant={model.quantization}) → {args.dst}")


if __name__ == "__main__":
    main()
