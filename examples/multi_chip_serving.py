"""Multi-chip serving: data-parallel and tensor-parallel deployment.

Two ways to use more than one TPU chip for inference:

* ``parallelism="data"`` — weights replicated on every chip, request
  batches sharded across the ``data`` mesh axis. Linear throughput
  scaling; each chip must hold the whole model. Right choice for the
  0.6B/1.7B models on v5e.
* ``parallelism="tensor"`` — Megatron-style sharding: attention heads and
  FFN columns split across the ``model`` axis (see
  ``parallel/sharding.py``), XLA inserts the psums over ICI. Lets a model
  larger than one chip's HBM serve, at some per-token latency cost.

On a CPU-only development host, emulate an 8-chip mesh::

    EMULATE_MESH=8 python examples/multi_chip_serving.py

On a real TPU pod slice, run as-is — the mesh uses every visible chip.
(With fewer devices than requested the providers log a warning and fall
back to single-device serving, so this example runs anywhere.)
"""

import os

if os.environ.get("EMULATE_MESH"):
    n = int(os.environ["EMULATE_MESH"])
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax

    # A sitecustomize may pre-register an accelerator backend, so flip the
    # live config too (env vars alone are not enough then).
    jax.config.update("jax_platforms", "cpu")

from rho_tts_tpu import TTSFactory

texts = [
    "Data parallel serving shards request batches across chips.",
    "Tensor parallel serving shards the model itself.",
    "Throughput scales with the mesh, not the clock.",
    "Static shapes keep every chip on the compiled fast path.",
]

# ---------------------------------------------------------------------------
# Data-parallel: batches spread over the mesh, weights replicated
# ---------------------------------------------------------------------------
with TTSFactory.get_tts_instance(
    provider="qwen",
    model_path="tiny-CustomVoice",  # use "1.7B-CustomVoice" on real chips
    speaker="Vivian",
    parallelism="data",
) as tts:
    results = tts.generate(texts)
    for t, r in zip(texts, results):
        print(f"[dp] {r.duration_sec:5.2f}s  {t[:50]}")

# ---------------------------------------------------------------------------
# Tensor-parallel: heads/FFN sharded over the `model` axis
# ---------------------------------------------------------------------------
with TTSFactory.get_tts_instance(
    provider="qwen",
    model_path="tiny-CustomVoice",
    speaker="Ryan",
    parallelism="tensor",
) as tts:
    result = tts.generate("One model, many chips, one voice.")
    print(f"[tp] {result.duration_sec:5.2f}s  sharded decode OK")
