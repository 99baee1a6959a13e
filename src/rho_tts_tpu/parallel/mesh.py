"""Mesh construction helpers.

Axis convention:
  * ``data``  — batch/data parallelism (segments, texts, validation clips)
  * ``model`` — tensor parallelism (attention heads / FFN columns)

On a v5e pod slice the ``model`` axis should map to the minor (fast ICI)
dimension; ``mesh_utils.create_device_mesh`` handles the physical layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int, model_parallel: Optional[int] = None) -> Tuple[int, int]:
    """Pick (data, model) sizes for ``n_devices``.

    Model parallelism defaults to the largest power of two ≤ 4 that divides
    the device count (a 1.7B-class model rarely benefits from TP > 4; the
    rest goes to batch parallelism).
    """
    if model_parallel is None:
        model_parallel = 1
        for cand in (4, 2):
            if n_devices % cand == 0:
                model_parallel = cand
                break
    return n_devices // model_parallel, model_parallel


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    dp, mp = default_mesh_shape(n_devices, model_parallel)
    mesh_devices = mesh_utils.create_device_mesh((dp, mp), devices=devices)
    return Mesh(mesh_devices, axis_names=tuple(axis_names))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host plumbing: ``jax.distributed.initialize`` with env-var
    defaults, idempotent.

    On a real TPU pod slice every argument auto-detects (the TPU runtime
    provides the coordinator); on CPU/GPU — and in the 2-process CPU
    dryrun (``parallel.multihost_dryrun``) — they come from arguments or
    the ``RHO_TTS_TPU_COORDINATOR`` / ``RHO_TTS_TPU_NUM_PROCESSES`` /
    ``RHO_TTS_TPU_PROCESS_ID`` environment. After this call
    ``jax.devices()`` enumerates the GLOBAL device set and process-
    spanning meshes (:func:`create_multihost_mesh`) become valid.

    The reference has no multi-process accelerator story at all (its only
    multi-process component is the dependency-isolation worker,
    ``/root/reference/src/rho_tts/isolation/``); this is the TPU-native
    scale-out path: ICI collectives within a host, DCN across hosts, all
    inserted by XLA.
    """
    import os

    # NOTE: no jax.process_count()/jax.devices() here — querying the
    # backend would initialize it, and distributed.initialize must run
    # first. The idempotence guard is therefore a module-level flag.
    if getattr(initialize_distributed, "_done", False):
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "RHO_TTS_TPU_COORDINATOR"
    )
    if num_processes is None:
        env = os.environ.get("RHO_TTS_TPU_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("RHO_TTS_TPU_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection path (single-process everywhere else).
        try:
            jax.distributed.initialize()
        except Exception:  # noqa: BLE001 — not a pod; stay single-process
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    initialize_distributed._done = True


def create_multihost_mesh(
    model_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Process-spanning 2-D (data, model) mesh.

    The ``data`` axis factors as (process, per-host data) — major axis
    over processes — so DP collectives cross DCN only at the process
    boundary; ``model`` (tensor parallelism) stays WITHIN a host so its
    per-layer psums ride ICI. ``model_parallel`` must divide the local
    device count for that reason.
    """
    procs = jax.process_count()
    if procs == 1:
        return create_mesh(model_parallel=model_parallel)
    local = jax.local_device_count()
    dp_local, mp = default_mesh_shape(local, model_parallel)
    if mp > local:
        raise ValueError(
            f"model_parallel ({mp}) must fit within one host's "
            f"{local} devices (TP psums must ride ICI, not DCN)"
        )
    try:
        # TPU pods: slice-aware layout (ICI within a slice, DCN across).
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            (dp_local, mp), (procs, 1)
        )
    except ValueError:
        # No slice topology (CPU dryruns, single-slice backends): order
        # devices process-major by hand — same property (each process's
        # devices are contiguous along 'data'; 'model' never crosses a
        # process).
        import numpy as np

        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        mesh_devices = np.array(devs).reshape(procs, dp_local, mp)
    return Mesh(mesh_devices.reshape(procs * dp_local, mp),
                axis_names=tuple(axis_names))
