"""Two-process CPU dryrun certifying process-spanning (multi-host) DP.

Real multi-host TPU hardware is rarely at hand in development, so this
module certifies the multi-host path the same way the virtual 8-device
CPU mesh certifies single-host sharding: N actual OS processes each
expose ``--xla_force_host_platform_device_count`` virtual CPU devices,
rendezvous through ``jax.distributed.initialize`` (the exact plumbing a
TPU pod slice uses, ``parallel.mesh.initialize_distributed``), build a
process-spanning ``create_multihost_mesh``, and run TWO real workloads
with rows sharded over the global ``data`` axis:

1. tiny-Qwen prefill + an 8-step greedy decode chain, fully jitted;
2. the continuous-batching :class:`~rho_tts_tpu.serving.ServingEngine`
   itself — admission prefill, KV-ring scatters, lagged done-bitmap
   harvest (``process_allgather`` under ``serving._np_fetch``), and
   retire vocode all run SPMD, each process driving the identical
   deterministic scheduler loop.

Certification = every process's gathered tokens/codes match a
process-local single-controller reference bit-for-bit: the
cross-process sharding changed the schedule, not the math.

Run one worker per process::

    python -m rho_tts_tpu.parallel.multihost_dryrun \
        --coordinator 127.0.0.1:PORT --num-processes 2 --process-id I

or launch the whole rendezvous with :func:`run_dryrun` (used by
``__graft_entry__.dryrun_multihost`` and tests/test_multihost.py).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile


def _worker_main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    # The launcher already put --xla_force_host_platform_device_count in
    # XLA_FLAGS (it must precede the first jax import anywhere).
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import transformer as tfm
    from ..models.qwen import PRESETS
    from ..models.qwen.model import init_params
    from .mesh import create_multihost_mesh, initialize_distributed

    initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    assert jax.process_count() == args.num_processes, jax.process_count()

    cfg = PRESETS["tiny"]
    params = init_params(jax.random.PRNGKey(0), cfg)

    b, p, steps = 8, 32, 8
    s = p + steps
    key = jax.random.PRNGKey(1)
    embeds_np = np.asarray(
        jax.random.normal(key, (b, p, cfg.talker.hidden), jnp.float32)
    ).astype(np.float32)
    rope_np = np.broadcast_to(np.arange(p, dtype=np.int32), (b, p))

    def program(params, embeds, rope_pos, cache_k, cache_v, key_valid):
        """Prefill + fully-jitted greedy decode chain (no host syncs)."""
        h, (ck, cv) = tfm.stack_forward(
            params["talker"], cfg.talker, embeds, rope_pos,
            kv_caches=(cache_k, cache_v), cache_len=jnp.int32(0),
            attn_mask=jnp.ones((b, p), bool), key_valid=key_valid,
        )
        key_valid = key_valid.at[:, :p].set(True)
        tok = jnp.argmax(
            jax.lax.dot(h[:, -1], params["lm_head"],
                        preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(jnp.int32)

        def step(carry, t):
            ck, cv, key_valid, tok = carry
            x = params["audio_embed"][0][tok][:, None, :]
            pos = jnp.broadcast_to(p + t, (b,))[:, None].astype(jnp.int32)
            slot = jnp.int32(p) + t
            h, (ck, cv) = tfm.stack_forward(
                params["talker"], cfg.talker, x, pos,
                kv_caches=(ck, cv), cache_len=slot,
                attn_mask=None, key_valid=key_valid,
            )
            key_valid = key_valid.at[:, slot].set(True)
            tok = jnp.argmax(
                jax.lax.dot(h[:, -1], params["lm_head"],
                            preferred_element_type=jnp.float32),
                axis=-1,
            ).astype(jnp.int32)
            return (ck, cv, key_valid, tok), tok

        _, toks = jax.lax.scan(
            step, (ck, cv, key_valid, tok), jnp.arange(steps, dtype=jnp.int32)
        )
        return jnp.concatenate([tok[None], toks]).T  # (B, steps+1)

    # Local single-device reference: same program, no mesh.
    ck0, cv0 = tfm.make_kv_cache(cfg.talker, b, s)
    ref = np.asarray(
        jax.jit(program)(
            params, jnp.asarray(embeds_np), jnp.asarray(rope_np),
            ck0, cv0, jnp.zeros((b, s), bool),
        )
    )

    # Process-spanning DP: batch rows over the global 'data' axis.
    mesh = create_multihost_mesh(model_parallel=1)
    assert mesh.devices.size == jax.device_count()
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data"))

    def shard(x, sh):
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: np.asarray(x)[idx]
        )

    params_g = jax.tree.map(lambda a: shard(np.asarray(a), repl), params)
    ck, cv = tfm.make_kv_cache(cfg.talker, b, s)
    args5 = (
        shard(embeds_np, rows),
        shard(rope_np, rows),
        shard(np.asarray(ck), NamedSharding(mesh, P(None, "data"))),
        shard(np.asarray(cv), NamedSharding(mesh, P(None, "data"))),
        shard(np.zeros((b, s), bool), rows),
    )
    toks_g = jax.jit(program)(params_g, *args5)
    # tiled=True: the sharded rows reassemble into the global (B, steps+1)
    # matrix on every process.
    toks = np.asarray(multihost_utils.process_allgather(toks_g, tiled=True))
    toks = toks.reshape(ref.shape)

    ok = bool(np.array_equal(toks, ref))

    # ---- Phase 2: the ServingEngine itself across processes --------------
    # Slot rows DP-shard over the process-spanning 'data' axis; the whole
    # scheduler (admission prefill, ring scatters, lagged done-bitmap
    # harvest via process_allgather, retire vocode) runs SPMD — every
    # process drives the identical deterministic loop. Greedy codes must be
    # bit-exact vs a process-local single-controller engine.
    from ..models.qwen.model import QwenTTSModel
    from ..serving import ServingEngine
    from .inference import enable_data_parallel

    texts = [
        "multi host serving row one",
        "second request rides another process",
        "third utterance fills the ring",
        "fourth row",
        "a fifth request queues behind the slots",
    ]
    n_slots = int(mesh.shape["data"])  # one slot per data shard

    def run_engine(m):
        eng = ServingEngine(m, n_slots=n_slots, max_prompt=64,
                            max_frames=64, top_k=1)
        reqs = [eng.submit(t, min_frames=8, max_frames=64) for t in texts]
        eng.run_until_idle()
        assert all(r.done() for r in reqs)
        return [r.codes for r in reqs]

    local_model = QwenTTSModel(cfg, params=params, seed=0)
    ref_codes = run_engine(local_model)

    meshed = QwenTTSModel(cfg, params=params, seed=0)
    enable_data_parallel(meshed, mesh)
    mesh_codes = run_engine(meshed)

    serve_ok = all(
        np.array_equal(a, b) for a, b in zip(ref_codes, mesh_codes)
    )
    serve_sum = sum(int(c.sum()) for c in mesh_codes)
    ok = ok and serve_ok

    with open(args.out, "w") as fh:
        fh.write(
            f"{'OK' if ok else 'MISMATCH'} proc={args.process_id} "
            f"procs={jax.process_count()} devices={jax.device_count()} "
            f"mesh={dict(mesh.shape)} checksum={int(toks.sum())} "
            f"serve={'OK' if serve_ok else 'MISMATCH'} "
            f"serve_slots={n_slots} serve_reqs={len(texts)} "
            f"serve_checksum={serve_sum}\n"
        )
    return 0 if ok else 1


def run_dryrun(n_processes: int = 2, local_devices: int = 4, timeout: int = 1800):
    """Spawn the N-process rendezvous on this host; returns the per-process
    report lines. Raises on any mismatch / nonzero exit."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    tmp = tempfile.mkdtemp(prefix="rho_tts_multihost_")
    outs = [os.path.join(tmp, f"proc{i}.txt") for i in range(n_processes)]
    env = dict(os.environ)
    # Strip any inherited device-count flag (e.g. the test conftest's 8):
    # the LAST occurrence wins in XLA, and each worker must see exactly
    # ``local_devices``.
    inherited = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices} " + inherited
    )
    env["JAX_PLATFORMS"] = "cpu"
    # Each worker compiles its own programs — don't share a cache dir
    # mid-flight with the parent (harmless, but avoids lock contention).
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    src_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = src_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rho_tts_tpu.parallel.multihost_dryrun",
             "--coordinator", coordinator,
             "--num-processes", str(n_processes),
             "--process-id", str(i),
             "--out", outs[i]],
            env=env,
        )
        for i in range(n_processes)
    ]
    codes = [pr.wait(timeout=timeout) for pr in procs]
    reports = []
    for i, out in enumerate(outs):
        line = open(out).read().strip() if os.path.exists(out) else "(no report)"
        reports.append(line)
        if codes[i] != 0 or not line.startswith("OK"):
            raise RuntimeError(
                f"multihost dryrun process {i} failed (exit {codes[i]}): {line}"
            )
    return reports


if __name__ == "__main__":
    sys.exit(_worker_main())
