"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated 8-device mesh
(``xla_force_host_platform_device_count``); the real-TPU path is exercised
by bench.py and the driver's graft entry instead.

The environment may pre-register an accelerator PJRT plugin at interpreter
startup (sitecustomize), so setting JAX_PLATFORMS via os.environ alone is
not enough — we also flip the live jax config before any backend
initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

def _tune_glibc_malloc():
    """Route large allocations through mmap so frees return to the OS.

    The compile-heavy suite fragments the main heap: freed XLA scratch
    lands under long-lived small objects, malloc_trim can only shave the
    heap top, and retention COMPOUNDS across modules (measured ~0.05
    GB/module early, 2-7 GB/module by mid-suite; one full run was
    OOM-killed at 130 GB with only ~10 MB of live jax arrays).
    M_MMAP_THRESHOLD=128 KB makes every sizable block its own mapping —
    freed memory unmaps immediately, so the heap cannot fragment into
    the tens of GB. Must run before the backend's first big allocation.
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 131072)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 131072)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover — non-glibc hosts
        pass


_tune_glibc_malloc()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _machine_scoped_cache_dir():
    """Persistent XLA compile cache keyed to THIS machine's CPU.

    The suite is compile-bound on a 1-core host (a cold run is ~1 h; a
    warm one minutes), so caching pays enormously — but CPU AOT
    artifacts embed host ISA features and can SIGILL if replayed on a
    different machine, which is why the generic /root/.jax_cache is
    TPU-only (see __graft_entry__). Scoping the directory by a hash of
    the CPU model + feature flags + jax version makes reuse safe: a
    different machine simply sees an empty cache. Opt out with
    RHO_TTS_TPU_TEST_NO_COMPILE_CACHE=1 (e.g. when bisecting compiler
    issues).
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        model = ""
        flags = ""
        for line in info.splitlines():
            if line.startswith("model name") and not model:
                model = line
            elif line.startswith("flags") and not flags:
                flags = line
        key = hashlib.sha256(
            f"{model}|{flags}|{jax.__version__}".encode()
        ).hexdigest()[:16]
    except OSError:  # pragma: no cover — no /proc (non-Linux)
        return None
    return os.path.expanduser(f"~/.cache/rho_tts_tpu/xla_cpu_{key}")


if not os.environ.get("RHO_TTS_TPU_TEST_NO_COMPILE_CACHE"):
    _cache_dir = _machine_scoped_cache_dir()
    if _cache_dir:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def _malloc_trim():
    """Return freed glibc arenas to the OS (RSS otherwise only grows)."""
    import ctypes

    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:  # pragma: no cover — non-glibc hosts
        pass


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_executable_memory(request):
    """Drop compiled executables after each test module.

    The suite is compile-heavy (64 files, many distinct mesh/shape
    programs); keeping every executable alive in one pytest process grew
    RSS past 50 GB. Per-module clearing plus an explicit malloc_trim
    bounds the working set — clear_caches alone frees to the allocator,
    but glibc retains the arenas and the OS-visible watermark only climbs.
    """
    yield
    jax.clear_caches()
    if not os.environ.get("RHO_TTS_TPU_TEST_NO_CLEAR_BACKENDS"):
        # Drop the PJRT CPU client too. Runtime-retained memory (not
        # live arrays — those measured ~10 MB) compounds across the
        # 64-module suite: one full run was OOM-killed at 130 GB, and
        # clear_caches + malloc_trim + mmap-threshold tuning only slowed
        # the growth. A fresh client starts empty; the old one frees
        # once its last live array is collected (old arrays stay usable
        # until then). Measured: a heavy 3-module sequence holds 0.3 GB
        # with this vs ~15 GB mid-suite without.
        import jax.extend.backend as _xb

        _xb.clear_backends()
    import gc

    gc.collect()
    _malloc_trim()
    if os.environ.get("RHO_TTS_TPU_TEST_RSS_LOG"):
        with open("/proc/self/statm") as f:
            rss_gb = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e9
        live = jax.live_arrays()
        live_gb = sum(a.size * a.dtype.itemsize for a in live) / 1e9
        with open(os.environ["RHO_TTS_TPU_TEST_RSS_LOG"], "a") as f:
            f.write(
                f"{rss_gb:.2f} GB rss, {live_gb:.2f} GB in {len(live)} live "
                f"arrays after {request.node.nodeid}\n"
            )
