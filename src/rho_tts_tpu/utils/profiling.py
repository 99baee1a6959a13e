"""Profiling / tracing instrumentation (first-class, unlike the reference
which has none — SURVEY.md §5.1).

``stage("name")`` wraps pipeline stages in both a ``jax.profiler``
TraceAnnotation (visible in TensorBoard/XProf device timelines) and a
wall-clock accumulator queryable via :func:`summary`. Device traces can be
captured with :func:`start_trace` / :func:`stop_trace` or the
``RHO_TTS_TPU_TRACE_DIR`` env var.
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_wall: Dict[str, float] = defaultdict(float)
_count: Dict[str, int] = defaultdict(int)
_trace_active = False


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Annotate a pipeline stage (device trace + host wall-clock)."""
    t0 = time.perf_counter()
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # noqa: BLE001
        ctx = contextlib.nullcontext()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    with _lock:
        _wall[name] += dt
        _count[name] += 1


def summary() -> Dict[str, Dict[str, float]]:
    """Accumulated wall-clock per stage: {name: {seconds, calls}}."""
    with _lock:
        return {
            name: {"seconds": _wall[name], "calls": _count[name]} for name in _wall
        }


def reset() -> None:
    with _lock:
        _wall.clear()
        _count.clear()


def start_trace(log_dir: Optional[str] = None) -> bool:
    """Start a device profiler trace (viewable in TensorBoard)."""
    global _trace_active
    log_dir = log_dir or os.environ.get("RHO_TTS_TPU_TRACE_DIR")
    if not log_dir or _trace_active:
        return False
    try:
        import jax.profiler

        jax.profiler.start_trace(log_dir)
        _trace_active = True
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning("Could not start profiler trace: %s", e)
        return False


def stop_trace() -> None:
    global _trace_active
    if not _trace_active:
        return
    try:
        import jax.profiler

        jax.profiler.stop_trace()
    except Exception:  # noqa: BLE001
        pass
    _trace_active = False
