"""Worker subprocess lifecycle: spawn, framed I/O, crash recovery.

Request/response pairs are serialized under a lock (one outstanding
request); streaming responses are read with ``receive()`` after a
``send_nowait``. A crash (broken pipe / closed stdout) triggers a restart
up to ``MAX_RESTARTS`` times, after which the error is surfaced; the
in-flight request is reported lost, never silently replayed.

Capability parity: reference ``isolation/process_manager.py``.
"""

from __future__ import annotations

import logging
import subprocess
import threading
from typing import Optional

from .protocol import PING, PONG, SHUTDOWN, decode_message, encode_message

logger = logging.getLogger(__name__)

MAX_RESTARTS = 2
SHUTDOWN_GRACE_SEC = 10

WORKER_MODULE = "rho_tts_tpu.isolation.worker"


class WorkerProcess:
    """One long-running worker subprocess with JSON-line pipes."""

    def __init__(self, python_path: str):
        self._python = python_path
        self._proc: Optional[subprocess.Popen] = None
        self._stderr_thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()  # serializes request/response pairs
        self._restart_count = 0

    @property
    def alive(self) -> bool:
        return self._proc is not None and self._proc.poll() is None

    def start(self) -> None:
        """Spawn the worker with line-buffered text pipes."""
        cmd = [self._python, "-m", WORKER_MODULE]
        logger.debug("Starting worker: %s", " ".join(cmd))
        self._proc = subprocess.Popen(
            cmd,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            bufsize=1,
        )
        self._stderr_thread = threading.Thread(
            target=self._forward_stderr, daemon=True, name="worker-stderr"
        )
        self._stderr_thread.start()

    # -- Request/response ----------------------------------------------------

    def send(self, msg_type: str, **payload) -> dict:
        """Send one request and block for its response. Thread-safe."""
        with self._lock:
            try:
                return self._roundtrip(msg_type, **payload)
            except (BrokenPipeError, OSError, ValueError) as exc:
                if self._restart_count >= MAX_RESTARTS:
                    raise RuntimeError(
                        f"Worker crashed {self._restart_count + 1} times, giving up"
                    ) from exc
                logger.warning(
                    "Worker communication failed (%s), restarting (%d/%d)...",
                    exc,
                    self._restart_count + 1,
                    MAX_RESTARTS,
                )
                self._restart_count += 1
                self._kill_locked()
                self.start()
                raise RuntimeError(
                    f"Worker crashed and was restarted. Original error: {exc}"
                ) from exc

    def _roundtrip(self, msg_type: str, **payload) -> dict:
        if not self.alive:
            raise RuntimeError("Worker is not running")
        self._proc.stdin.write(encode_message(msg_type, **payload))
        self._proc.stdin.flush()
        line = self._proc.stdout.readline()
        if not line:
            raise BrokenPipeError("Worker closed stdout (crashed?)")
        return decode_message(line)

    # -- Streaming / one-way ---------------------------------------------------

    def send_nowait(self, msg_type: str, **payload) -> None:
        """Fire a request without waiting (streaming mode)."""
        if not self.alive:
            raise RuntimeError("Worker is not running")
        self._proc.stdin.write(encode_message(msg_type, **payload))
        self._proc.stdin.flush()

    def receive(self) -> Optional[dict]:
        """Read one response; None when the worker closed stdout."""
        if not self.alive:
            return None
        try:
            line = self._proc.stdout.readline()
            return decode_message(line) if line else None
        except Exception:  # noqa: BLE001
            return None

    def send_cancel(self) -> None:
        """Best-effort one-way cancel (no response expected)."""
        try:
            if self.alive:
                self._proc.stdin.write(encode_message("cancel"))
                self._proc.stdin.flush()
        except (BrokenPipeError, OSError):
            logger.debug("Could not send cancel (worker already dead?)")

    def ping(self, timeout: float = 5.0) -> bool:
        """Liveness probe."""
        try:
            return self.send(PING).get("type") == PONG
        except Exception:  # noqa: BLE001
            return False

    # -- Teardown ---------------------------------------------------------------

    def shutdown(self) -> None:
        """Graceful shutdown, escalating to kill after the grace period."""
        with self._lock:
            if not self.alive:
                return
            try:
                self._proc.stdin.write(encode_message(SHUTDOWN))
                self._proc.stdin.flush()
                self._proc.wait(timeout=SHUTDOWN_GRACE_SEC)
                logger.debug("Worker shut down gracefully")
            except Exception:  # noqa: BLE001
                logger.warning("Graceful shutdown failed, killing worker")
                self._kill_locked()

    def kill(self) -> None:
        with self._lock:
            self._kill_locked()

    def _kill_locked(self) -> None:
        if self._proc is not None:
            try:
                self._proc.kill()
                self._proc.wait(timeout=5)
            except Exception:  # noqa: BLE001
                pass
            self._proc = None

    def _forward_stderr(self) -> None:
        """Relay worker stderr lines into the parent logger."""
        try:
            while self._proc and self._proc.stderr:
                line = self._proc.stderr.readline()
                if not line:
                    break
                line = line.rstrip("\n")
                if line:
                    logger.info("[worker] %s", line)
        except Exception:  # noqa: BLE001
            pass
