"""Cooperative cancellation primitive shared by host-side pipeline code.

Design note (TPU): compiled programs cannot observe Python state, so the
decode loops poll the token only at host sync points — between `lax.scan`
chunks, between pipeline segments, and between validation iterations.  The
token therefore only needs to be cheap to poll and safe to flip from any
thread; it is a plain flag under a lock rather than anything fancier.

Capability parity: reference ``src/rho_tts/cancellation.py:19-65``.
"""

from __future__ import annotations

import threading

from .exceptions import RhoTTSError

__all__ = ["CancellationToken", "CancelledException"]


class CancelledException(RhoTTSError):
    """Raised from :meth:`CancellationToken.raise_if_cancelled` once a
    controller has cancelled the work."""


class CancellationToken:
    """Flag that lets one thread ask another to stop at its next checkpoint.

    The worker polls (``is_cancelled`` / ``raise_if_cancelled``) at points
    where stopping is safe; the controller flips the flag with ``cancel``.
    All methods may be called from any thread, any number of times.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._cancelled = False

    def cancel(self) -> None:
        """Request cancellation (idempotent)."""
        with self._lock:
            self._cancelled = True

    def is_cancelled(self) -> bool:
        """True once :meth:`cancel` has been called (and not reset since)."""
        with self._lock:
            return self._cancelled

    def raise_if_cancelled(self, message: str | None = None) -> None:
        """Checkpoint: raise :class:`CancelledException` if cancelled."""
        if self.is_cancelled():
            raise CancelledException(message or "Task was cancelled")

    def reset(self) -> None:
        """Clear the flag so the token can be reused for a new task.

        A fresh token per task is usually clearer; the UI layer reuses
        session-scoped tokens, which is what this exists for.
        """
        with self._lock:
            self._cancelled = False
