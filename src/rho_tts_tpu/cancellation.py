"""Thread-safe cooperative cancellation.

The TPU decode loop runs in chunks of compiled steps; cancellation is
checked at host sync points between chunks (compiled code cannot observe
Python state), as well as at every pipeline boundary (per text item, per
segment, per validation iteration).

Capability parity: reference ``src/rho_tts/cancellation.py:19-65``.
"""

from __future__ import annotations

import threading
from typing import Optional

from .exceptions import RhoTTSError


class CancelledException(RhoTTSError):
    """Raised when a task is cancelled via a :class:`CancellationToken`."""


class CancellationToken:
    """A thread-safe cancellation token for cooperative task cancellation.

    Usage::

        token = CancellationToken()

        # worker thread
        for item in items:
            token.raise_if_cancelled()
            process(item)

        # controller thread
        token.cancel()
    """

    def __init__(self) -> None:
        self._event = threading.Event()
        self._lock = threading.Lock()

    def cancel(self) -> None:
        """Signal that the task should be cancelled. Thread-safe and idempotent."""
        with self._lock:
            self._event.set()

    def is_cancelled(self) -> bool:
        """Return True if cancellation has been requested."""
        return self._event.is_set()

    def raise_if_cancelled(self, message: Optional[str] = None) -> None:
        """Raise :class:`CancelledException` if cancellation was requested."""
        if self.is_cancelled():
            raise CancelledException(message or "Task was cancelled")

    def reset(self) -> None:
        """Reset the token for reuse. Prefer creating a fresh token."""
        with self._lock:
            self._event.clear()
