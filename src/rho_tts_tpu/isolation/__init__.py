"""Dependency isolation: run providers in auto-managed venv subprocesses.

When a provider's dependencies can't be imported in the host process, the
factory transparently returns a :class:`ProviderProxy` that spawns a
worker in a per-provider venv and speaks a newline-delimited JSON protocol
over stdin/stdout. Audio never crosses the pipe — only file paths.

This layer is accelerator-agnostic by design (the TPU work happens inside
the worker); on-accelerator scale-out is the job of ``parallel`` instead.
Capability parity: reference ``src/rho_tts/isolation/``.
"""

from .proxy import ProviderProxy

__all__ = ["ProviderProxy"]
