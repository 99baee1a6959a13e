"""Exception hierarchy for rho-tts-tpu.

Every library error derives from :class:`RhoTTSError` so callers can catch
the whole family with a single ``except`` clause.

Capability parity: reference ``src/rho_tts/exceptions.py:9-31``.
"""


class RhoTTSError(Exception):
    """Base exception for all rho-tts-tpu errors."""


class ProviderNotFoundError(RhoTTSError):
    """A requested TTS provider is not registered."""


class ModelLoadError(RhoTTSError):
    """A TTS model failed to load (weights, config, or device placement)."""


class AudioGenerationError(RhoTTSError):
    """Audio generation failed."""


class FormatConversionError(RhoTTSError):
    """Audio format conversion failed or an unsupported format was requested."""
