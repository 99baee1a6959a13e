"""Provider and voice introspection dataclasses.

Used by ``BaseTTS.provider_info()`` / ``TTSFactory.get_provider_info()`` to
expose provider capabilities without initializing any model.

Capability parity: reference ``src/rho_tts/provider_info.py:12-27``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List


@dataclass
class VoiceInfo:
    """Metadata for a single voice."""

    id: str
    name: str
    language: str = "English"
    is_builtin: bool = True


@dataclass
class ProviderInfo:
    """Metadata about a TTS provider's capabilities."""

    name: str
    supports_voice_cloning: bool = False
    supported_languages: List[str] = field(default_factory=list)
    builtin_voices: List[VoiceInfo] = field(default_factory=list)
