"""Factory / registry for TTS provider instances.

Supports dynamic provider registration, lazy default registration, and a
fallback to the subprocess isolation layer when a provider's dependencies
are unimportable in the current process.

Capability parity: reference ``src/rho_tts/factory.py:43-176``.
"""

from __future__ import annotations

from typing import Dict, List, Set, Type

from .engine import BaseTTS
from .exceptions import ProviderNotFoundError
from .provider_info import ProviderInfo, VoiceInfo


def _builtin_voice_catalog() -> List[VoiceInfo]:
    return [
        VoiceInfo(id=n, name=n, language="English")
        for n in (
            "Chelsie",
            "Aidan",
            "Vivian",
            "Ryan",
            "Aria",
            "Ethan",
            "Luna",
            "Harper",
            "James",
        )
    ]


# Static metadata for isolated providers (avoids subprocess spin-up just to
# answer a metadata query).
_STATIC_PROVIDER_INFO: Dict[str, ProviderInfo] = {
    "qwen": ProviderInfo(
        name="qwen",
        supports_voice_cloning=True,
        supported_languages=["English", "Chinese", "Japanese", "Korean"],
        builtin_voices=_builtin_voice_catalog(),
    ),
    "chatterbox": ProviderInfo(
        name="chatterbox",
        supports_voice_cloning=True,
        supported_languages=["English"],
        builtin_voices=[VoiceInfo(id="default", name="Default", language="English")],
    ),
}


class TTSFactory:
    """Factory for creating TTS provider instances."""

    _providers: Dict[str, Type[BaseTTS]] = {}
    _isolated_providers: Set[str] = set()
    _default_providers_registered = False

    @classmethod
    def _register_default_providers(cls) -> None:
        """Register built-in providers on first use.

        Providers whose dependencies are unavailable fall into
        ``_isolated_providers`` and are served through ``ProviderProxy``
        in an auto-managed venv.
        """
        if cls._default_providers_registered:
            return
        cls._default_providers_registered = True

        try:
            from .providers.qwen import QwenTTS

            cls._providers["qwen"] = QwenTTS
        except ImportError:
            cls._isolated_providers.add("qwen")

        try:
            from .providers.chatterbox import ChatterboxTTS

            cls._providers["chatterbox"] = ChatterboxTTS
        except ImportError:
            cls._isolated_providers.add("chatterbox")

    @classmethod
    def get_tts_instance(cls, provider: str = "qwen", **kwargs) -> BaseTTS:
        """Create a TTS instance for the given provider.

        Raises:
            ProviderNotFoundError: for unknown providers.
        """
        cls._register_default_providers()

        if provider in cls._providers:
            return cls._providers[provider](**kwargs)

        if provider in cls._isolated_providers:
            from .isolation import ProviderProxy

            return ProviderProxy(provider, **kwargs)

        available = ", ".join(cls.list_providers()) or "(none registered)"
        raise ProviderNotFoundError(
            f"Unknown TTS provider: '{provider}'. Available providers: {available}. "
            f"Make sure the provider's dependencies are installed."
        )

    @classmethod
    def register_provider(cls, name: str, provider_class: Type[BaseTTS]) -> None:
        """Register a new provider class under ``name``.

        Raises:
            TypeError: if ``provider_class`` does not inherit from BaseTTS.
        """
        if not issubclass(provider_class, BaseTTS):
            raise TypeError(f"{provider_class} must inherit from BaseTTS")
        cls._providers[name] = provider_class

    @classmethod
    def list_providers(cls) -> List[str]:
        """All available provider names (including isolated ones)."""
        cls._register_default_providers()
        return sorted(set(cls._providers.keys()) | cls._isolated_providers)

    @classmethod
    def get_provider_info(cls, provider: str) -> ProviderInfo:
        """Provider metadata without initializing any model.

        Raises:
            ProviderNotFoundError: for unknown providers.
        """
        cls._register_default_providers()

        if provider in cls._providers:
            return cls._providers[provider].provider_info()

        if provider in cls._isolated_providers:
            return _STATIC_PROVIDER_INFO.get(provider, ProviderInfo(name=provider))

        available = ", ".join(cls.list_providers()) or "(none registered)"
        raise ProviderNotFoundError(
            f"Unknown TTS provider: '{provider}'. Available providers: {available}."
        )

    @classmethod
    def list_voices(cls, provider: str) -> List[VoiceInfo]:
        """Built-in voices for a provider."""
        return cls.get_provider_info(provider).builtin_voices
