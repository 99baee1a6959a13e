"""Factory → isolation fallback: unimportable providers get a proxy."""

from unittest.mock import MagicMock, patch

import pytest

from rho_tts_tpu.factory import TTSFactory


@pytest.fixture(autouse=True)
def _save_factory_state():
    providers = dict(TTSFactory._providers)
    isolated = set(TTSFactory._isolated_providers)
    registered = TTSFactory._default_providers_registered
    yield
    TTSFactory._providers = providers
    TTSFactory._isolated_providers = isolated
    TTSFactory._default_providers_registered = registered


def test_isolated_provider_returns_proxy():
    TTSFactory._default_providers_registered = True
    TTSFactory._providers = {}
    TTSFactory._isolated_providers = {"qwen"}

    fake_proxy = MagicMock()
    with patch("rho_tts_tpu.isolation.ProviderProxy", return_value=fake_proxy) as proxy_cls:
        tts = TTSFactory.get_tts_instance("qwen", seed=42)
    assert tts is fake_proxy
    proxy_cls.assert_called_once_with("qwen", seed=42)


def test_isolated_provider_listed():
    TTSFactory._default_providers_registered = True
    TTSFactory._providers = {}
    TTSFactory._isolated_providers = {"qwen"}
    assert "qwen" in TTSFactory.list_providers()


def test_isolated_provider_static_info():
    TTSFactory._default_providers_registered = True
    TTSFactory._providers = {}
    TTSFactory._isolated_providers = {"qwen", "mystery"}
    info = TTSFactory.get_provider_info("qwen")
    assert info.supports_voice_cloning  # static catalog entry
    info2 = TTSFactory.get_provider_info("mystery")
    assert info2.name == "mystery"  # unknown isolated → bare info
