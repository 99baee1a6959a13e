"""TTSFactory registry tests.

Factory state is class-level; each test saves/restores it.
"""

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, ProviderNotFoundError, TTSFactory


class DummyTTS(BaseTTS):
    def __init__(self, **kwargs):
        super().__init__(device="cpu")
        self.kwargs = kwargs

    def _generate_audio(self, text, **kwargs):
        return np.zeros(1000, dtype=np.float32)

    @property
    def sample_rate(self):
        return 16000


@pytest.fixture(autouse=True)
def _save_factory_state():
    providers = dict(TTSFactory._providers)
    isolated = set(TTSFactory._isolated_providers)
    registered = TTSFactory._default_providers_registered
    yield
    TTSFactory._providers = providers
    TTSFactory._isolated_providers = isolated
    TTSFactory._default_providers_registered = registered


def test_register_and_create():
    TTSFactory.register_provider("dummy", DummyTTS)
    tts = TTSFactory.get_tts_instance("dummy", foo=42)
    assert isinstance(tts, DummyTTS)
    assert tts.kwargs == {"foo": 42}


def test_register_requires_base_tts_subclass():
    class NotATTS:
        pass

    with pytest.raises(TypeError):
        TTSFactory.register_provider("bad", NotATTS)


def test_unknown_provider_raises():
    with pytest.raises(ProviderNotFoundError):
        TTSFactory.get_tts_instance("nope-does-not-exist")


def test_list_providers_contains_defaults():
    providers = TTSFactory.list_providers()
    assert "qwen" in providers
    assert "chatterbox" in providers


def test_list_providers_contains_registered():
    TTSFactory.register_provider("dummy", DummyTTS)
    assert "dummy" in TTSFactory.list_providers()


def test_get_provider_info_for_registered():
    TTSFactory.register_provider("dummy", DummyTTS)
    info = TTSFactory.get_provider_info("dummy")
    assert info.name == "DummyTTS"


def test_get_provider_info_unknown_raises():
    with pytest.raises(ProviderNotFoundError):
        TTSFactory.get_provider_info("nope")


def test_qwen_provider_info_voices():
    info = TTSFactory.get_provider_info("qwen")
    assert info.supports_voice_cloning
    voice_ids = [v.id for v in TTSFactory.list_voices("qwen")]
    assert "Vivian" in voice_ids
    assert "Ryan" in voice_ids
