"""ProviderInfo / VoiceInfo dataclass tests."""

from rho_tts_tpu import ProviderInfo, VoiceInfo


def test_voice_info_defaults():
    v = VoiceInfo(id="v1", name="Voice One")
    assert v.language == "English"
    assert v.is_builtin


def test_provider_info_defaults():
    p = ProviderInfo(name="test")
    assert p.name == "test"
    assert not p.supports_voice_cloning
    assert p.supported_languages == []
    assert p.builtin_voices == []


def test_provider_info_populated():
    p = ProviderInfo(
        name="qwen",
        supports_voice_cloning=True,
        supported_languages=["English", "Chinese"],
        builtin_voices=[VoiceInfo(id="a", name="A")],
    )
    assert p.supports_voice_cloning
    assert len(p.builtin_voices) == 1


def test_independent_default_lists():
    p1 = ProviderInfo(name="a")
    p2 = ProviderInfo(name="b")
    p1.supported_languages.append("English")
    assert p2.supported_languages == []
