"""UI config dataclasses + JSON persistence roundtrips."""

import json
import os

import pytest

from rho_tts_tpu.ui import config as cfgmod
from rho_tts_tpu.ui.config import (
    AppConfig,
    GenerationRecord,
    ModelConfig,
    VoiceProfile,
    builtin_voices,
    default_models,
)


@pytest.fixture(autouse=True)
def isolated_paths(tmp_path, monkeypatch):
    monkeypatch.setenv(cfgmod.CONFIG_ENV, str(tmp_path / "config.json"))
    monkeypatch.setenv(cfgmod.HISTORY_ENV, str(tmp_path / "history.json"))


class TestVoiceProfile:
    def test_cloning_detection(self):
        v = VoiceProfile(id="v1", name="V", reference_audio="/x.wav")
        assert v.is_cloning
        assert not VoiceProfile(id="v2", name="W", speaker="Ryan").is_cloning

    def test_from_dict_ignores_unknown(self):
        v = VoiceProfile.from_dict({"id": "a", "name": "b", "future_field": 1})
        assert v.id == "a"


class TestDefaults:
    def test_builtin_voices_include_speakers(self):
        names = [v.name for v in builtin_voices()]
        assert "Vivian" in names and "Ryan" in names
        assert all(v.is_builtin for v in builtin_voices())

    def test_default_models_both_providers(self):
        providers = {m.provider for m in default_models()}
        assert providers == {"qwen", "chatterbox"}

    def test_model_catalog_thresholds(self):
        chat = [m for m in default_models() if m.provider == "chatterbox"][0]
        assert chat.default_params["max_iterations"] == 50
        assert chat.default_params["text_similarity_threshold"] == 0.75


class TestAppConfig:
    def test_roundtrip(self):
        cfg = AppConfig()
        cfg.phonetic_mappings["v::m"] = {"word": "werd"}
        cfg.parameter_overrides["v::m"] = {"max_iterations": 3}
        cfg.last_voice_id = "v"
        restored = AppConfig.from_dict(cfg.to_dict())
        assert restored.get_phonetic_mapping("v", "m") == {"word": "werd"}
        assert restored.get_parameter_override("v", "m") == {"max_iterations": 3}
        assert restored.last_voice_id == "v"

    def test_composite_key(self):
        assert AppConfig.composite_key("v1", "m1") == "v1::m1"

    def test_lookup_helpers(self):
        cfg = AppConfig()
        mid = cfg.models[0].id
        assert cfg.get_model(mid) is cfg.models[0]
        assert cfg.get_model("nope") is None
        vid = cfg.voices[0].id
        assert cfg.get_voice(vid) is cfg.voices[0]

    def test_empty_dict_restores_defaults(self):
        cfg = AppConfig.from_dict({})
        assert cfg.voices and cfg.models


class TestPersistence:
    def test_save_load_config(self):
        cfg = AppConfig()
        cfg.last_model_id = "test-model"
        cfgmod.save_config(cfg)
        assert cfgmod.load_config().last_model_id == "test-model"

    def test_load_missing_returns_defaults(self):
        cfg = cfgmod.load_config()
        assert len(cfg.voices) >= 10

    def test_corrupt_config_falls_back(self):
        with open(cfgmod.config_path(), "w") as f:
            f.write("{not json")
        cfg = cfgmod.load_config()
        assert cfg.models

    def test_history_roundtrip(self):
        rec = GenerationRecord.new(
            text="hello", voice_id="v", model_id="m", output_path="/x.wav",
            duration_sec=1.5,
        )
        cfgmod.save_history([rec])
        loaded = cfgmod.load_history()
        assert len(loaded) == 1
        assert loaded[0].text == "hello"
        assert loaded[0].id == rec.id

    def test_store_voice_audio(self, tmp_path, monkeypatch):
        monkeypatch.setattr(cfgmod, "VOICES_DIR", str(tmp_path / "voices"))
        src = tmp_path / "ref.wav"
        src.write_bytes(b"RIFFfake")
        dest = cfgmod.store_voice_audio(str(src), "voice-abc")
        assert os.path.exists(dest)
        assert "voice-abc" in dest


class TestModelCache:
    def test_local_dir_counts_as_cached(self, tmp_path):
        assert cfgmod.is_model_cached(str(tmp_path))

    def test_uncached_hf_id(self):
        assert not cfgmod.is_model_cached("Fake/Not-A-Model-xyz")
