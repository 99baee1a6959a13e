"""AppState tests: kwargs assembly, TTS caching, history, cancellation."""

from unittest.mock import MagicMock, patch

import pytest

from rho_tts_tpu.ui.config import AppConfig, GenerationRecord, ModelConfig, VoiceProfile
from rho_tts_tpu.ui.state import AppState


@pytest.fixture
def state():
    return AppState(config=AppConfig(), multi_user=True)  # multi_user → no disk IO


def qwen_base_model():
    return ModelConfig(
        id="m-base", label="Base", provider="qwen",
        model_path="Qwen/Tiny-Base", needs_reference=True,
        default_params={"max_iterations": 10, "accent_drift_threshold": 0.17},
    )


def clone_voice():
    return VoiceProfile(
        id="v-clone", name="Clone", provider="qwen",
        reference_audio="/ref.wav", reference_text="transcript",
    )


class TestKwargsAssembly:
    def test_qwen_cloning_voice(self, state):
        kwargs = state.build_tts_kwargs(qwen_base_model(), clone_voice())
        assert kwargs["reference_audio"] == "/ref.wav"
        assert kwargs["reference_text"] == "transcript"
        assert kwargs["model_path"] == "Qwen/Tiny-Base"
        assert kwargs["max_iterations"] == 10

    def test_qwen_named_speaker(self, state):
        model = ModelConfig(
            id="m-cv", label="CV", provider="qwen", model_path="Qwen/Tiny-CustomVoice"
        )
        voice = VoiceProfile(id="v-r", name="Ryan", provider="qwen", speaker="Ryan")
        kwargs = state.build_tts_kwargs(model, voice)
        assert kwargs["speaker"] == "Ryan"
        assert "reference_audio" not in kwargs

    def test_chatterbox_filters_qwen_params(self, state):
        model = ModelConfig(
            id="m-c", label="C", provider="chatterbox", model_path="chatterbox-standard",
            default_params={"implementation": "standard", "speaker": "X", "batch_size": 5},
        )
        voice = VoiceProfile(id="v-c", name="C", provider="chatterbox",
                             reference_audio="/r.wav")
        kwargs = state.build_tts_kwargs(model, voice)
        assert "speaker" not in kwargs
        assert "batch_size" not in kwargs
        assert "model_path" not in kwargs
        assert kwargs["implementation"] == "standard"
        assert kwargs["reference_audio"] == "/r.wav"

    def test_qwen_filters_chatterbox_params(self, state):
        model = qwen_base_model()
        model.default_params = dict(model.default_params, cfg_weight=0.6, temperature=1.0)
        kwargs = state.build_tts_kwargs(model, clone_voice())
        assert "cfg_weight" not in kwargs
        assert "temperature" not in kwargs

    def test_overrides_applied(self, state):
        model = qwen_base_model()
        voice = clone_voice()
        state.config.parameter_overrides["v-clone::m-base"] = {"max_iterations": 3}
        kwargs = state.build_tts_kwargs(model, voice)
        assert kwargs["max_iterations"] == 3

    def test_phonetic_mapping_included(self, state):
        state.config.phonetic_mappings["v-clone::m-base"] = {"a": "b"}
        kwargs = state.build_tts_kwargs(qwen_base_model(), clone_voice())
        assert kwargs["phonetic_mapping"] == {"a": "b"}


class TestTTSCache:
    def test_cache_hit_on_same_pair(self, state):
        model, voice = qwen_base_model(), clone_voice()
        fake = MagicMock()
        with patch("rho_tts_tpu.factory.TTSFactory.get_tts_instance", return_value=fake) as get:
            t1 = state.get_or_create_tts(model, voice)
            t2 = state.get_or_create_tts(model, voice)
        assert t1 is t2
        get.assert_called_once()
        assert fake.voice_id == "v-clone"

    def test_teardown_on_switch(self, state):
        model, voice = qwen_base_model(), clone_voice()
        other_voice = VoiceProfile(id="v2", name="Two", provider="qwen",
                                   reference_audio="/r2.wav", reference_text="t")
        first, second = MagicMock(), MagicMock()
        with patch(
            "rho_tts_tpu.factory.TTSFactory.get_tts_instance", side_effect=[first, second]
        ):
            t1 = state.get_or_create_tts(model, voice)
            t2 = state.get_or_create_tts(model, other_voice)
        assert t1 is not t2
        first.close.assert_called_once()

    def test_invalidate(self, state):
        model, voice = qwen_base_model(), clone_voice()
        fake = MagicMock()
        with patch("rho_tts_tpu.factory.TTSFactory.get_tts_instance", return_value=fake):
            state.get_or_create_tts(model, voice)
            state.invalidate_tts()
        fake.close.assert_called_once()
        assert state._tts is None


class TestHistory:
    def test_add_get_delete(self, state):
        rec = GenerationRecord.new(text="x", voice_id="v", model_id="m", output_path=None)
        state.add_record(rec)
        assert state.get_record(rec.id) is rec
        assert state.delete_record(rec.id)
        assert state.get_record(rec.id) is None
        assert not state.delete_record("missing")


class TestCancellation:
    def test_token_lifecycle(self, state):
        token = state.new_cancellation_token()
        assert not token.is_cancelled()
        state.cancel_generation()
        assert token.is_cancelled()

    def test_cancel_without_token_is_noop(self, state):
        state.cancel_generation()  # must not raise


class TestServingKnobs:
    """TPU serving knobs flow from per-model config to constructor kwargs."""

    def test_serving_params_normalized(self, state):
        model = ModelConfig(
            id="m-s", label="S", provider="qwen", model_path="Qwen/Tiny-CustomVoice",
            default_params={
                "quantization": "bf16", "parallelism": "none",
                "draft_model_path": "", "speculative_gamma": 4,
            },
        )
        voice = VoiceProfile(id="v-s", name="S", provider="qwen", speaker="Ryan")
        kwargs = state.build_tts_kwargs(model, voice)
        assert kwargs["quantization"] is None     # bf16 sentinel → dense
        assert kwargs["parallelism"] is None      # none sentinel
        assert "draft_model_path" not in kwargs   # empty → omitted

    def test_serving_params_passthrough(self, state):
        model = ModelConfig(
            id="m-s2", label="S2", provider="qwen", model_path="Qwen/Tiny-CustomVoice",
            default_params={
                "quantization": "int4", "parallelism": "tensor",
                "draft_model_path": "tiny-draft", "speculative_gamma": 6,
            },
        )
        voice = VoiceProfile(id="v-s2", name="S2", provider="qwen", speaker="Aria")
        kwargs = state.build_tts_kwargs(model, voice)
        assert kwargs["quantization"] == "int4"
        assert kwargs["parallelism"] == "tensor"
        assert kwargs["draft_model_path"] == "tiny-draft"
        assert kwargs["speculative_gamma"] == 6

    def test_chatterbox_filters_qwen_knobs_keeps_shared(self, state):
        """Chatterbox drops Qwen-only knobs but keeps the shared ones:
        quantization AND serving (ChatterboxServingEngine)."""
        model = ModelConfig(
            id="m-s3", label="S3", provider="chatterbox", model_path="chatterbox-standard",
            default_params={"quantization": "int8", "parallelism": "tensor",
                            "draft_model_path": "d", "speculative_gamma": 4,
                            "serving": True},
        )
        voice = VoiceProfile(id="v-s3", name="S3", provider="chatterbox",
                             reference_audio="/r.wav")
        kwargs = state.build_tts_kwargs(model, voice)
        assert kwargs["quantization"] == "int8"
        assert kwargs["serving"] is True
        assert "parallelism" not in kwargs
        assert "draft_model_path" not in kwargs
        assert "speculative_gamma" not in kwargs
