"""UI callback tests: generation flow, CRUD, parameters, library, training."""

import os
from unittest.mock import MagicMock, patch

import numpy as np
import pytest

from rho_tts_tpu.result import GenerationResult
from rho_tts_tpu.ui import callbacks as cb
from rho_tts_tpu.ui.config import AppConfig, ModelConfig, VoiceProfile
from rho_tts_tpu.ui.state import AppState


@pytest.fixture
def state():
    return AppState(config=AppConfig(), multi_user=True)


def first_model_id(state, provider="qwen", needs_reference=False):
    for m in state.config.models:
        if m.provider == provider and m.needs_reference == needs_reference:
            return m.id
    raise AssertionError("catalog model missing")


class TestValidation:
    def test_empty_text(self, state):
        _, _, err = cb.validate_generation_request(state, "x", "y", "  ")
        assert "text" in err.lower()

    def test_unknown_model(self, state):
        _, _, err = cb.validate_generation_request(state, "nope", "y", "hi")
        assert "Unknown model" in err

    def test_base_model_needs_cloning_voice(self, state):
        mid = first_model_id(state, needs_reference=True)
        vid = state.config.voices[0].id  # builtin named speaker
        _, _, err = cb.validate_generation_request(state, mid, vid, "hi")
        assert "reference audio" in err or "cloning" in err

    def test_custom_voice_ok_with_speaker(self, state):
        mid = first_model_id(state, needs_reference=False)
        vid = next(v.id for v in state.config.voices if v.speaker)
        model, voice, err = cb.validate_generation_request(state, mid, vid, "hi")
        assert err is None
        assert voice.speaker


class TestGenerateFlow:
    def _run(self, state, tts, tmp_path):
        mid = first_model_id(state, needs_reference=False)
        vid = next(v.id for v in state.config.voices if v.speaker)
        with patch.object(state, "get_or_create_tts", return_value=tts):
            return list(
                cb.generate_audio(state, mid, vid, "hello", output_dir=str(tmp_path))
            )

    def test_success_streams_progress_and_records(self, state, tmp_path):
        def fake_generate(text, out_path, cancellation_token=None, progress_callback=None, **kw):
            if progress_callback:
                progress_callback("Generating segment 1/1...")
            return GenerationResult(
                path=out_path, audio=np.zeros(10), sample_rate=24000,
                duration_sec=1.2, segments_count=1, drift_prob=0.05,
                text_similarity=0.97,
            )

        tts = MagicMock()
        tts.generate.side_effect = fake_generate
        updates = self._run(state, tts, tmp_path)
        assert any("segment 1/1" in status for _, status in updates)
        final_path, final_status = updates[-1]
        assert final_path is not None
        assert "✅" in final_status and "drift 0.05" in final_status
        assert len(state.history) == 1

    def test_failure_reports(self, state, tmp_path):
        tts = MagicMock()
        tts.generate.return_value = None
        updates = self._run(state, tts, tmp_path)
        assert "❌" in updates[-1][1]
        assert len(state.history) == 0

    def test_cancelled_reports(self, state, tmp_path):
        def fake_generate(text, out_path, cancellation_token=None, **kw):
            cancellation_token.cancel()
            return None

        tts = MagicMock()
        tts.generate.side_effect = fake_generate
        updates = self._run(state, tts, tmp_path)
        assert "🚫" in updates[-1][1]

    def test_exception_reports(self, state, tmp_path):
        tts = MagicMock()
        tts.generate.side_effect = RuntimeError("kaboom")
        updates = self._run(state, tts, tmp_path)
        assert "kaboom" in updates[-1][1]


class TestParameters:
    def test_fallback_chain(self, state):
        mid = first_model_id(state)
        params = cb.load_parameters(state, "v", mid)
        assert params["max_iterations"] == 10  # model default
        cb.save_parameters(state, "v", mid, {"max_iterations": 3})
        assert cb.load_parameters(state, "v", mid)["max_iterations"] == 3

    def test_save_only_differences(self, state):
        mid = first_model_id(state)
        cb.save_parameters(state, "v", mid, {"max_iterations": 10})  # equals default
        assert state.config.get_parameter_override("v", mid) == {}

    def test_reset(self, state):
        mid = first_model_id(state)
        cb.save_parameters(state, "v", mid, {"max_iterations": 2})
        params = cb.reset_parameters(state, "v", mid)
        assert params["max_iterations"] == 10


class TestPhonetics:
    def test_roundtrip(self, state):
        cb.save_phonetic_rows(state, "v", "m", [["exocrine", "exo-crene"], ["", ""]])
        assert cb.load_phonetic_rows(state, "v", "m") == [["exocrine", "exo-crene"]]

    def test_empty_rows_clears(self, state):
        cb.save_phonetic_rows(state, "v", "m", [["a", "b"]])
        cb.save_phonetic_rows(state, "v", "m", [])
        assert cb.load_phonetic_rows(state, "v", "m") == []


class TestVoiceCrud:
    def test_add_named_voice(self, state):
        voice, msg = cb.add_voice(state, "My Voice", "qwen", speaker="Ryan")
        assert voice is not None and "✅" in msg
        assert state.config.get_voice(voice.id).speaker == "Ryan"

    def test_duplicate_name_rejected(self, state):
        cb.add_voice(state, "Dup", "qwen", speaker="Ryan")
        voice, msg = cb.add_voice(state, "Dup", "qwen", speaker="Aria")
        assert voice is None and "already exists" in msg

    def test_qwen_cloning_requires_transcript(self, state, tmp_path):
        ref = tmp_path / "r.wav"
        ref.write_bytes(b"x")
        voice, msg = cb.add_voice(state, "NoText", "qwen", reference_audio=str(ref))
        assert voice is None and "transcript" in msg.lower()

    def test_delete_cascades(self, state, tmp_path, monkeypatch):
        from rho_tts_tpu.ui import config as cfgmod

        monkeypatch.setattr(cfgmod, "VOICES_DIR", str(tmp_path))
        ref = tmp_path / "r.wav"
        ref.write_bytes(b"x")
        voice, _ = cb.add_voice(
            state, "Del Me", "qwen", reference_audio=str(ref), reference_text="t"
        )
        mid = first_model_id(state)
        cb.save_phonetic_rows(state, voice.id, mid, [["a", "b"]])
        cb.save_parameters(state, voice.id, mid, {"max_iterations": 2})
        msg = cb.delete_voice(state, voice.id)
        assert "✅" in msg
        assert state.config.get_voice(voice.id) is None
        assert cb.load_phonetic_rows(state, voice.id, mid) == []
        assert state.config.get_parameter_override(voice.id, mid) == {}

    def test_builtin_not_deletable(self, state):
        vid = next(v.id for v in state.config.voices if v.is_builtin)
        assert "❌" in cb.delete_voice(state, vid)


class TestVoiceFiltering:
    def test_base_model_hides_builtin_speakers(self, state):
        mid = first_model_id(state, needs_reference=True)
        choices = cb.voice_choices_for_model(state, mid)
        assert choices == []  # no cloning voices yet
        cb.add_voice(state, "Cloner", "qwen", reference_audio=__file__, reference_text="t")
        choices = cb.voice_choices_for_model(state, mid)
        assert len(choices) == 1

    def test_custom_voice_model_hides_cloning_voices(self, state):
        cb.add_voice(state, "Cloner", "qwen", reference_audio=__file__, reference_text="t")
        mid = first_model_id(state, needs_reference=False)
        labels = [l for l, _ in cb.voice_choices_for_model(state, mid)]
        assert "Cloner" not in labels
        assert "Vivian" in labels


class TestModelCrud:
    def test_add_and_delete(self, state):
        model, msg = cb.add_model(state, "My Model", "qwen", "Org/Model-Path")
        assert model is not None
        assert "✅" in cb.delete_model(state, model.id)

    def test_duplicate_path_rejected(self, state):
        cb.add_model(state, "A", "qwen", "Org/Same")
        model, msg = cb.add_model(state, "B", "qwen", "Org/Same")
        assert model is None and "already registered" in msg


class TestLibrary:
    def test_rows_filter_and_delete(self, state, tmp_path):
        from rho_tts_tpu.ui.config import GenerationRecord

        wav = tmp_path / "x.wav"
        wav.write_bytes(b"RIFF")
        rec = GenerationRecord.new(
            text="find this needle", voice_id="v", model_id="m",
            output_path=str(wav), duration_sec=1.0,
        )
        state.add_record(rec)
        state.add_record(
            GenerationRecord.new(text="other", voice_id="v", model_id="m", output_path=None)
        )
        rows = cb.library_rows(state, search="needle")
        assert len(rows) == 1
        assert rows[0][0] == rec.id
        msg = cb.delete_record(state, rec.id)
        assert "✅" in msg
        assert not wav.exists()

    def test_replay_missing_file(self, state):
        from rho_tts_tpu.ui.config import GenerationRecord

        rec = GenerationRecord.new(
            text="gone", voice_id="v", model_id="m", output_path="/nope/missing.wav"
        )
        state.add_record(rec)
        path, msg = cb.replay_record(state, rec.id)
        assert path is None and "❌" in msg


class TestTraining:
    def test_missing_dataset(self, state):
        out = list(cb.train_classifier(state, "/does/not/exist"))
        assert "❌" in out[-1]

    def test_streams_trainer_output(self, state, tmp_path):
        def fake_train(dataset_dir, voice_id=None, progress_callback=None):
            progress_callback("Extracting: 1/2")
            progress_callback("Training model...")
            return "/tmp/model.pkl"

        with patch(
            "rho_tts_tpu.validation.classifier.trainer.train", side_effect=fake_train
        ):
            out = list(cb.train_classifier(state, str(tmp_path)))
        assert any("Extracting" in o for o in out)
        assert "✅" in out[-1]


class TestEditVoice:
    def _add(self, state):
        v, msg = cb.add_voice(state, "Edit Me", "chatterbox", language="English")
        assert v is not None, msg
        return v

    def test_edit_voice_fields(self, state):
        v = self._add(state)
        msg = cb.edit_voice(state, v.id, "Edited", "Japanese", "new transcript")
        assert "✅" in msg
        v2 = state.config.get_voice(v.id)
        assert v2.name == "Edited"
        assert v2.language == "Japanese"
        assert v2.reference_text == "new transcript"

    def test_edit_voice_details_roundtrip(self, state):
        v = self._add(state)
        d = cb.voice_details(state, v.id)
        assert d["name"] == "Edit Me" and not d["is_builtin"]

    def test_edit_builtin_rejected(self, state):
        builtin = next(v for v in state.config.voices if v.is_builtin)
        msg = cb.edit_voice(state, builtin.id, "Nope")
        assert "❌" in msg

    def test_edit_name_clash_rejected(self, state):
        v1 = self._add(state)
        v2, _ = cb.add_voice(state, "Other", "chatterbox", language="English")
        msg = cb.edit_voice(state, v2.id, "Edit Me")
        assert "❌" in msg
        assert state.config.get_voice(v2.id).name == "Other"

    def test_edit_missing_voice(self, state):
        assert "❌" in cb.edit_voice(state, "voice-nope", "x")


class TestCatalogModels:
    def test_catalog_choices_per_provider(self):
        q = cb.catalog_choices("qwen")
        c = cb.catalog_choices("chatterbox")
        assert q and c and q != c
        assert all(isinstance(lbl, str) and isinstance(i, str) for lbl, i in q)

    def test_add_from_catalog_merges_overrides(self, state):
        provider, (label, entry_id) = "qwen", cb.catalog_choices("qwen")[0]
        # the default catalog entries are pre-registered; delete one first
        entry = cb.catalog_entry(provider, entry_id)
        state.config.models = [
            m for m in state.config.models if m.model_path != entry["model_path"]
        ]
        m, msg = cb.add_model_from_catalog(
            state, provider, entry_id, max_iterations=3, accent_drift_threshold=0.5
        )
        assert m is not None, msg
        assert m.default_params["max_iterations"] == 3
        assert m.default_params["accent_drift_threshold"] == 0.5
        # untouched defaults survive from the catalog
        assert "text_similarity_threshold" in m.default_params

    def test_add_unknown_entry(self, state):
        m, msg = cb.add_model_from_catalog(state, "qwen", "nope")
        assert m is None and "❌" in msg


class TestEditModel:
    def test_edit_model_params(self, state):
        mid = first_model_id(state)
        msg = cb.edit_model(state, mid, "Renamed", 7, 0.33, 0.66)
        assert "✅" in msg
        m = state.config.get_model(mid)
        assert m.label == "Renamed"
        assert m.default_params["max_iterations"] == 7
        assert m.default_params["accent_drift_threshold"] == 0.33
        assert m.default_params["text_similarity_threshold"] == 0.66

    def test_model_details_roundtrip(self, state):
        mid = first_model_id(state)
        cb.edit_model(state, mid, None, 5, None, None)
        d = cb.model_details(state, mid)
        assert d["max_iterations"] == 5

    def test_edit_missing_model(self, state):
        assert "❌" in cb.edit_model(state, "model-nope")


class TestModelServingConfig:
    """Per-model TPU serving knobs (quantization / DP-TP / draft model)."""

    def _state(self, tmp_path, monkeypatch):
        monkeypatch.setenv("RHO_TTS_TPU_CONFIG", str(tmp_path / "c.json"))
        monkeypatch.setenv("RHO_TTS_TPU_HISTORY", str(tmp_path / "h.json"))
        state = AppState(AppConfig(voices=[], models=[]))
        m, msg = cb.add_model(state, "Tiny", "qwen", "Qwen/Tiny-CustomVoice")
        assert m is not None
        return state, m

    def test_defaults_and_roundtrip(self, tmp_path, monkeypatch):
        state, m = self._state(tmp_path, monkeypatch)
        d = cb.model_serving_details(state, m.id)
        # Unset quantization reflects the provider's effective default
        # (quantization=None == bf16), not a fabricated "int8" — a
        # Load-then-Save must not silently quantize.
        assert d == {"quantization": "bf16", "parallelism": "none",
                     "draft_model_path": "", "speculative_gamma": 4,
                     "lora_path": "", "serving": False}
        msg = cb.set_model_serving(
            state, m.id, "int4", "tensor", "tiny-draft", 6, "/voices/aria-lora",
            serving=True,
        )
        assert msg.startswith("✅")
        d = cb.model_serving_details(state, m.id)
        assert d["quantization"] == "int4"
        assert d["parallelism"] == "tensor"
        assert d["draft_model_path"] == "tiny-draft"
        assert d["speculative_gamma"] == 6
        assert d["lora_path"] == "/voices/aria-lora"
        assert d["serving"] is True

    def test_rejects_bad_values(self, tmp_path, monkeypatch):
        state, m = self._state(tmp_path, monkeypatch)
        assert cb.set_model_serving(state, m.id, "fp8", "none").startswith("❌")
        assert cb.set_model_serving(state, m.id, "int8", "pipeline").startswith("❌")
        assert cb.set_model_serving(state, "nope", "int8", "none").startswith("❌")

    def test_missing_model_details(self, tmp_path, monkeypatch):
        state, _ = self._state(tmp_path, monkeypatch)
        assert cb.model_serving_details(state, "nope") is None
