"""Public API surface tests."""

import rho_tts_tpu


EXPECTED_EXPORTS = [
    "BaseTTS",
    "CancellationToken",
    "CancelledException",
    "TTSFactory",
    "GenerationResult",
    "ProviderInfo",
    "VoiceInfo",
    "RhoTTSError",
    "ProviderNotFoundError",
    "ModelLoadError",
    "AudioGenerationError",
    "FormatConversionError",
    "__version__",
    "launch_ui",
    "train_drift_classifier",
]


def test_all_exports_present():
    for name in EXPECTED_EXPORTS:
        assert hasattr(rho_tts_tpu, name), f"missing export: {name}"
    assert set(rho_tts_tpu.__all__) == set(EXPECTED_EXPORTS)


def test_version_format():
    parts = rho_tts_tpu.__version__.split(".")
    assert len(parts) == 3
    assert all(p.isdigit() for p in parts)


def test_lazy_ui_wrapper_importable_without_gradio():
    # launch_ui exists and raises only when actually invoked without gradio
    assert callable(rho_tts_tpu.launch_ui)


def test_train_wrapper_callable():
    assert callable(rho_tts_tpu.train_drift_classifier)


def test_submodules_import_clean():
    import importlib

    for mod in [
        "rho_tts_tpu.engine",
        "rho_tts_tpu.factory",
        "rho_tts_tpu.audio_io",
        "rho_tts_tpu.textproc",
        "rho_tts_tpu.ops.dsp",
        "rho_tts_tpu.ops.resample",
        "rho_tts_tpu.ops.pitch",
        "rho_tts_tpu.ops.features",
        "rho_tts_tpu.ops.watermark",
        "rho_tts_tpu.ops.pallas.attention",
        "rho_tts_tpu.models.transformer",
        "rho_tts_tpu.models.quantization",
        "rho_tts_tpu.models.qwen",
        "rho_tts_tpu.models.chatterbox",
        "rho_tts_tpu.models.whisper",
        "rho_tts_tpu.models.speaker",
        "rho_tts_tpu.parallel",
        "rho_tts_tpu.validation.classifier",
        "rho_tts_tpu.validation.stt.stt_validator",
        "rho_tts_tpu.isolation",
        "rho_tts_tpu.ui.config",
        "rho_tts_tpu.ui.state",
        "rho_tts_tpu.ui.session",
        "rho_tts_tpu.ui.callbacks",
        "rho_tts_tpu.utils.profiling",
        "rho_tts_tpu.utils.tokenizer",
    ]:
        importlib.import_module(mod)
