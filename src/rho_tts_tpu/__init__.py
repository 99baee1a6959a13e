"""rho-tts-tpu: TPU-native multi-provider text-to-speech with voice cloning
and quality validation, built on JAX / XLA / Pallas.

Quick start (named speaker)::

    from rho_tts_tpu import TTSFactory

    tts = TTSFactory.get_tts_instance(provider="qwen", speaker="Vivian",
                                      model_path="...CustomVoice...")
    result = tts.generate("Hello world!", "output.wav")

In-memory generation::

    result = tts.generate("Hello world!")
    result.audio        # jax.Array (mono float32 waveform)
    result.sample_rate  # int

Voice cloning::

    tts = TTSFactory.get_tts_instance(
        provider="qwen",
        reference_audio="voice_sample.wav",
        reference_text="Transcript of voice sample.",
    )
    result = tts.generate("Hello world!", "output.wav")

Context manager::

    with TTSFactory.get_tts_instance(provider="qwen") as tts:
        result = tts.generate("Hello world!", "output.wav")
"""

__version__ = "0.5.0"

from .cancellation import CancellationToken, CancelledException
from .engine import BaseTTS
from .exceptions import (
    AudioGenerationError,
    FormatConversionError,
    ModelLoadError,
    ProviderNotFoundError,
    RhoTTSError,
)
from .factory import TTSFactory
from .provider_info import ProviderInfo, VoiceInfo
from .result import GenerationResult

__all__ = [
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


def launch_ui(**kwargs):
    """Launch the Gradio web UI. Requires the ``ui`` extra (gradio)."""
    from .ui import launch_ui as _launch_ui

    _launch_ui(**kwargs)


def train_drift_classifier(
    dataset_dir: str,
    voice_id: str | None = None,
    output_path: str | None = None,
    progress_callback=None,
):
    """Train a drift-detection classifier from a good/ + bad/ dataset dir.

    Args:
        dataset_dir: Directory containing 'good/' and 'bad/' subdirectories
            of .wav files.
        voice_id: Voice ID to associate with this model (per-voice store).
        output_path: Explicit path for the trained model.
        progress_callback: Optional callable receiving progress messages.
    """
    from .validation.classifier.trainer import train

    return train(
        dataset_dir=dataset_dir,
        voice_id=voice_id,
        output_path=output_path,
        progress_callback=progress_callback,
    )
