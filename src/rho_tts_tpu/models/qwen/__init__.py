"""Qwen3-TTS-class codec-LM model family (JAX/TPU-native).

An autoregressive transformer predicts acoustic codec tokens at 12.5 Hz
which a neural codec decoder (RVQ dequantize + transposed-conv vocoder)
turns into a 24 kHz waveform. Voice cloning conditions on the reference
transcript plus codec tokens of the reference audio; CustomVoice variants
condition on a learned speaker embedding.

Capability parity target: the ``qwen_tts`` models used by reference
``src/rho_tts/providers/qwen.py`` (generate_voice_clone /
generate_custom_voice), rebuilt TPU-first.
"""

from .config import QwenTTSConfig, PRESETS
from .model import QwenTTSModel
