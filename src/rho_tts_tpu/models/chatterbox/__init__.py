"""Chatterbox-class TTS model family (JAX/TPU-native).

A Llama-architecture AR transformer generates 25 Hz speech tokens with
classifier-free guidance (voice conditioning from the shared speaker
encoder), decoded to 24 kHz audio by a conv vocoder, with an inaudible
spread-spectrum watermark applied on device.

Capability parity target: the ``chatterbox-tts`` + ``perth`` dependencies
of reference ``src/rho_tts/providers/chatterbox.py``, rebuilt TPU-first.
"""

from .model import ChatterboxModel, ChatterboxConfig, PRESETS
