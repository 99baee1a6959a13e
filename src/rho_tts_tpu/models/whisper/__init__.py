"""JAX Whisper (tiny-class) encoder-decoder for STT validation.

Replaces the CPU CTranslate2 ``faster-whisper`` of the reference
(``validation/stt/stt_validator.py:42-113``) with an on-device XLA
implementation: batched log-mel frontend, conv+transformer encoder, and a
greedy ``lax.scan`` decoder with KV caching, so text-match validation can
run on TPU alongside generation.
"""

from .model import WhisperConfig, WhisperModel, WhisperTranscriber
