"""JAX model families: codec-LM TTS (qwen/chatterbox), Whisper STT, speaker encoder."""
