"""Built-in TTS providers (JAX model backends behind the BaseTTS engine)."""
