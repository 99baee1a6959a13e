"""Voice cloning with the validation retry loop enabled.

Provide a clean 5-15s reference clip and its transcript. The engine
validates each generated segment (accent-drift classifier + Whisper text
match) and retries with fresh sampling noise until the clip passes or the
retry budget is exhausted.
"""

from rho_tts_tpu import TTSFactory

tts = TTSFactory.get_tts_instance(
    provider="chatterbox",
    reference_audio="voice_sample.wav",
    max_iterations=50,                  # single-segment regeneration specialist
    accent_drift_threshold=0.17,        # reject clips with P(drift) above this
    text_similarity_threshold=0.75,     # reject clips whose STT match is below this
)

result = tts.generate(
    "This sentence should sound like the reference speaker.",
    "cloned.wav",
)
if result:
    print(f"Saved: {result.path}")
    print(f"  drift probability: {result.drift_prob}")
    print(f"  text similarity:   {result.text_similarity}")
    print(f"  decay ratio:       {result.decay_ratio}")

# Qwen cloning needs the transcript of the reference audio too:
qwen = TTSFactory.get_tts_instance(
    provider="qwen",
    model_path="Qwen/Qwen3-TTS-12Hz-1.7B-Base",
    reference_audio="voice_sample.wav",
    reference_text="Transcript of what the reference clip says.",
)
qwen.generate("Cloned with the Qwen model.", "cloned_qwen.wav")
qwen.close()
tts.close()
