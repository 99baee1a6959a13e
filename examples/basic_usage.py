"""Basic usage: named speaker, in-memory generation, and batch mode.

Run on a TPU host; pass a local checkpoint directory as model_path to use
real weights (otherwise the model runs with random init — fine for
smoke-testing the pipeline).
"""

from rho_tts_tpu import TTSFactory

# Named speaker with a CustomVoice model
tts = TTSFactory.get_tts_instance(
    provider="qwen",
    model_path="Qwen/Qwen3-TTS-12Hz-1.7B-CustomVoice",
    speaker="Vivian",
)

# 1) Save straight to disk
result = tts.generate("Hello! This is the default voice speaking.", "output.wav")
if result:
    print(f"Saved {result.duration_sec:.1f}s of audio to {result.path}")

# 2) In-memory only — the waveform stays a device array until you use it
result = tts.generate("No file is written for this one.")
if result:
    print(f"In-memory audio: {result.numpy().shape} at {result.sample_rate} Hz")

# 3) Batch mode: one call, several texts, numbered output files
results = tts.generate(
    ["First item of the batch.", "Second item of the batch."],
    "batch_output",
)
for i, r in enumerate(results or []):
    print(f"item {i}: {r.path if r else 'failed'}")

tts.close()
