"""Export-once, serve-many: native checkpoints + speculative serving.

Production flow for TPU serving (the reference converts HF checkpoints
through torch ``from_pretrained`` on every process start —
``src/rho_tts/providers/qwen.py:143-197``; here the conversion is priced
once, offline):

1. **Export** (offline, CPU is fine): convert an HF-layout checkpoint —
   or a trained/random-init model — into a native serving checkpoint.
   Quantization folds into the export, so a serving load moves the int8
   bytes and skips the quantize pass::

       python -m rho_tts_tpu.models.qwen.export \
           /path/to/hf_checkpoint /srv/ckpt/qwen-1.7b-int8 \
           --quantization int8

2. **Serve**: point the provider at the exported directory. The manifest
   carries the preset, quantization, and CustomVoice/Base variant, and
   the whole tree lands on device in one pipelined transfer
   (BASELINE.md 5c: 1.7B int8 device-ready in ~77 s even on a dev host
   with a slow host↔device link; ~disk-read time on normal PCIe).

3. Optionally attach a **distilled draft** for single-stream latency
   (BASELINE.md 5s: 1.44× measured with a distilled draft).

This example uses the "tiny" preset so it runs anywhere (CPU included).
"""

import os
import tempfile

import jax

if not os.environ.get("RHO_TTS_TPU_EXAMPLE_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

from rho_tts_tpu.models.qwen import QwenTTSModel
from rho_tts_tpu.providers.qwen import QwenTTS

workdir = tempfile.mkdtemp(prefix="rho_tts_export_")
ckpt_dir = os.path.join(workdir, "qwen-tiny-int8")

# --- 1. Export (here from random init; pass an HF dir for real weights) ---
model = QwenTTSModel.from_pretrained("tiny-CustomVoice", quantization="int8")
model.save_checkpoint(ckpt_dir)
print(f"exported pre-quantized serving checkpoint → {ckpt_dir}")

# --- 2. Serve from the export ---------------------------------------------
tts = QwenTTS(
    model_path=ckpt_dir,          # manifest restores preset/quant/variant
    speaker="Vivian",             # CustomVoice routing survives the export
    max_iterations=1,
    min_audio_sec=0.5,
)
tts.trim_silence = False          # random weights sit under the trim gate
result = tts.generate("Serving from a native checkpoint.",
                      os.path.join(workdir, "out.wav"))
print(f"generated {result.duration_sec:.2f}s → {result.path}")

# --- 3. Single-stream latency: speculative decoding with a draft -----------
# For a real deployment, distill the draft first (models/qwen/distill.py,
# BENCH_MODE=spec_distill measures the realized speedup); any exported
# draft checkpoint path works here.
fast = QwenTTS(
    model_path=ckpt_dir,
    draft_model_path="tiny-CustomVoice",
    speculative_gamma=4,
    speaker="Vivian",
    max_iterations=1,
    min_audio_sec=0.5,
)
fast.trim_silence = False
result = fast.generate("Speculative single-stream serving.")
print(f"speculative path produced {result.duration_sec:.2f}s of audio")
