"""Continuous-batching TTS serving: many concurrent requests, one chip.

The reference serves one ``generate()`` call at a time (its only batching
is a caller-assembled list — ``src/rho_tts/providers/qwen.py:247-258``).
``rho_tts_tpu.serving.ServingEngine`` instead keeps a fixed decode batch
("slots") over a ring-buffer KV cache; requests join and leave at
decode-chunk boundaries, so the batch stays full under ragged lengths:

* submit from any thread → ``ServeRequest`` future (``result()`` blocks)
* ``stream=True`` → ``req.chunks()`` yields audio pieces as decode
  chunks finish: first audio after ~one chunk, even while the request
  shares the batch with much longer utterances
* greedy sampling (``top_k=1``) is schedule-invariant: tokens match a
  one-shot ``generate_codes`` regardless of slot or batch-mates

Measured on one TPU v5e chip (1.7B int8, 8 slots, 24 ragged requests):
84.7x aggregate real-time, 1.55x over static batch-5 on the same useful
audio (BASELINE.md 5v; ``BENCH_MODE=serve python bench.py``).

This example uses the "tiny" preset so it runs anywhere (CPU included;
random weights → placeholder audio, real compute path).
"""

import jax

jax.config.update("jax_platforms", "cpu")  # demo on CPU; drop on TPU hosts

from rho_tts_tpu.models.qwen.model import QwenTTSModel  # noqa: E402
from rho_tts_tpu.serving import ServingEngine  # noqa: E402


def main():
    model = QwenTTSModel.from_pretrained("tiny")
    engine = ServingEngine(model, n_slots=4, max_prompt=128, max_frames=256)
    engine.start()  # background scheduler thread
    try:
        # A batch of plain requests…
        requests = [
            engine.submit(f"Concurrent request number {i}.", min_frames=32)
            for i in range(6)
        ]
        # …plus one streaming request sharing the same slots.
        live = engine.submit(
            "Streaming request: audio arrives chunk by chunk.",
            min_frames=96, stream=True,
        )

        first = True
        for piece, sr in live.chunks(timeout=300):
            tag = "first audio" if first else "piece"
            print(f"  live stream: {tag} — {piece.shape[0]} samples @ {sr} Hz")
            first = False

        for i, req in enumerate(requests):
            wav, sr = req.result(timeout=300)
            print(f"  request {i}: {wav.shape[0]} samples @ {sr} Hz "
                  f"({req.n_frames} frames, latency {req.t_done - req.t_submit:.2f}s)")
    finally:
        engine.stop()

    stats = engine.stats()
    print(f"served {stats['requests_done']} requests, "
          f"aggregate RTF {stats['aggregate_rtf']:.2f}")


if __name__ == "__main__":
    main()
