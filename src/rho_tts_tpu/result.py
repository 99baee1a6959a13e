"""GenerationResult returned by ``generate()`` / ``stream()``.

The audio payload is a JAX array (host-committed numpy-compatible); it is
device-resident during the pipeline and only transferred when the result is
materialized.

Capability parity: reference ``src/rho_tts/result.py:14-34``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class GenerationResult:
    """Result of a single TTS generation.

    Attributes:
        path: File path where audio was saved, or None if in-memory only.
        audio: Raw mono waveform (1-D float32 array; jax.Array or numpy).
        sample_rate: Sample rate in Hz.
        duration_sec: Audio duration in seconds.
        segments_count: Number of text segments generated and joined.
        format: Output audio format ("wav", "mp3", "flac", "ogg").
        drift_prob: Worst (max) accent-drift probability across segments.
        text_similarity: Worst (min) STT text similarity across segments.
        decay_ratio: RMS ratio of the last third to the first third of audio.
    """

    path: Optional[str] = None
    audio: Optional[object] = None  # jax.Array | np.ndarray
    sample_rate: int = 0
    duration_sec: float = 0.0
    segments_count: int = 0
    format: str = "wav"
    drift_prob: Optional[float] = None
    text_similarity: Optional[float] = None
    decay_ratio: Optional[float] = None

    def numpy(self) -> Optional[np.ndarray]:
        """Return the audio as a host numpy array (or None)."""
        if self.audio is None:
            return None
        return np.asarray(self.audio)
