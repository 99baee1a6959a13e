"""JAX speaker encoder (GE2E-class) for similarity validation and
drift-classifier features.

Replaces the torch ``resemblyzer`` dependency of the reference
(``src/rho_tts/base_tts.py:128-140,325-346``, ``trainer.py:44-47``):
a 3-layer LSTM over 40 log-mel frames → 256-d L2-normalized utterance
embedding. The LSTM runs as a ``lax.scan`` with fused gate matmuls; mel
extraction is the shared XLA spectral pipeline.
"""

from .encoder import SpeakerEncoder, load_pretrained
