"""TPU-native audio DSP and feature-extraction ops (JAX/XLA/Pallas)."""

from . import dsp  # noqa: F401
