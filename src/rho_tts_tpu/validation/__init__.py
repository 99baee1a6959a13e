"""Quality-validation stack: drift classifier, STT text match, similarity.

Architectural stance vs the reference: validators accept in-memory
(waveform, sample_rate) pairs so the retry loop never round-trips through
temp WAV files on disk (reference ``base_tts.py:821-827``); file paths are
still accepted everywhere for API compatibility.
"""
