"""Chunked streaming through the engine pipeline.

The reference's ``stream()`` yields whole segments
(``src/rho_tts/base_tts.py:1132-1190``); this stack additionally streams
sub-segment chunks when the provider implements ``_stream_audio_chunks``
(wired to the codec-LM's ``stream_chunks`` for Qwen). These tests drive the
engine path with a fake chunk-capable provider.
"""

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS, CancellationToken
from rho_tts_tpu.ops import dsp

SR = 8000


def make_sine(duration_sec=0.5, freq=440.0, sr=SR, amp=0.5):
    t = np.arange(int(duration_sec * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class ChunkedFakeTTS(BaseTTS):
    """Provider that streams each segment as N fixed chunks."""

    def __init__(self, n_chunks=4, chunk_sec=0.25, supports_chunks=True, **kwargs):
        super().__init__(device="cpu", **kwargs)
        self.max_chars_per_segment = 100
        self._max_chars_explicit = True
        self.n_chunks = n_chunks
        self.chunk_sec = chunk_sec
        self.supports_chunks = supports_chunks
        self.chunk_calls = 0
        self.generate_calls = 0

    def _full_wave(self):
        return make_sine(self.n_chunks * self.chunk_sec)

    def _generate_audio(self, text, **kwargs):
        self.generate_calls += 1
        return self._full_wave()

    def _stream_audio_chunks(self, text, cancellation_token=None):
        if not self.supports_chunks:
            return None
        self.chunk_calls += 1
        full = self._full_wave()
        n = int(self.chunk_sec * SR)

        def gen():
            for i in range(self.n_chunks):
                yield full[i * n : (i + 1) * n]

        return gen()

    @property
    def sample_rate(self):
        return SR


def test_chunked_stream_yields_multiple_chunks_per_segment():
    tts = ChunkedFakeTTS()
    results = list(tts.stream("Just one segment"))
    assert len(results) == tts.n_chunks
    assert tts.chunk_calls == 1
    assert tts.generate_calls == 0
    for r in results:
        assert r.sample_rate == SR
        assert r.duration_sec > 0


def test_chunked_stream_concat_matches_segment_dsp():
    """Chunks concatenated == whole segment with end trims + fades."""
    tts = ChunkedFakeTTS()
    chunks = [r.numpy() for r in tts.stream("Just one segment")]
    got = np.concatenate(chunks)

    full = tts._full_wave()
    ref = tts._trim_silence(full, from_start=True, from_end=False)
    ref = tts._apply_fades(ref, fade_in=True, fade_out=False)
    n_first = int(tts.chunk_sec * SR) - (full.shape[0] - np.asarray(ref).shape[0])
    # middle chunks untouched; last chunk end-trimmed + faded out
    last = full[-int(tts.chunk_sec * SR):]
    last_t = tts._trim_silence(last, from_start=False, from_end=True)
    last_t = tts._apply_fades(last_t, fade_in=False, fade_out=True)
    expect_len = n_first + (tts.n_chunks - 2) * int(tts.chunk_sec * SR) + np.asarray(last_t).shape[0]
    assert got.shape[0] == expect_len
    # interior chunk passes through untouched
    np.testing.assert_allclose(
        chunks[1], full[int(tts.chunk_sec * SR) : 2 * int(tts.chunk_sec * SR)], atol=1e-6
    )


def test_chunked_stream_multi_segment():
    tts = ChunkedFakeTTS(n_chunks=3)
    results = list(tts.stream("One. Two. Three"))
    # 3 segments × 3 chunks each
    assert len(results) == 9
    assert tts.chunk_calls == 3


def test_chunked_stream_fallback_when_unsupported():
    tts = ChunkedFakeTTS(supports_chunks=False)
    results = list(tts.stream("One. Two. Three"))
    assert len(results) == 3
    assert tts.generate_calls == 3


def test_chunked_false_forces_per_segment_yields():
    """chunked=False (the isolation worker's contract: one SEGMENT_RESULT
    per text segment) must bypass chunk mode even for chunk-capable
    providers."""
    tts = ChunkedFakeTTS()
    results = list(tts.stream("Just one segment", chunked=False))
    assert len(results) == 1
    assert tts.chunk_calls == 0
    assert tts.generate_calls == 1


def test_mid_stream_chunk_failure_skips_tail_and_continues():
    """A chunk iterator failing mid-segment must NOT emit its held-back
    lookahead chunk as a trimmed/faded 'final' chunk, and the stream must
    continue with the next segment (same skip semantics as the
    non-chunked path)."""

    class FailingChunkedTTS(ChunkedFakeTTS):
        def _stream_audio_chunks(self, text, cancellation_token=None):
            self.chunk_calls += 1
            full = self._full_wave()
            n = int(self.chunk_sec * SR)
            fail_this = self.chunk_calls == 1

            def gen():
                yield full[:n]
                yield full[n : 2 * n]
                if fail_this:
                    raise RuntimeError("device lost mid-decode")
                for i in range(2, self.n_chunks):
                    yield full[i * n : (i + 1) * n]

            return gen()

    tts = FailingChunkedTTS(n_chunks=4)
    results = list(tts.stream("First sentence here. Second sentence here."))
    # Segment 1: 2 chunks yielded, then failure — only the FIRST chunk was
    # emitted (the second was the held-back lookahead, dropped). Segment 2
    # streams fully: n_chunks yields.
    assert len(results) == 1 + tts.n_chunks
    assert tts.chunk_calls == 2


def test_chunked_stream_bypassed_for_speed_pitch():
    tts = ChunkedFakeTTS()
    results = list(tts.stream("Just one segment", speed=2.0))
    assert tts.chunk_calls == 0
    assert tts.generate_calls == 1
    assert len(results) == 1


def test_chunked_stream_cancellation_stops_mid_segment():
    tts = ChunkedFakeTTS(n_chunks=10)
    token = CancellationToken()
    gen = tts.stream("Just one segment", cancellation_token=token)
    first = next(gen)
    assert first is not None
    token.cancel()
    rest = list(gen)
    # at most the already-buffered lookahead chunk appears
    assert len(rest) <= 1


def test_chunked_stream_postprocessor_applied():
    class LoudChunkedTTS(ChunkedFakeTTS):
        def _make_chunk_postprocessor(self):
            return dsp.StreamingLoudness().process

    tts = LoudChunkedTTS(n_chunks=3)
    # quiet input gets gained toward -23 dBFS by the causal normalizer
    tts._full_wave_orig = tts._full_wave
    tts._full_wave = lambda: 0.004 * tts._full_wave_orig()
    results = list(tts.stream("Just one segment"))
    mid = results[1].numpy()
    rms = float(np.sqrt(np.mean(mid**2)))
    assert rms > 0.004  # gained up (max +18 dB ≈ ×7.9)


def test_chunked_stream_error_falls_through_gracefully():
    class FailingChunkTTS(ChunkedFakeTTS):
        def _stream_audio_chunks(self, text, cancellation_token=None):
            def gen():
                yield self._full_wave()[:100]
                raise RuntimeError("decode died")

            return gen()

    tts = FailingChunkTTS()
    results = list(tts.stream("Just one segment"))
    # Failure before any chunk cleared the lookahead buffer: nothing is
    # emitted (the held-back chunk must not masquerade as a clean final
    # chunk), matching the non-chunked path where a failed segment yields
    # nothing — and the stream itself does not raise.
    assert results == []
