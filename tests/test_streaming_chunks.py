"""Incremental (chunked) synthesis: stream_chunks vs full synthesize.

The vocoder is fully local, so sliding-window vocoding with enough
context must reproduce the full-utterance waveform for every emitted
sample; with the same rng the token stream is identical, so the
concatenated stream must equal the one-shot synthesis.
"""

import jax
import numpy as np
import pytest

from rho_tts_tpu.models.qwen import QwenTTSModel


@pytest.fixture(scope="module")
def model():
    return QwenTTSModel.from_pretrained("tiny", seed=0)


def test_stream_matches_full_synthesis(model):
    kw = dict(speaker="Vivian", min_frames=96, max_frames=128)
    full, sr = model.synthesize(
        ["streaming chunked synthesis parity test"], rng=jax.random.PRNGKey(5), **kw
    )
    full = np.asarray(full[0])

    pieces = [
        np.asarray(p)
        for p, _sr in model.stream_chunks(
            "streaming chunked synthesis parity test",
            rng=jax.random.PRNGKey(5), context_frames=16, **kw
        )
    ]
    assert len(pieces) >= 2  # incremental: audio appeared before the end
    streamed = np.concatenate(pieces)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-2)
    # Most samples must match to float precision (conv locality):
    close = np.isclose(streamed, full, atol=1e-4).mean()
    assert close > 0.99


def test_stream_first_piece_is_early(model):
    gen = model.stream_chunks(
        "first audio latency", speaker="Ryan", min_frames=80, max_frames=128,
        rng=jax.random.PRNGKey(0), context_frames=16,
    )
    piece, sr = next(gen)
    assert piece.shape[0] > 0
    assert sr == model.sample_rate
    from rho_tts_tpu.models.qwen.model import CHUNK

    # One decode chunk minus the context, at most
    assert piece.shape[0] <= CHUNK * model.config.codec.hop
    gen.close()


def test_stream_eos_stops(model):
    # min_frames=0 → random weights EOS quickly; stream must terminate
    pieces = list(
        model.stream_chunks(
            "short", speaker="Aria", min_frames=0, max_frames=128,
            rng=jax.random.PRNGKey(3),
        )
    )
    total = sum(p.shape[0] for p, _ in pieces)
    assert total >= model.config.codec.hop  # at least one frame of audio
