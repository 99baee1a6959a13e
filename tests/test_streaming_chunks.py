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


class TestChatterboxStream:
    """Chatterbox stream_chunks vs one-shot generate.

    Same sliding-window design as Qwen, plus the watermark: the
    position-indexed PN (``ops.watermark``) means the streamed
    concatenation carries the SAME embedded watermark as the one-shot
    path, not a per-piece restart.
    """

    @pytest.fixture(scope="class")
    def cmodel(self):
        from rho_tts_tpu.models.chatterbox import ChatterboxModel, PRESETS

        return ChatterboxModel(PRESETS["tiny"], seed=0)

    def test_stream_matches_generate(self, cmodel):
        kw = dict(min_new_tokens=192, max_new_tokens=256, temperature=0.9)
        full = np.asarray(
            cmodel.generate(
                "chatterbox streaming parity test", rng=jax.random.PRNGKey(11), **kw
            )
        )
        pieces = [
            np.asarray(p)
            for p, _sr in cmodel.stream_chunks(
                "chatterbox streaming parity test",
                rng=jax.random.PRNGKey(11), context_frames=16, **kw
            )
        ]
        assert len(pieces) >= 2  # incremental: audio appeared before the end
        streamed = np.concatenate(pieces)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-2)
        # Interior samples (incl. the watermark chips) match to float
        # precision — the PN is position-indexed, not restarted per piece:
        close = np.isclose(streamed, full, atol=1e-4).mean()
        assert close > 0.99

    def test_stream_eos_stops(self, cmodel):
        pieces = list(
            cmodel.stream_chunks(
                "short", min_new_tokens=0, max_new_tokens=256,
                rng=jax.random.PRNGKey(3),
            )
        )
        total = sum(p.shape[0] for p, _ in pieces)
        assert total >= cmodel.cfg.codec.hop

    def test_provider_stream_hook(self):
        from rho_tts_tpu.providers.chatterbox import ChatterboxTTS

        tts = ChatterboxTTS(
            device="cpu", implementation="tiny", max_iterations=1,
            max_chars_per_segment=200, min_audio_sec=0.5,
        )
        gen = tts._stream_audio_chunks("provider chunk streaming")
        assert gen is not None
        pieces = [np.asarray(p) for p in gen]
        assert sum(p.shape[0] for p in pieces) > 0
