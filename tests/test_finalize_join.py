"""Fused multi-segment finalize vs the sequential reference chain.

``dsp.finalize_segments`` must reproduce ``smooth_segment_join`` (+
optional ``loudness_postprocess``) followed by ``sound_decay_ratio``
exactly — the fused program exists only to collapse the per-segment host
round-trips into one dispatch.
"""

import numpy as np
import pytest

from rho_tts_tpu.ops import dsp

SR = 24000


def _speechy(seconds, f0=220.0, seed=0, lead_silence=0.0, tail_silence=0.0):
    rng = np.random.default_rng(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    sig = 0.3 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))
    sig += 0.005 * rng.standard_normal(n)
    lead = np.zeros(int(SR * lead_silence), np.float32)
    tail = np.zeros(int(SR * tail_silence), np.float32)
    return np.concatenate([lead, sig.astype(np.float32), tail])


def _reference_chain(segments, loudness=False, **kw):
    joined = dsp.smooth_segment_join(segments, SR, **kw)
    if joined is None:
        return None, 1.0
    if loudness:
        joined = dsp.loudness_postprocess(joined, SR)
    return joined, dsp.sound_decay_ratio(joined)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_join_matches_sequential(k):
    segs = [
        _speechy(0.6 + 0.2 * i, f0=180 + 40 * i, seed=i,
                 lead_silence=0.08, tail_silence=0.1)
        for i in range(k)
    ]
    ref, ref_ratio = _reference_chain(segs)
    out, ratio = dsp.finalize_segments(segs, SR)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    assert ratio == pytest.approx(ref_ratio, abs=1e-4)


def test_join_with_loudness_matches_sequential():
    segs = [
        _speechy(0.7, f0=200, seed=1, tail_silence=0.05),
        _speechy(0.5, f0=260, seed=2, lead_silence=0.06),
        _speechy(0.9, f0=150, seed=3, lead_silence=0.04, tail_silence=0.08),
    ]
    ref, ref_ratio = _reference_chain(segs, loudness=True)
    out, ratio = dsp.finalize_segments(segs, SR, loudness=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    assert ratio == pytest.approx(ref_ratio, abs=1e-4)


def test_join_short_segment_skips_crossfade():
    """A segment shorter than 10 samples of overlap takes the no-crossfade
    branch (parity with the overlap<=10 rule)."""
    segs = [_speechy(0.6, seed=4), np.full(8, 0.2, np.float32), _speechy(0.5, seed=5)]
    ref, _ = _reference_chain(segs, trim=False)
    out, _ = dsp.finalize_segments(segs, SR, trim=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_join_segment_shorter_than_crossfade():
    """Overlap clamps to the shorter segment (11..crossfade samples)."""
    short = _speechy(0.02, seed=6)  # 480 samples < 1200 crossfade
    segs = [_speechy(0.5, seed=7), short, _speechy(0.4, seed=8)]
    ref, _ = _reference_chain(segs, trim=False)
    out, _ = dsp.finalize_segments(segs, SR, trim=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_join_no_trim_no_pause():
    segs = [_speechy(0.4, seed=9), _speechy(0.4, seed=10)]
    ref, _ = _reference_chain(segs, trim=False, inter_sentence_pause_sec=0.0)
    out, _ = dsp.finalize_segments(
        segs, SR, trim=False, inter_sentence_pause_sec=0.0
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_join_single_segment_delegates():
    seg = _speechy(0.8, seed=11, lead_silence=0.1, tail_silence=0.1)
    ref, ref_ratio = dsp.finalize_segment(seg, SR)
    out, ratio = dsp.finalize_segments([seg], SR)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)
    assert ratio == ref_ratio


def test_join_empty():
    out, ratio = dsp.finalize_segments([], SR)
    assert out is None and ratio == 1.0


def test_join_all_silent_segments():
    segs = [np.zeros(SR // 2, np.float32), np.zeros(SR // 3, np.float32)]
    ref, ref_ratio = _reference_chain(segs)
    out, ratio = dsp.finalize_segments(segs, SR)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    assert ratio == pytest.approx(ref_ratio, abs=1e-4)
