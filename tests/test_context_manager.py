"""Context-manager and close() semantics on BaseTTS.

Parity: reference ``tests/test_context_manager.py`` — __enter__ returns
self, __exit__ calls close() and never suppresses exceptions, and the base
close() is a safe no-op.
"""

import numpy as np
import pytest

from rho_tts_tpu import BaseTTS

SR = 8000


class ClosableTTS(BaseTTS):
    def __init__(self):
        super().__init__(device="cpu")
        self.closed = False

    def close(self):
        self.closed = True

    def _generate_audio(self, text, **kwargs):
        t = np.arange(SR // 2) / SR
        return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    @property
    def sample_rate(self):
        return SR


def test_enter_returns_self():
    tts = ClosableTTS()
    assert tts.__enter__() is tts


def test_exit_calls_close():
    tts = ClosableTTS()
    tts.__exit__(None, None, None)
    assert tts.closed


def test_with_statement():
    with ClosableTTS() as tts:
        assert isinstance(tts, ClosableTTS)
        assert not tts.closed
    assert tts.closed


def test_close_called_on_exception():
    tts = ClosableTTS()
    with pytest.raises(ValueError):
        with tts:
            raise ValueError("boom")
    assert tts.closed


def test_exit_does_not_suppress():
    tts = ClosableTTS()
    assert tts.__exit__(ValueError, ValueError("x"), None) is False


def test_base_close_is_noop():
    tts = ClosableTTS()
    BaseTTS.close(tts)  # must not raise
    assert not tts.closed  # base close doesn't flip the subclass flag


def test_generate_then_close():
    """Normal usage: generate inside the with block, resources released after."""
    with ClosableTTS() as tts:
        result = tts.generate("Hello there")
        assert result.audio is not None
    assert tts.closed
