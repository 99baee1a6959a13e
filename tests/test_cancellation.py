"""CancellationToken unit tests (incl. multi-thread race)."""

import threading

import pytest

from rho_tts_tpu import CancellationToken, CancelledException, RhoTTSError


def test_initial_state():
    token = CancellationToken()
    assert not token.is_cancelled()


def test_cancel_sets_state():
    token = CancellationToken()
    token.cancel()
    assert token.is_cancelled()


def test_cancel_idempotent():
    token = CancellationToken()
    token.cancel()
    token.cancel()
    assert token.is_cancelled()


def test_raise_if_cancelled_noop_when_not_cancelled():
    CancellationToken().raise_if_cancelled()


def test_raise_if_cancelled_raises():
    token = CancellationToken()
    token.cancel()
    with pytest.raises(CancelledException):
        token.raise_if_cancelled()


def test_raise_if_cancelled_custom_message():
    token = CancellationToken()
    token.cancel()
    with pytest.raises(CancelledException, match="custom reason"):
        token.raise_if_cancelled("custom reason")


def test_cancelled_exception_is_rho_error():
    assert issubclass(CancelledException, RhoTTSError)


def test_reset():
    token = CancellationToken()
    token.cancel()
    token.reset()
    assert not token.is_cancelled()


def test_concurrent_cancellation():
    token = CancellationToken()
    barrier = threading.Barrier(9)
    results = []

    def canceller():
        barrier.wait()
        token.cancel()
        results.append(token.is_cancelled())

    threads = [threading.Thread(target=canceller) for _ in range(8)]
    for t in threads:
        t.start()
    barrier.wait()
    for t in threads:
        t.join()

    assert token.is_cancelled()
    assert all(results)
