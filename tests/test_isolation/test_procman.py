"""WorkerProcess tests with a mocked subprocess.Popen."""

import json
from unittest.mock import MagicMock, patch

import pytest

from rho_tts_tpu.isolation import protocol as P
from rho_tts_tpu.isolation.procman import MAX_RESTARTS, WorkerProcess


def make_proc(responses=None):
    proc = MagicMock()
    proc.poll.return_value = None  # alive
    # The stderr-forwarder daemon thread loops `iter(readline, "")`; a
    # bare MagicMock returns a fresh truthy Mock per call, so the thread
    # would spin for the REST of the pytest process — burning the single
    # CPU and growing the mock's call history without bound (this was
    # the suite's mystery memory leak: ~8 spinning threads retained tens
    # of GB and slowed every later module). EOF immediately instead.
    proc.stderr.readline.return_value = ""
    if responses is not None:
        proc.stdout.readline.side_effect = responses
    return proc


def test_start_spawns_worker_module():
    with patch("subprocess.Popen") as popen:
        popen.return_value = make_proc()
        wp = WorkerProcess("/venv/bin/python")
        wp.start()
    cmd = popen.call_args[0][0]
    assert cmd[0] == "/venv/bin/python"
    assert cmd[1:] == ["-m", "rho_tts_tpu.isolation.worker"]


def test_send_roundtrip():
    proc = make_proc([json.dumps({"type": P.READY, "sample_rate": 24000}) + "\n"])
    with patch("subprocess.Popen", return_value=proc):
        wp = WorkerProcess("/p")
        wp.start()
        resp = wp.send(P.INIT, provider="qwen", kwargs={})
    assert resp["type"] == P.READY
    written = proc.stdin.write.call_args[0][0]
    assert json.loads(written)["type"] == P.INIT


def test_broken_pipe_restarts_then_raises():
    proc = make_proc()
    proc.stdout.readline.return_value = ""  # EOF → BrokenPipeError
    with patch("subprocess.Popen", return_value=proc):
        wp = WorkerProcess("/p")
        wp.start()
        with pytest.raises(RuntimeError, match="restarted"):
            wp.send(P.PING)
    assert wp._restart_count == 1


def test_gives_up_after_max_restarts():
    proc = make_proc()
    proc.stdout.readline.return_value = ""
    with patch("subprocess.Popen", return_value=proc):
        wp = WorkerProcess("/p")
        wp.start()
        for _ in range(MAX_RESTARTS):
            with pytest.raises(RuntimeError, match="restarted"):
                wp.send(P.PING)
        with pytest.raises(RuntimeError, match="giving up"):
            wp.send(P.PING)


def test_ping_pong():
    proc = make_proc([json.dumps({"type": P.PONG}) + "\n"])
    with patch("subprocess.Popen", return_value=proc):
        wp = WorkerProcess("/p")
        wp.start()
        assert wp.ping() is True


def test_ping_false_on_dead_worker():
    wp = WorkerProcess("/p")
    assert wp.ping() is False


def test_send_cancel_best_effort():
    proc = make_proc()
    with patch("subprocess.Popen", return_value=proc):
        wp = WorkerProcess("/p")
        wp.start()
        wp.send_cancel()
    written = proc.stdin.write.call_args[0][0]
    assert json.loads(written)["type"] == P.CANCEL


def test_shutdown_graceful():
    proc = make_proc()
    with patch("subprocess.Popen", return_value=proc):
        wp = WorkerProcess("/p")
        wp.start()
        wp.shutdown()
    written = proc.stdin.write.call_args[0][0]
    assert json.loads(written)["type"] == P.SHUTDOWN
    proc.wait.assert_called()
