"""Run the REAL worker message loop in-process over fake stdio.

The reference's answer to "test the remote side without a subprocess":
patch stdin/stdout with StringIO carrying canned JSON lines and mock the
factory. Same approach here.
"""

import io
import json
from unittest.mock import MagicMock, patch

import numpy as np
import pytest

from rho_tts_tpu.isolation import protocol as P
from rho_tts_tpu.isolation.worker import Worker
from rho_tts_tpu.result import GenerationResult


def run_worker_with(lines):
    """Feed JSON lines to a real Worker.run(); return parsed responses."""
    stdin = io.StringIO("".join(lines))
    stdout = io.StringIO()
    with patch("sys.stdin", stdin), patch("sys.stdout", stdout):
        Worker().run()
    return [json.loads(l) for l in stdout.getvalue().splitlines() if l.strip()]


def make_fake_tts():
    tts = MagicMock()
    tts.sample_rate = 24000
    return tts


def test_init_then_shutdown():
    tts = make_fake_tts()
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={"seed": 7}),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    assert responses[0]["type"] == P.READY
    assert responses[0]["sample_rate"] == 24000
    factory.get_tts_instance.assert_called_once_with(provider="qwen", seed=7)


def test_init_failure_reports_error():
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.side_effect = RuntimeError("no device")
        responses = run_worker_with(
            [P.encode_message(P.INIT, provider="qwen", kwargs={})]
        )
    assert responses[0]["type"] == P.ERROR
    assert "no device" in responses[0]["message"]


def test_non_init_first_message_rejected():
    responses = run_worker_with([P.encode_message(P.GENERATE, text="x")])
    assert responses[0]["type"] == P.ERROR


def test_generate_single():
    tts = make_fake_tts()
    tts.generate.return_value = GenerationResult(
        path="/tmp/out.wav",
        audio=np.zeros(10, np.float32),
        sample_rate=24000,
        duration_sec=1.5,
        segments_count=2,
        format="wav",
    )
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message(P.GENERATE, text="hello", output_path="/tmp/out.wav"),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    result = responses[1]
    assert result["type"] == P.RESULT
    assert result["output_path"] == "/tmp/out.wav"
    assert result["duration_sec"] == 1.5
    assert result["segments_count"] == 2


def test_generate_batch():
    tts = make_fake_tts()
    tts.generate.return_value = [
        GenerationResult(path="/tmp/b_0.wav", audio=np.zeros(4), duration_sec=1.0, segments_count=1),
        None,
    ]
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message(P.GENERATE, texts=["a", "b"], output_base_path="/tmp/b"),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    result = responses[1]
    assert result["output_paths"] == ["/tmp/b_0.wav", None]
    assert result["seg_counts"] == [1, 0]


def test_generate_failure_reports_unsuccessful():
    tts = make_fake_tts()
    tts.generate.return_value = None
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message(P.GENERATE, text="x"),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    assert responses[1] == {"type": P.RESULT, "success": False}


def test_generate_exception_reports_error():
    tts = make_fake_tts()
    tts.generate.side_effect = RuntimeError("device exploded")
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message(P.GENERATE, text="x"),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    assert responses[1]["type"] == P.ERROR
    assert "device exploded" in responses[1]["message"]


def test_stream_segments(tmp_path):
    tts = make_fake_tts()
    seg = GenerationResult(
        audio=np.zeros(100, np.float32), sample_rate=24000, duration_sec=0.5, segments_count=1
    )
    tts.stream.return_value = iter([seg, seg])
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message(P.STREAM, text="x", temp_dir=str(tmp_path)),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    seg_msgs = [r for r in responses if r["type"] == P.SEGMENT_RESULT]
    assert len(seg_msgs) == 2
    assert all(str(tmp_path) in m["path"] for m in seg_msgs)
    final = [r for r in responses if r["type"] == P.RESULT][0]
    assert final["segments"] == 2


def test_unknown_command():
    tts = make_fake_tts()
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message("frobnicate"),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    assert responses[1]["type"] == P.ERROR
    assert "frobnicate" in responses[1]["message"]


def test_ping_answered_by_reader():
    tts = make_fake_tts()
    with patch("rho_tts_tpu.isolation.worker.TTSFactory") as factory:
        factory.get_tts_instance.return_value = tts
        responses = run_worker_with(
            [
                P.encode_message(P.INIT, provider="qwen", kwargs={}),
                P.encode_message(P.PING),
                P.encode_message(P.SHUTDOWN),
            ]
        )
    assert any(r["type"] == P.PONG for r in responses)
