"""ProviderProxy tests with scripted worker responses (no subprocesses)."""

from unittest.mock import MagicMock, patch

import numpy as np
import pytest

from rho_tts_tpu.cancellation import CancellationToken
from rho_tts_tpu.exceptions import ModelLoadError
from rho_tts_tpu.isolation import protocol as P
from rho_tts_tpu.isolation.proxy import ProviderProxy


def make_proxy(responses, provider="qwen", **kwargs):
    """Build a proxy whose worker returns the scripted responses."""
    worker = MagicMock()
    worker.send.side_effect = responses
    with patch("rho_tts_tpu.isolation.proxy.VenvManager") as vm, patch(
        "rho_tts_tpu.isolation.proxy.WorkerProcess", return_value=worker
    ):
        vm.return_value.ensure_venv.return_value = "/fake/python"
        proxy = ProviderProxy(provider, **kwargs)
    return proxy, worker


def test_init_handshake():
    proxy, worker = make_proxy([{"type": P.READY, "sample_rate": 24000}])
    assert proxy.sample_rate == 24000
    worker.send.assert_called_once_with(P.INIT, provider="qwen", kwargs={})


def test_init_error_raises_model_load_error():
    worker = MagicMock()
    worker.send.return_value = {"type": P.ERROR, "message": "boom"}
    with patch("rho_tts_tpu.isolation.proxy.VenvManager") as vm, patch(
        "rho_tts_tpu.isolation.proxy.WorkerProcess", return_value=worker
    ):
        vm.return_value.ensure_venv.return_value = "/fake/python"
        with pytest.raises(ModelLoadError, match="boom"):
            ProviderProxy("qwen")
    worker.kill.assert_called_once()


def test_generate_single_with_path(tmp_path):
    out = str(tmp_path / "o.wav")
    proxy, worker = make_proxy(
        [
            {"type": P.READY, "sample_rate": 24000},
            {
                "type": P.RESULT,
                "success": True,
                "output_path": out,
                "duration_sec": 2.0,
                "segments_count": 3,
                "format": "wav",
            },
        ]
    )
    result = proxy.generate("hello", out)
    assert result.path == out
    assert result.duration_sec == 2.0
    assert result.segments_count == 3


def test_generate_in_memory_reads_back(tmp_path):
    from rho_tts_tpu.audio_io import save_wav

    proxy, worker = make_proxy([{"type": P.READY, "sample_rate": 24000}])

    def fake_generate(msg_type, **payload):
        path = payload["output_path"]
        save_wav(path, np.full(100, 0.25, np.float32), 24000)
        return {
            "type": P.RESULT,
            "success": True,
            "output_path": path,
            "duration_sec": 100 / 24000,
            "segments_count": 1,
            "format": "wav",
        }

    worker.send.side_effect = fake_generate
    result = proxy.generate("hello")  # no output_path → in-memory
    assert result.path is None
    assert result.audio is not None
    assert result.audio.shape == (100,)


def test_generate_batch():
    proxy, worker = make_proxy(
        [
            {"type": P.READY, "sample_rate": 24000},
            {
                "type": P.RESULT,
                "output_paths": ["/tmp/a_0.wav", None],
                "durations": [1.0, 0.0],
                "seg_counts": [1, 0],
                "format": "wav",
            },
        ]
    )
    results = proxy.generate(["a", "b"], "/tmp/a")
    assert results[0].path == "/tmp/a_0.wav"
    assert results[1] is None


def test_generate_cancelled_returns_none():
    proxy, worker = make_proxy(
        [{"type": P.READY, "sample_rate": 24000}, {"type": P.CANCELLED}]
    )
    assert proxy.generate("x", "/tmp/x.wav") is None


def test_generate_worker_error_raises():
    proxy, worker = make_proxy(
        [{"type": P.READY, "sample_rate": 24000}, {"type": P.ERROR, "message": "oops"}]
    )
    with pytest.raises(RuntimeError, match="oops"):
        proxy.generate("x", "/tmp/x.wav")


def test_cancel_forwarder_sends_cancel():
    import time

    proxy, worker = make_proxy([{"type": P.READY, "sample_rate": 24000}])
    token = CancellationToken()
    token.cancel()

    def slow_generate(msg_type, **payload):
        time.sleep(0.3)  # give the forwarder time to poll
        return {"type": P.CANCELLED}

    worker.send.side_effect = slow_generate
    assert proxy.generate("x", "/tmp/x.wav", cancellation_token=token) is None
    worker.send_cancel.assert_called()


def test_stream_yields_segments(tmp_path):
    from rho_tts_tpu.audio_io import save_wav

    seg_path = str(tmp_path / "seg_0.wav")
    save_wav(seg_path, np.zeros(50, np.float32), 24000)

    proxy, worker = make_proxy([{"type": P.READY, "sample_rate": 24000}])
    worker.receive.side_effect = [
        {"type": P.SEGMENT_RESULT, "path": seg_path, "duration_sec": 0.1},
        {"type": P.RESULT, "success": True, "segments": 1},
    ]
    results = list(proxy.stream("hello"))
    assert len(results) == 1
    assert results[0].audio is not None
    worker.send_nowait.assert_called_once()


def test_shutdown_idempotent():
    proxy, worker = make_proxy([{"type": P.READY, "sample_rate": 24000}])
    proxy.shutdown()
    proxy.shutdown()
    worker.shutdown.assert_called_once()


def test_context_manager_shuts_down():
    proxy, worker = make_proxy([{"type": P.READY, "sample_rate": 24000}])
    with proxy:
        pass
    worker.shutdown.assert_called_once()


def test_async_generate():
    import asyncio

    proxy, worker = make_proxy(
        [
            {"type": P.READY, "sample_rate": 24000},
            {
                "type": P.RESULT,
                "success": True,
                "output_path": "/tmp/a.wav",
                "duration_sec": 1.0,
                "segments_count": 1,
                "format": "wav",
            },
        ]
    )

    async def run():
        return await proxy.async_generate("hi", "/tmp/a.wav")

    result = asyncio.run(run())
    assert result.path == "/tmp/a.wav"
