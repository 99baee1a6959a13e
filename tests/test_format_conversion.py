"""Format conversion via ffmpeg subprocess (mocked)."""

import os
from unittest.mock import MagicMock, patch

import numpy as np
import pytest

from rho_tts_tpu import FormatConversionError
from rho_tts_tpu.audio_io import convert_format, save_wav


@pytest.fixture
def wav_file(tmp_path):
    path = str(tmp_path / "audio.wav")
    save_wav(path, np.zeros(1000, np.float32), 24000)
    return path


def ok_proc():
    p = MagicMock()
    p.returncode = 0
    p.stderr = ""
    return p


class TestConvertFormat:
    @pytest.mark.parametrize("fmt,codec", [("mp3", "libmp3lame"), ("flac", "flac"), ("ogg", "libvorbis")])
    def test_invokes_ffmpeg_with_codec(self, wav_file, fmt, codec):
        with patch("shutil.which", return_value="/usr/bin/ffmpeg"), patch(
            "subprocess.run", return_value=ok_proc()
        ) as run:
            out = convert_format(wav_file, fmt)
        cmd = run.call_args[0][0]
        assert "/usr/bin/ffmpeg" in cmd[0]
        assert codec in cmd
        assert out.endswith(f".{fmt}")
        assert not os.path.exists(wav_file)  # source wav removed

    def test_unsupported_format(self, wav_file):
        with pytest.raises(FormatConversionError, match="Unsupported"):
            convert_format(wav_file, "aiff")

    def test_missing_ffmpeg(self, wav_file):
        with patch("shutil.which", return_value=None):
            with pytest.raises(FormatConversionError, match="ffmpeg"):
                convert_format(wav_file, "mp3")
        assert os.path.exists(wav_file)  # source preserved on failure

    def test_encode_failure_raises_and_preserves_wav(self, wav_file):
        bad = MagicMock()
        bad.returncode = 1
        bad.stderr = "encoder exploded"
        with patch("shutil.which", return_value="/usr/bin/ffmpeg"), patch(
            "subprocess.run", return_value=bad
        ):
            with pytest.raises(FormatConversionError, match="encoder exploded"):
                convert_format(wav_file, "mp3")
        assert os.path.exists(wav_file)


class TestGenerateWithFormat:
    def test_generate_mp3_converts_after_wav(self, tmp_path):
        from rho_tts_tpu import BaseTTS

        class FakeTTS(BaseTTS):
            def __init__(self):
                super().__init__(device="cpu")

            def _generate_audio(self, text, **kw):
                t = np.arange(4000) / 8000
                return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

            @property
            def sample_rate(self):
                return 8000

        out = str(tmp_path / "x.mp3")

        def fake_run(cmd, **kw):
            # "encode" by creating the target file
            open(cmd[-1], "wb").write(b"ID3 fake")
            return ok_proc()

        with patch("shutil.which", return_value="/usr/bin/ffmpeg"), patch(
            "subprocess.run", side_effect=fake_run
        ):
            result = FakeTTS().generate("hi", out, format="mp3")
        assert result.path == out
        assert os.path.exists(out)
        assert not os.path.exists(str(tmp_path / "x.wav"))
