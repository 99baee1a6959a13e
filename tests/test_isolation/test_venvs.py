"""VenvManager tests: marker caching, creation, reinstall on hash change."""

from pathlib import Path
from unittest.mock import MagicMock, patch

import pytest

from rho_tts_tpu.isolation.venvs import MARKER_FILE, VenvManager


def test_unknown_provider_rejected(tmp_path):
    with pytest.raises(ValueError, match="Unknown provider"):
        VenvManager("nonexistent", venvs_root=tmp_path)


def test_fresh_venv_created_and_installed(tmp_path):
    mgr = VenvManager("qwen", venvs_root=tmp_path)
    ok = MagicMock()
    ok.returncode = 0

    def fake_create(path, with_pip, clear):
        Path(mgr.python).parent.mkdir(parents=True, exist_ok=True)
        Path(mgr.python).touch()

    with patch("venv.create", side_effect=fake_create) as create, patch(
        "subprocess.run", return_value=ok
    ) as run:
        python = mgr.ensure_venv()
    create.assert_called_once()
    run.assert_called_once()
    assert python == mgr.python
    assert (mgr.venv_dir / MARKER_FILE).exists()


def test_up_to_date_venv_skips_install(tmp_path):
    mgr = VenvManager("qwen", venvs_root=tmp_path)
    ok = MagicMock()
    ok.returncode = 0

    def fake_create(path, with_pip, clear):
        Path(mgr.python).parent.mkdir(parents=True, exist_ok=True)
        Path(mgr.python).touch()

    with patch("venv.create", side_effect=fake_create), patch(
        "subprocess.run", return_value=ok
    ):
        mgr.ensure_venv()
    # Second call: marker matches → no venv.create, no pip
    with patch("venv.create") as create, patch("subprocess.run") as run:
        mgr.ensure_venv()
    create.assert_not_called()
    run.assert_not_called()


def test_hash_change_triggers_reinstall(tmp_path):
    mgr = VenvManager("qwen", venvs_root=tmp_path)
    mgr.venv_dir.mkdir(parents=True)
    Path(mgr.python).parent.mkdir(parents=True, exist_ok=True)
    Path(mgr.python).touch()
    (mgr.venv_dir / MARKER_FILE).write_text("stale-hash")
    ok = MagicMock()
    ok.returncode = 0
    with patch("subprocess.run", return_value=ok) as run:
        mgr.ensure_venv()
    run.assert_called_once()


def test_install_failure_raises(tmp_path):
    mgr = VenvManager("chatterbox", venvs_root=tmp_path)
    bad = MagicMock()
    bad.returncode = 1
    bad.stderr = "pip exploded"

    def fake_create(path, with_pip, clear):
        Path(mgr.python).parent.mkdir(parents=True, exist_ok=True)
        Path(mgr.python).touch()

    with patch("venv.create", side_effect=fake_create), patch(
        "subprocess.run", return_value=bad
    ):
        with pytest.raises(RuntimeError, match="Failed to install"):
            mgr.ensure_venv()
