"""Per-provider virtual environments, created lazily and cached.

Venvs live under ``~/.rho_tts_tpu/venvs/<provider>/``. A marker file
records a hash of the package source (pyproject for editable installs, or
the release version), so dependency changes trigger exactly one reinstall.

Capability parity: reference ``isolation/venv_manager.py``.
"""

from __future__ import annotations

import hashlib
import logging
import subprocess
import sys
import venv
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger(__name__)

# provider name → extras key in pyproject.toml
PROVIDER_EXTRAS: Dict[str, str] = {
    "qwen": "qwen",
    "chatterbox": "chatterbox",
}

VENVS_ROOT = Path.home() / ".rho_tts_tpu" / "venvs"
MARKER_FILE = ".rho_tts_tpu_installed"
INSTALL_TIMEOUT_SEC = 600


def _source_hash() -> str:
    """Hash identifying the current package source / version."""
    try:
        pyproject = Path(__file__).resolve().parents[3] / "pyproject.toml"
        if pyproject.exists():
            return hashlib.sha256(pyproject.read_bytes()).hexdigest()[:16]
    except Exception:  # noqa: BLE001
        pass
    try:
        from rho_tts_tpu import __version__

        return hashlib.sha256(__version__.encode()).hexdigest()[:16]
    except Exception:  # noqa: BLE001
        return "unknown"


def _project_root() -> Optional[Path]:
    """Nearest ancestor directory containing a pyproject.toml."""
    current = Path(__file__).resolve().parent
    for _ in range(6):
        if (current / "pyproject.toml").exists():
            return current
        current = current.parent
    return None


class VenvManager:
    """Creates and maintains one isolated venv per provider."""

    def __init__(self, provider: str, venvs_root: Optional[Path] = None):
        if provider not in PROVIDER_EXTRAS:
            raise ValueError(
                f"Unknown provider '{provider}'. Supported: {', '.join(PROVIDER_EXTRAS)}"
            )
        self.provider = provider
        self.extras_key = PROVIDER_EXTRAS[provider]
        self.venv_dir = (venvs_root or VENVS_ROOT) / provider

    @property
    def python(self) -> str:
        """The venv's Python interpreter path."""
        if sys.platform == "win32":
            return str(self.venv_dir / "Scripts" / "python.exe")
        return str(self.venv_dir / "bin" / "python")

    def ensure_venv(self) -> str:
        """Create the venv + install deps if stale. Returns the python path."""
        marker = self.venv_dir / MARKER_FILE
        current_hash = _source_hash()

        if marker.exists() and marker.read_text().strip() == current_hash:
            logger.debug("Venv for '%s' is up to date", self.provider)
            return self.python

        logger.info(
            "Setting up isolated environment for '%s' (one-time)...", self.provider
        )

        if not self.venv_dir.exists() or not Path(self.python).exists():
            self.venv_dir.mkdir(parents=True, exist_ok=True)
            venv.create(str(self.venv_dir), with_pip=True, clear=True)

        self._install()
        marker.write_text(current_hash)
        logger.info("Isolated environment for '%s' ready", self.provider)
        return self.python

    def _install(self) -> None:
        """pip-install this package (+extras) into the venv."""
        root = _project_root()
        if root is not None:
            spec = f"{root}[{self.extras_key}]"
            cmd = [self.python, "-m", "pip", "install", "-e", spec]
        else:
            spec = f"rho-tts-tpu[{self.extras_key}]"
            cmd = [self.python, "-m", "pip", "install", spec]

        logger.info("Installing %s (this may take a few minutes)...", spec)
        result = subprocess.run(
            cmd, capture_output=True, text=True, timeout=INSTALL_TIMEOUT_SEC
        )
        if result.returncode != 0:
            logger.error("pip install failed:\n%s", result.stderr)
            raise RuntimeError(
                f"Failed to install dependencies for '{self.provider}'.\n"
                f"Command: {' '.join(cmd)}\nstderr: {result.stderr[-500:]}"
            )
        logger.info("Installation complete for '%s'", self.provider)
