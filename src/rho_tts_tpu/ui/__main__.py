"""Allow ``python -m rho_tts_tpu.ui`` to launch the web UI."""
from . import main

main()
