"""Allow ``python -m rho_tts_tpu.isolation.worker`` style execution."""
from rho_tts_tpu.isolation.worker import main

main()
