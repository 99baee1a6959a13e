"""Newline-delimited JSON wire protocol for the isolation worker.

One JSON object per line. Requests flow parent → worker, responses worker
→ parent; the CANCEL request is one-way and may arrive while a GENERATE is
in flight. Waveforms are exchanged as file paths, never as payload bytes
(parity: reference ``isolation/protocol.py``).
"""

from __future__ import annotations

import json
from typing import Any

# Requests (parent → worker)
INIT = "init"
GENERATE = "generate"
STREAM = "stream"
CANCEL = "cancel"
SHUTDOWN = "shutdown"
PING = "ping"

# Responses (worker → parent)
READY = "ready"
RESULT = "result"
SEGMENT_RESULT = "segment_result"
ERROR = "error"
CANCELLED = "cancelled"
PONG = "pong"


def encode_message(msg_type: str, **payload: Any) -> str:
    """Serialize a message as one JSON line (trailing newline included)."""
    return json.dumps({"type": msg_type, **payload}, separators=(",", ":")) + "\n"


def decode_message(line: str) -> dict:
    """Parse one JSON line into a message dict."""
    return json.loads(line)
