"""Wire protocol encode/decode roundtrips."""

from rho_tts_tpu.isolation import protocol as P


def test_encode_produces_one_line():
    line = P.encode_message(P.INIT, provider="qwen", kwargs={"seed": 1})
    assert line.endswith("\n")
    assert line.count("\n") == 1


def test_roundtrip():
    line = P.encode_message(P.GENERATE, text="hello", speed=1.5)
    msg = P.decode_message(line)
    assert msg["type"] == P.GENERATE
    assert msg["text"] == "hello"
    assert msg["speed"] == 1.5


def test_roundtrip_nested_payload():
    line = P.encode_message(P.INIT, kwargs={"a": [1, 2], "b": {"c": None}})
    msg = P.decode_message(line)
    assert msg["kwargs"] == {"a": [1, 2], "b": {"c": None}}


def test_unicode_payload():
    line = P.encode_message(P.GENERATE, text="héllo wörld — ünïcode")
    assert P.decode_message(line)["text"] == "héllo wörld — ünïcode"


def test_all_message_types_distinct():
    types = {P.INIT, P.GENERATE, P.STREAM, P.CANCEL, P.SHUTDOWN, P.PING,
             P.READY, P.RESULT, P.SEGMENT_RESULT, P.ERROR, P.CANCELLED, P.PONG}
    assert len(types) == 12
