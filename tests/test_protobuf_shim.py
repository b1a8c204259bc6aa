"""The vendored pure-Python protobuf runtime (vendor/protobuf_shim).

The JVM side of transformWithStateInPandas parses these bytes with the
real protobuf-java, so the shim's encoder must be spec-exact — pinned
here against HAND-COMPUTED wire bytes (public encoding spec,
https://protobuf.dev/programming-guides/encoding/), not just
round-trips.  The end-to-end proof is the TWS leg of
tests/test_streaming_lifetime.py (a real state-server round-trip per
get/update); these tests keep failures debuggable at the byte level.
"""

from __future__ import annotations

import pytest

from data_ingestion_system_spark.vendor import ensure_protobuf

if not ensure_protobuf():  # pragma: no cover - shim tree damaged
    pytest.skip("protobuf shim unavailable", allow_module_level=True)

from data_ingestion_system_spark.vendor.protobuf_shim.google.protobuf.internal import (  # noqa: E501
    _shim_runtime as rt,
)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm


def test_varint_encoding_hand_values():
    assert rt.enc_varint(0) == b"\x00"
    assert rt.enc_varint(1) == b"\x01"
    assert rt.enc_varint(127) == b"\x7f"
    assert rt.enc_varint(128) == b"\x80\x01"
    assert rt.enc_varint(300) == b"\xac\x02"  # spec's worked example
    # int64 -1 = ten bytes of two's complement
    assert rt.enc_signed(-1) == b"\xff" * 9 + b"\x01"
    v, i = rt.dec_varint(b"\xac\x02", 0)
    assert (v, i) == (300, 2)
    assert rt.to_signed64(int.from_bytes(b"\xff" * 8, "little")
                          & 0xFFFFFFFFFFFFFFFF) == -1


def test_scalar_message_hand_bytes():
    # StateRequest.version is field 1, int32 -> tag 0x08
    assert sm.StateRequest(version=1).SerializeToString() == b"\x08\x01"
    # proto3 zero value is omitted
    assert sm.StateRequest(version=0).SerializeToString() == b""
    # bytes field: SetImplicitKey.key is field 1, wt 2 -> tag 0x0a
    assert (sm.SetImplicitKey(key=b"ab").SerializeToString()
            == b"\x0a\x02ab")
    # string field: ParseStringSchema.schema field 1
    assert (sm.ParseStringSchema(schema="x").SerializeToString()
            == b"\x0a\x01x")
    # int64: RegisterTimer.expiryTimestampMs field 1, varint
    assert (sm.RegisterTimer(expiryTimestampMs=300).SerializeToString()
            == b"\x08\xac\x02")


def test_nested_message_hand_bytes():
    # StateRequest{statefulProcessorCall{setHandleState{state: CREATED}}}
    # statefulProcessorCall = field 2 (tag 0x12), setHandleState =
    # field 1 (tag 0x0a), state = field 1 enum CREATED=1 (tag 0x08)
    m = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.CREATED)))
    assert m.SerializeToString() == b"\x12\x04\x0a\x02\x08\x01"
    r = sm.StateRequest()
    r.ParseFromString(b"\x12\x04\x0a\x02\x08\x01")
    assert r.statefulProcessorCall.setHandleState.state == sm.CREATED


def test_oneof_last_writer_wins():
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(),
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()))
    # both members share the `method` oneof: only the later survives
    data = m.SerializeToString()
    # implicitGroupingKeyRequest = field 4 -> tag 0x22; removeImplicitKey
    # = field 2 inside -> tag 0x12, empty message
    assert data == b"\x22\x02\x12\x00"


def test_negative_and_large_ints_roundtrip():
    for v in (-1, -(2**31), 2**62, -(2**62), 2**31 - 1):
        m = sm.RegisterTimer(expiryTimestampMs=v)
        r = sm.RegisterTimer()
        r.ParseFromString(m.SerializeToString())
        assert r.expiryTimestampMs == v


def test_repeated_bytes_and_submessages():
    m = sm.StateResponseWithListGet(statusCode=0, value=[b"a", b"bc"],
                                    requireNextFetch=True)
    # field 3 repeated bytes -> two tag-0x1a records; field 4 bool
    assert (m.SerializeToString()
            == b"\x1a\x01a\x1a\x02bc\x20\x01")
    r = sm.StateResponseWithListGet()
    r.ParseFromString(m.SerializeToString())
    assert list(r.value) == [b"a", b"bc"] and r.requireNextFetch is True

    it = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=b"k1", value=b"v1"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2")])
    r2 = sm.StateResponseWithMapIterator()
    r2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in r2.kvPair] == [
        (b"k1", b"v1"), (b"k2", b"v2")]


def test_unknown_fields_skipped_not_fatal():
    # field 1000 varint + field 1001 bytes, then a real version field
    junk = (rt.enc_tag(1000, 0) + rt.enc_varint(7)
            + rt.enc_tag(1001, 2) + rt.enc_varint(3) + b"xyz"
            + b"\x08\x05")
    r = sm.StateRequest()
    r.ParseFromString(junk)
    assert r.version == 5


def test_packed_repeated_scalars_accepted():
    # parsers must accept packed encoding for repeated varint fields
    # regardless of declaration; use a synthetic descriptor
    f = rt.FieldDesc("xs", 1, rt.TYPE_INT64, rt.LABEL_REPEATED, "", None)
    md = rt.MessageDesc("T", "t.T")
    md.add_field(f)
    cls = type("T", (rt.ShimMessage,), {"DESCRIPTOR": md})
    payload = rt.enc_varint(1) + rt.enc_varint(300) + rt.enc_varint(2)
    data = rt.enc_tag(1, 2) + rt.enc_varint(len(payload)) + payload
    m = cls()
    m.ParseFromString(data)
    assert list(m.xs) == [1, 300, 2]


def test_descriptor_parse_of_pysparks_statemessage():
    """The generated module's FileDescriptorProto parses completely:
    every message the pyspark client constructs exists with the right
    field numbers, and the HandleState enum carries its 6 values."""
    d = sm.DESCRIPTOR
    names = {m.name for m in d.message_types}
    for needed in ("StateRequest", "StateResponse", "ValueStateCall",
                   "StateCallCommand", "SetImplicitKey", "TimerInfo",
                   "StateResponseWithLongTypeVal"):
        assert needed in names
    sr = next(m for m in d.message_types if m.name == "StateRequest")
    assert sr.fields_by_name["version"].number == 1
    assert sr.fields_by_name["statefulProcessorCall"].number == 2
    assert sm.PRE_INIT == 0 and sm.CREATED == 1 and sm.CLOSED == 5
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4


def test_proto3_optional_field_roundtrip():
    # TimerInfo.key is proto3-optional (synthetic oneof) bytes
    m = sm.TimerInfo(key=b"k", timestampMs=42)
    r = sm.TimerInfo()
    r.ParseFromString(m.SerializeToString())
    assert r.key == b"k" and r.timestampMs == 42


def test_ensure_protobuf_idempotent_and_loud_version():
    import google.protobuf

    assert ensure_protobuf() is True  # second call: no-op
    # a stack trace must never masquerade as the real runtime
    assert "shim" in getattr(google.protobuf, "__version__", "shim")
