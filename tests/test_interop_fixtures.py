"""Byte-golden interop fixtures — codec drift fails loudly.

The reference's SPEAD and KATCP planes interoperate with the real
spead2/aiokatcp libraries (fgpu_send_prototype.py:15-19,
corr3_servlet.py:8). This environment cannot install either (zero
egress; the pip attempt log is frozen inside the fixture), so the
committed substitute is exact-byte freezing: the packets/lines the
codecs emitted on 2026-08-21 — after spec-level field validation in
tests/test_spead64.py — are pinned in ``tests/fixtures/
interop_golden.json``. Any change to the wire bytes from here on is a
test failure, and the fixture doubles as the test-vector set for a real
library round-trip when an environment with the libraries exists
(regenerate with tests/fixtures/make_interop_golden.py only after
deliberate wire-format changes).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "interop_golden.json"
)


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


def _payload(size: int) -> np.ndarray:
    return (np.arange(size, dtype=np.int64) % 251).astype(np.uint8)


def test_spead64_packets_byte_frozen(golden):
    from dpdk_dc_sand_tpu.stream.spead64 import packetize64

    for case in golden["spead64"]:
        pkts = packetize64(
            _payload(case["payload_size"]),
            case["heap_cnt"],
            timestamp=case["timestamp"],
            channel_offset=case["channel_offset"],
            mtu_payload=case["mtu_payload"],
        )
        assert [p.hex() for p in pkts] == case["packets_hex"], (
            f"SPEAD-64-48 wire bytes drifted for case {case['name']!r}; "
            "if the change is deliberate, regenerate the fixture"
        )


def test_spead64_stop_packet_byte_frozen(golden):
    from dpdk_dc_sand_tpu.stream.spead64 import stream_stop_packet

    assert stream_stop_packet().hex() == golden["stop_packet_hex"]


def test_frozen_packets_reassemble(golden):
    """The frozen bytes must round-trip through today's RX path — the
    receiver-side half of the drift gate."""
    from dpdk_dc_sand_tpu.stream.spead64 import (
        Heap64Assembler,
        parse_packet64,
    )

    for case in golden["spead64"]:
        asm = Heap64Assembler()
        done = None
        for hx in case["packets_hex"]:
            raw = bytes.fromhex(hx)
            pkt = parse_packet64(raw)
            assert pkt is not None
            assert pkt.heap_cnt == case["heap_cnt"]
            assert pkt.timestamp == case["timestamp"]
            assert pkt.channel_offset == case["channel_offset"]
            done = asm.feed(raw) or done
        assert done is not None, f"heap never completed: {case['name']}"
        got = np.frombuffer(done.payload, np.uint8)
        np.testing.assert_array_equal(got, _payload(case["payload_size"]))


def test_katcp_lines_byte_frozen(golden):
    from dpdk_dc_sand_tpu.control.protocol import Message

    lines = [bytes.fromhex(h) for h in golden["katcp_lines_hex"]]
    # Encode side: re-derive each frozen line from its decoded form.
    for raw in lines:
        msg = Message.decode(raw)
        assert msg is not None
        assert msg.encode() == raw, (
            "KATCP wire encoding drifted; if deliberate, regenerate "
            "the fixture"
        )


def test_katcp_escape_roundtrip_of_frozen_args(golden):
    from dpdk_dc_sand_tpu.control.protocol import Message

    raw = bytes.fromhex(golden["katcp_lines_hex"][3])
    msg = Message.decode(raw)
    assert msg.args == ["with space\nand\tctl\\chars\x00\x1b"]
