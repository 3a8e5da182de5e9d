"""SPEAD-64-48 wire-format tests.

Byte-level layout checks against the SPEAD spec flavour the reference
uses (``spead2.Flavour(4, 64, 48, 0)``, fgpu_send_prototype.py:19),
reassembly under loss/reorder/duplication, interop with an
independently-written reference-style parser (the
packet_latency/extract_timestamps.py:17-35 algorithm), UDP transport in
both formats on one port, and the pcap capture-analysis workflow.
"""

import struct

import numpy as np
import pytest

from dpdk_dc_sand_tpu.stream import (
    Chunk,
    ChunkRing,
    Heap64Assembler,
    UdpReceiver,
    UdpSender,
    packetize64,
    parse_packet64,
    stream_stop_packet,
)
from dpdk_dc_sand_tpu.stream.latency import (
    extract_timestamps,
    latency_stats,
    read_pcap,
    write_pcap,
)


def reference_style_parse(payload: bytes):
    """The reference's capture-tool algorithm, re-implemented verbatim
    from its description: item count at bytes 6:8, 64-bit big-endian
    pointers from byte 8, id = (ptr >> 48) & 0x1FFF, data = low 48 bits
    (extract_timestamps.py:22-31)."""
    items = struct.unpack(">H", payload[6:8])[0]
    out = {}
    for i in range(items):
        ptr = struct.unpack(">Q", payload[8 * (i + 1) : 8 * (i + 2)])[0]
        out[(ptr >> 48) & 0x1FFF] = ptr & ((1 << 48) - 1)
    return out


def test_header_layout_matches_spec():
    payload = np.arange(100, dtype=np.uint8)
    (pkt,) = packetize64(payload, heap_cnt=7, timestamp=123456, channel_offset=512)
    # SPEAD magic 0x53, version 4, item pointer width 8, heap addr width 6.
    assert pkt[0] == 0x53
    assert pkt[1] == 4
    assert pkt[2] == 8
    assert pkt[3] == 6
    assert pkt[4:6] == b"\x00\x00"
    n_items = struct.unpack(">H", pkt[6:8])[0]
    assert n_items == 7
    # Payload follows the pointer block untouched.
    assert pkt[8 + 8 * n_items :] == payload.tobytes()


def test_reference_capture_tool_reads_our_packets():
    payload = np.arange(300, dtype=np.uint8)
    pkts = packetize64(
        payload, heap_cnt=9, timestamp=0xABCDEF1234, channel_offset=4096,
        mtu_payload=128,
    )
    assert len(pkts) == 3
    for i, pkt in enumerate(pkts):
        items = reference_style_parse(pkt)
        assert items[0x1600] == 0xABCDEF1234  # timestamp on EVERY packet
        assert items[0x01] == 9  # heap counter
        assert items[0x02] == 300  # heap size
        assert items[0x03] == i * 128  # this packet's payload offset
        # 0x1FFF masks the 15-bit id space down to 13 bits, as the
        # reference tool does; 0x4103 & 0x1FFF == 0x0103.
        assert items[0x4103 & 0x1FFF] == 4096


def test_immediate_flag_and_address_items():
    payload = np.zeros(16, np.uint8)
    (pkt,) = packetize64(payload, heap_cnt=1, timestamp=5)
    n_items = struct.unpack(">H", pkt[6:8])[0]
    by_id = {}
    for i in range(n_items):
        ptr = struct.unpack(">Q", pkt[8 * (i + 1) : 8 * (i + 2)])[0]
        by_id[(ptr >> 48) & 0x7FFF] = ptr >> 63
    for imm_id in (0x01, 0x02, 0x03, 0x04, 0x1600, 0x4103):
        assert by_id[imm_id] == 1, hex(imm_id)
    assert by_id[0x4300] == 0  # feng_raw is an addressed item


@pytest.mark.parametrize("order", ["inorder", "reversed", "dup"])
def test_reassembly(order):
    rng = np.random.default_rng(2021)
    payload = rng.integers(0, 256, 10000, dtype=np.uint8)
    pkts = packetize64(payload, heap_cnt=3, timestamp=777, channel_offset=64,
                       mtu_payload=1024)
    if order == "reversed":
        pkts = pkts[::-1]
    elif order == "dup":
        pkts = [pkts[0]] + pkts
    asm = Heap64Assembler()
    done = [asm.feed(p) for p in pkts]
    chunks = [c for c in done if c is not None]
    assert len(chunks) == 1
    c = chunks[0]
    assert c.seq == 3 and c.timestamp == 777 and c.channel_offset == 64
    np.testing.assert_array_equal(c.payload, payload)


def test_loss_accounting_and_eviction():
    asm = Heap64Assembler(window=4)
    payload = np.zeros(4096, np.uint8)
    # Heap 0 loses its second packet; heaps 1..8 complete.
    pkts0 = packetize64(payload, heap_cnt=0, mtu_payload=2048)
    asm.feed(pkts0[0])
    for h in range(1, 9):
        for p in packetize64(payload, heap_cnt=h, mtu_payload=2048):
            asm.feed(p)
    assert asm.incomplete_dropped == 1
    assert asm.stats.consumed == 8


def test_stream_stop():
    asm = Heap64Assembler()
    assert asm.feed(stream_stop_packet()) is None
    assert asm.stopped


def test_udp_both_formats_one_port():
    ring = ChunkRing(8, 2048 + 16)
    rx = UdpReceiver(("127.0.0.1", 0), ring, mtu_payload=1024).start()
    try:
        rng = np.random.default_rng(7)
        pay_a = rng.integers(0, 256, 2048, dtype=np.uint8)
        pay_b = rng.integers(0, 256, 2048, dtype=np.uint8)
        tx64 = UdpSender(("127.0.0.1", rx.port), mtu_payload=1024,
                         wire_format="spead64")
        txl = UdpSender(("127.0.0.1", rx.port), mtu_payload=1024)
        tx64.send_chunk(Chunk(pay_a, seq=1, timestamp=11, channel_offset=128))
        txl.send_chunk(Chunk(pay_b, seq=2, timestamp=22, channel_offset=256))
        got = {}
        import time

        deadline = time.time() + 5.0
        while len(got) < 2 and time.time() < deadline:
            item = ring.acquire_read()
            if item is None:
                time.sleep(0.01)
                continue
            view, seq = item
            c = UdpReceiver.unpack(view)
            got[seq] = (c.timestamp, c.channel_offset, np.array(c.payload))
            ring.release_read()
        assert got[1][0] == 11 and got[1][1] == 128
        assert got[2][0] == 22 and got[2][1] == 256
        np.testing.assert_array_equal(got[1][2], pay_a)
        np.testing.assert_array_equal(got[2][2], pay_b)
        tx64.close()
        txl.close()
    finally:
        rx.stop()


def test_pcap_roundtrip_and_latency_analysis(tmp_path):
    """The reference's offline capture workflow: synthesize a SPEAD-64-48
    capture, write a pcap, read it back, extract (capture_time, adc_ts)
    and compute jitter (packet_latency/README.md contract)."""
    adc_rate = 1712e6
    rng = np.random.default_rng(3)
    records = []
    payload = np.zeros(1024, np.uint8)
    for h in range(50):
        adc_ts = h * 2**16
        wall = adc_ts / adc_rate + rng.normal(0, 2e-6) + 100.0
        for pkt in packetize64(payload, heap_cnt=h, timestamp=adc_ts):
            records.append((wall, pkt))
    path = str(tmp_path / "cap.pcap")
    assert write_pcap(path, records) == 50
    back = list(read_pcap(path))
    assert len(back) == 50
    ts = extract_timestamps(back)
    assert ts.shape == (50, 2)
    np.testing.assert_array_equal(ts[:, 1], [h * 2**16 for h in range(50)])
    stats = latency_stats(ts, adc_sample_rate=adc_rate)
    assert stats["n"] == 50
    assert 0.1 < stats["jitter_std_us"] < 10.0


def test_parse_rejects_foreign_packets():
    assert parse_packet64(b"") is None
    assert parse_packet64(b"\x00" * 64) is None
    # Wrong flavour (32-bit pointers) rejected.
    bad = bytes([0x53, 4, 4, 2, 0, 0, 0, 0])
    assert parse_packet64(bad) is None


def test_native_packetizer_byte_identical(monkeypatch):
    """The C sp64_packetize fast path emits byte-identical packets to
    the pure-Python codec (skipped when no toolchain)."""
    from dpdk_dc_sand_tpu import native as nat
    from dpdk_dc_sand_tpu.stream import spead64 as s64

    if nat.load_native() is None:
        pytest.skip("native toolchain unavailable")
    payload = np.random.default_rng(1).integers(
        0, 256, 5000, dtype=np.uint8
    )
    kwargs = dict(
        heap_cnt=3, timestamp=0x123456789AB, channel_offset=77,
        mtu_payload=512,
    )
    fast = s64.packetize64(payload, **kwargs)
    monkeypatch.setattr(
        "dpdk_dc_sand_tpu.native.load_native", lambda: None
    )
    pure = s64.packetize64(payload, **kwargs)
    assert fast == pure
