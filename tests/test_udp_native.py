"""Native burst UDP transport (sendmmsg/recvmmsg + C++ heap reassembly).

Loopback round-trips mirroring the reference's transport verification:
deterministic payloads checked after reassembly (verify.py:20-33 model),
drop/eviction accounting, and ring-slot layout compatibility with the
Python receiver's unpack.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from dpdk_dc_sand_tpu.stream.chunk import Chunk
from dpdk_dc_sand_tpu.stream.ring import ChunkRing
from dpdk_dc_sand_tpu.stream.spead import check_pattern, fill_pattern
from dpdk_dc_sand_tpu.stream.udp import UdpReceiver

udp_native = pytest.importorskip("dpdk_dc_sand_tpu.stream.udp_native")

if not udp_native.burst_available():  # pragma: no cover - no toolchain
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def _drain(ring, want, deadline_s=10.0):
    got = []
    deadline = time.time() + deadline_s
    while len(got) < want and time.time() < deadline:
        r = ring.acquire_read()
        if r is None:
            time.sleep(0.002)
            continue
        view, seq = r
        chunk = UdpReceiver.unpack(view)
        got.append((seq, chunk.timestamp, chunk.channel_offset,
                    chunk.payload.copy()))
        ring.release_read()
    return got


def test_burst_roundtrip_multi_packet_heaps():
    ring = ChunkRing(64, 1 << 20, native=True)
    rx = udp_native.BurstUdpReceiver(("127.0.0.1", 0), ring, mtu_payload=4096)
    tx = udp_native.BurstUdpSender(("127.0.0.1", rx.port), mtu_payload=4096)
    try:
        rng = np.random.default_rng(2021)
        chunks = [
            rng.integers(0, 255, size=300_000, dtype=np.uint8)
            for _ in range(6)
        ]
        for i, c in enumerate(chunks):
            tx.send_chunk(
                Chunk(payload=c, seq=i, timestamp=5000 + i, channel_offset=i * 64)
            )
            time.sleep(0.01)  # loopback pacing: UDP is lossy by contract
        got = _drain(ring, len(chunks))
        assert len(got) == len(chunks), rx.stats()
        for i, (seq, ts, co, payload) in enumerate(got):
            assert (seq, ts, co) == (i, 5000 + i, i * 64)
            np.testing.assert_array_equal(payload, chunks[i])
        pkts, nbytes = tx.stats()
        # 300000/4096 -> 74 packets per heap
        assert pkts == 74 * len(chunks)
        st = rx.stats()
        assert st["heaps"] == len(chunks)
        assert st["packets"] >= pkts - st["evicted"] * 74
    finally:
        rx.stop()
        tx.close()
        ring.close()


def test_burst_pattern_payload_verifies():
    """The dpdk verify.py arange-pattern survives packetize/reassemble."""
    ring = ChunkRing(8, 1 << 16, native=True)
    rx = udp_native.BurstUdpReceiver(("127.0.0.1", 0), ring, mtu_payload=1024)
    tx = udp_native.BurstUdpSender(("127.0.0.1", rx.port), mtu_payload=1024)
    try:
        payload = fill_pattern(4096, chunk_id=7, counter=42)
        tx.send_chunk(Chunk(payload=payload, seq=7, timestamp=1, channel_offset=0))
        got = _drain(ring, 1)
        assert len(got) == 1
        words = np.ascontiguousarray(got[0][3]).view(np.uint64)
        assert check_pattern(words, chunk_id=7) == 0
        assert int(words[0]) == 42
    finally:
        rx.stop()
        tx.close()
        ring.close()


@pytest.mark.parametrize("mode", ["burst", "gso", "uring"])
def test_roundtrip_all_engine_modes(mode):
    """Every kernel fast path (sendmmsg / GSO+GRO / io_uring) round-trips
    multi-packet heaps with intact payloads and metadata."""
    ring = ChunkRing(64, 1 << 20, native=True)
    try:
        rx = udp_native.BurstUdpReceiver(
            ("127.0.0.1", 0), ring, mtu_payload=4096, mode=mode
        )
    except OSError:
        pytest.skip(f"{mode} receiver unsupported on this kernel")
    try:
        tx = udp_native.BurstUdpSender(
            ("127.0.0.1", rx.port), mtu_payload=4096, mode=mode
        )
    except OSError:
        rx.stop()
        ring.close()
        pytest.skip(f"{mode} sender unsupported on this kernel")
    try:
        assert tx.mode == mode and rx.mode == mode
        rng = np.random.default_rng(7)
        chunks = [
            rng.integers(0, 255, size=200_000, dtype=np.uint8)
            for _ in range(4)
        ]
        for i, c in enumerate(chunks):
            tx.send_chunk(
                Chunk(payload=c, seq=i, timestamp=100 + i, channel_offset=i)
            )
            time.sleep(0.01)
        got = _drain(ring, len(chunks))
        assert len(got) == len(chunks), (mode, rx.stats())
        for i, (seq, ts, co, payload) in enumerate(got):
            assert (seq, ts, co) == (i, 100 + i, i)
            np.testing.assert_array_equal(payload, chunks[i])
    finally:
        rx.stop()
        tx.close()
        ring.close()


def test_burst_receiver_requires_native_ring():
    ring = ChunkRing(4, 1024, native=None)
    if ring._lib is not None:
        pytest.skip("ring is native here")
    with pytest.raises(ValueError):
        udp_native.BurstUdpReceiver(("127.0.0.1", 0), ring)


def test_burst_sender_stats_accumulate():
    ring = ChunkRing(8, 1 << 16, native=True)
    rx = udp_native.BurstUdpReceiver(("127.0.0.1", 0), ring, mtu_payload=512)
    tx = udp_native.BurstUdpSender(("127.0.0.1", rx.port), mtu_payload=512)
    try:
        data = np.zeros(2048, np.uint8)
        for i in range(3):
            tx.send_chunk(Chunk(payload=data, seq=i, timestamp=0, channel_offset=0))
        pkts, nbytes = tx.stats()
        assert pkts == 3 * 4  # 2048/512
        assert nbytes == 3 * 4 * (512 + 40)
    finally:
        rx.stop()
        tx.close()
        ring.close()


def test_native_receiver_dual_stack_spead64():
    """The C reassembly ingests real SPEAD-64-48 and SPEAD-lite heaps on
    one port (byte-counted completion shared across formats)."""
    import time

    import numpy as np

    from dpdk_dc_sand_tpu.stream.chunk import Chunk
    from dpdk_dc_sand_tpu.stream.ring import ChunkRing
    from dpdk_dc_sand_tpu.stream.udp import UdpReceiver, UdpSender
    from dpdk_dc_sand_tpu.stream.udp_native import (
        BurstUdpReceiver,
        burst_available,
    )

    if not burst_available():
        pytest.skip("native toolchain unavailable")
    ring = ChunkRing(8, 1 << 20, native=True)
    rx = BurstUdpReceiver(("127.0.0.1", 0), ring, mtu_payload=1024)
    try:
        rng = np.random.default_rng(2)
        pa = rng.integers(0, 256, 8192, dtype=np.uint8)
        pb = rng.integers(0, 256, 8192, dtype=np.uint8)
        tx64 = UdpSender(("127.0.0.1", rx.port), mtu_payload=1024,
                         wire_format="spead64")
        txl = UdpSender(("127.0.0.1", rx.port), mtu_payload=1024)
        tx64.send_chunk(Chunk(pa, seq=1, timestamp=11, channel_offset=5))
        txl.send_chunk(Chunk(pb, seq=2, timestamp=22, channel_offset=6))
        got = {}
        deadline = time.time() + 5
        while len(got) < 2 and time.time() < deadline:
            item = ring.acquire_read()
            if item is None:
                time.sleep(0.01)
                continue
            view, seq = item
            c = UdpReceiver.unpack(view)
            got[seq] = (c.timestamp, c.channel_offset, np.array(c.payload))
            ring.release_read()
        assert got[1][0] == 11
        np.testing.assert_array_equal(got[1][2], pa)
        assert got[2][0] == 22
        np.testing.assert_array_equal(got[2][2], pb)
        tx64.close()
        txl.close()
    finally:
        rx.stop()
        ring.close()


@pytest.mark.parametrize("mode", ["burst", "gso", "uring"])
def test_native_spead64_tx_all_engines(mode):
    """Every socket engine emits real SPEAD-64-48 at native rate
    (kFlagWire64); the dual-stack RX reassembles bit-exact."""
    import time

    import numpy as np

    from dpdk_dc_sand_tpu.stream.chunk import Chunk
    from dpdk_dc_sand_tpu.stream.ring import ChunkRing
    from dpdk_dc_sand_tpu.stream.udp import UdpReceiver
    from dpdk_dc_sand_tpu.stream.udp_native import (
        BurstUdpReceiver,
        BurstUdpSender,
        burst_available,
    )

    if not burst_available():
        pytest.skip("native toolchain unavailable")
    ring = ChunkRing(8, 1 << 20, native=True)
    try:
        try:
            rx = BurstUdpReceiver(
                ("127.0.0.1", 0), ring, mtu_payload=1024, mode=mode
            )
            tx = BurstUdpSender(
                ("127.0.0.1", rx.port), mtu_payload=1024, mode=mode,
                wire_format="spead64",
            )
        except OSError as e:
            pytest.skip(f"{mode} unsupported here: {e}")
        pay = np.random.default_rng(1).integers(
            0, 256, 50000, dtype=np.uint8
        )
        tx.send_chunk(Chunk(pay, seq=4, timestamp=99, channel_offset=3))
        got = None
        deadline = time.time() + 5
        while got is None and time.time() < deadline:
            item = ring.acquire_read()
            if item is None:
                time.sleep(0.01)
                continue
            view, seq = item
            got = (seq, UdpReceiver.unpack(view))
            ring.release_read()
        assert got is not None and got[0] == 4
        assert got[1].timestamp == 99 and got[1].channel_offset == 3
        np.testing.assert_array_equal(np.asarray(got[1].payload), pay)
        tx.close()
        rx.stop()
    finally:
        ring.close()
