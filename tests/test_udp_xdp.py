"""AF_XDP transport engine: raw-frame round trip over a veth fabric.

The descriptor-ring data plane (UMEM + TX/RX rings + eBPF port-filter
steering) exercised end-to-end: SPEAD-lite chunks packetized into raw
Eth/IPv4/UDP frames on one veth end, steered off the other end by the
XDP program into the XSK, reassembled by the shared native reassembly
into the SPSC ring — the reference's DPDK/ibverbs transport contract
(payload verification per verify.py:20-33, steering per
dpdk_recv.cpp:61-131). Skips where the kernel/capabilities forbid
AF_XDP or veth creation (documented probe, ROADMAP transport section).
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from dpdk_dc_sand_tpu.stream.chunk import Chunk
from dpdk_dc_sand_tpu.stream.ring import ChunkRing
from dpdk_dc_sand_tpu.stream.udp import UdpReceiver

udp_xdp = pytest.importorskip("dpdk_dc_sand_tpu.stream.udp_xdp")


@pytest.fixture()
def fabric():
    pair = udp_xdp.veth_pair()
    if pair is None:
        pytest.skip("cannot create a veth pair (no CAP_NET_ADMIN?)")
    try:
        yield pair
    finally:
        udp_xdp.veth_destroy(pair[0])


def test_xdp_roundtrip_chunks(fabric):
    a, b = fabric
    ring = ChunkRing(64, 1 << 20, native=True)
    try:
        rx = udp_xdp.XdpReceiver(b, 5002, ring, mtu_payload=3584)
    except OSError as e:
        pytest.skip(f"AF_XDP unavailable: {e}")
    tx = udp_xdp.XdpSender(a, "10.99.0.1", "10.99.0.2", 5002, mtu_payload=3584)
    try:
        rng = np.random.default_rng(2021)
        chunks = [
            rng.integers(0, 255, size=300_000, dtype=np.uint8)
            for _ in range(5)
        ]
        # Delivery-gated flow control: re-send chunk i until it appears
        # in the ring (the chunk.active backpressure spin of
        # dpdk_send.cpp:259-267) — correctness test, not a rate test.
        # Resends make duplicates possible; dedup by sequence number
        # (idempotent by construction: same payload).
        got = {}

        def drain():
            while True:
                r = ring.acquire_read()
                if r is None:
                    return
                view, seq = r
                chunk = UdpReceiver.unpack(view)
                got.setdefault(seq, (chunk.timestamp, chunk.payload.copy()))
                ring.release_read()

        for i, c in enumerate(chunks):
            deadline = time.time() + 10.0
            while i not in got and time.time() < deadline:
                tx.send_chunk(
                    Chunk(
                        payload=c, seq=i, timestamp=5000 + i,
                        channel_offset=i * 64,
                    )
                )
                t_wait = time.time() + 0.25
                while i not in got and time.time() < t_wait:
                    drain()
                    time.sleep(0.005)
            assert i in got, (i, tx.stats(), rx.stats())

        for i, c in enumerate(chunks):
            ts, payload = got[i]
            assert ts == 5000 + i
            np.testing.assert_array_equal(payload.view(np.uint8), c)
    finally:
        tx.close()
        rx.stop()
        ring.close()


def test_xdp_port_filter_passes_other_traffic(fabric):
    """The eBPF steering rule must only consume OUR port: packets for a
    different port pass to the stack untouched (the flow-isolate
    discipline without collateral damage)."""
    a, b = fabric
    ring = ChunkRing(8, 1 << 16, native=True)
    try:
        rx = udp_xdp.XdpReceiver(b, 5002, ring, mtu_payload=1024)
    except OSError as e:
        pytest.skip(f"AF_XDP unavailable: {e}")
    tx_other = udp_xdp.XdpSender(
        a, "10.99.0.1", "10.99.0.2", 6000, mtu_payload=1024
    )
    try:
        tx_other.send_chunk(
            Chunk(payload=np.zeros(512, np.uint8), seq=0, timestamp=0,
                  channel_offset=0)
        )
        time.sleep(0.3)
        assert rx.stats()["packets"] == 0  # not steered into our XSK
    finally:
        tx_other.close()
        rx.stop()
        ring.close()


def test_xdp_multiport_subscription(fabric):
    """Multi-stream subscription: one engine's filter steers SEVERAL
    stream endpoints (ports) into its ring — the wire-level xeng_id
    channel-slice model ("subscribe to multiple multicast streams",
    ibverbs_rx.c:207-210) — while foreign endpoints still pass.

    Senders are opened sequentially: one XSK per veth queue at a time.
    """
    a, b = fabric
    ring = ChunkRing(16, 1 << 16, native=True)
    try:
        rx = udp_xdp.XdpReceiver(b, [5003, 5004], ring, mtu_payload=1024)
    except OSError as e:
        pytest.skip(f"AF_XDP unavailable: {e}")
    rng = np.random.default_rng(3)
    payloads = {p: rng.integers(0, 255, 2048, dtype=np.uint8)
                for p in (5003, 5004, 6001)}
    got = {}

    def drain():
        while True:
            r = ring.acquire_read()
            if r is None:
                return
            view, seq = r
            c = UdpReceiver.unpack(view)
            got.setdefault(seq, (c.channel_offset, c.payload.copy()))
            ring.release_read()

    try:
        # seq encodes the slice; channel_offset encodes ownership.
        for i, p in enumerate((5003, 5004)):
            tx = udp_xdp.XdpSender(a, "10.99.0.1", "10.99.0.2", p,
                                   mtu_payload=1024)
            try:
                deadline = time.time() + 10.0
                while i not in got and time.time() < deadline:
                    tx.send_chunk(
                        Chunk(payload=payloads[p], seq=i, timestamp=0,
                              channel_offset=i * 128)
                    )
                    t_wait = time.time() + 0.25
                    while i not in got and time.time() < t_wait:
                        drain()
                        time.sleep(0.005)
            finally:
                tx.close()
            assert i in got, (p, rx.stats())
        for i, p in enumerate((5003, 5004)):
            off, payload = got[i]
            assert off == i * 128
            np.testing.assert_array_equal(payload.view(np.uint8), payloads[p])
        # A foreign endpoint is NOT steered into this engine's ring.
        before = rx.stats()["packets"]
        tx = udp_xdp.XdpSender(a, "10.99.0.1", "10.99.0.2", 6001,
                               mtu_payload=1024)
        try:
            tx.send_chunk(
                Chunk(payload=payloads[6001], seq=9, timestamp=0,
                      channel_offset=0)
            )
            time.sleep(0.3)
            drain()
        finally:
            tx.close()
        assert 9 not in got
        assert rx.stats()["packets"] == before
    finally:
        rx.stop()
        ring.close()


def test_xdp_spead64_roundtrip(fabric):
    """AF_XDP speaks real SPEAD-64-48: raw frames with SPEAD-64-48
    payloads steered by the eBPF filter and reassembled bit-exact."""
    a, b = fabric
    ring = ChunkRing(16, 1 << 20, native=True)
    try:
        rx = udp_xdp.XdpReceiver(b, 5002, ring, mtu_payload=3520)
    except OSError as e:
        pytest.skip(f"AF_XDP unavailable: {e}")
    tx = udp_xdp.XdpSender(
        a, "10.99.0.1", "10.99.0.2", 5002, mtu_payload=3520,
        wire_format="spead64",
    )
    try:
        pay = np.random.default_rng(2).integers(
            0, 256, 123456, dtype=np.uint8
        )
        got = {}
        deadline = time.time() + 10
        while not got and time.time() < deadline:
            tx.send_chunk(Chunk(pay, seq=7, timestamp=42, channel_offset=9))
            t = time.time() + 0.25
            while not got and time.time() < t:
                item = ring.acquire_read()
                if item is None:
                    time.sleep(0.005)
                    continue
                view, seq = item
                got[seq] = UdpReceiver.unpack(view)
                ring.release_read()
        assert 7 in got, rx.stats()
        c = got[7]
        assert c.timestamp == 42 and c.channel_offset == 9
        np.testing.assert_array_equal(np.asarray(c.payload), pay)
    finally:
        tx.close()
        rx.stop()
        ring.close()
