"""Transport-layer tests.

Mirrors the reference's transport verification strategy (SURVEY.md §4.4):
deterministic payload patterns checked after the trip (verify.py:20-33),
drop accounting from sequence gaps (ibverbs_rx.c:303-319), and ring
backpressure semantics (dpdk_send.cpp:258-272).
"""

import time

import numpy as np
import pytest

from dpdk_dc_sand_tpu.stream import (
    Chunk,
    ChunkRing,
    HeapAssembler,
    packetize,
    parse_header,
)
from dpdk_dc_sand_tpu.stream.chunk import StreamStats
from dpdk_dc_sand_tpu.stream.feed import DeviceFeed, RateReporter
from dpdk_dc_sand_tpu.stream.spead import check_pattern, fill_pattern
from dpdk_dc_sand_tpu.stream.udp import UdpReceiver, UdpSender

RNG = np.random.default_rng(2021)


@pytest.fixture(params=["native", "python"])
def ring(request):
    native = request.param == "native"
    try:
        r = ChunkRing(4, 1024, native=native)
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    yield r
    r.close()


class TestChunkRing:
    def test_fifo_roundtrip(self, ring):
        for seq in range(3):
            data = np.full(100, seq, np.uint8)
            assert ring.put(data, seq)
        assert len(ring) == 3
        for seq in range(3):
            view, got_seq = ring.acquire_read()
            assert got_seq == seq
            assert view.shape == (100,)
            assert (view == seq).all()
            ring.release_read()
        assert ring.acquire_read() is None

    def test_backpressure_and_drop_accounting(self, ring):
        data = np.zeros(64, np.uint8)
        for seq in range(4):
            assert ring.put(data, seq)
        assert ring.acquire_write() is None  # full
        assert not ring.put(data, 4)  # drop counted
        produced, consumed, dropped = ring.stats()
        assert produced == 4 and dropped == 1
        ring.acquire_read()
        ring.release_read()
        assert ring.put(data, 5)  # slot freed

    def test_zero_copy_write(self, ring):
        buf = ring.acquire_write()
        buf[:8] = np.arange(8, dtype=np.uint8)
        ring.commit_write(8, 7)
        view, seq = ring.acquire_read()
        assert seq == 7
        np.testing.assert_array_equal(view, np.arange(8, dtype=np.uint8))
        ring.release_read()

    def test_oversize_rejected(self, ring):
        assert not ring.put(np.zeros(5000, np.uint8), 0)
        assert ring.stats()[2] == 1


class TestSpeadCodec:
    def test_packetize_roundtrip(self):
        payload = RNG.integers(0, 255, 10_000, dtype=np.uint8)
        pkts = packetize(payload, heap_id=3, timestamp=123456, channel_offset=64)
        assert len(pkts) == 3  # 4096 + 4096 + 1808
        hdr = parse_header(pkts[0])
        assert (hdr.heap_id, hdr.timestamp, hdr.channel_offset) == (3, 123456, 64)
        assert hdr.n_packets == 3 and hdr.heap_len == 10_000

        asm = HeapAssembler()
        out = None
        for p in pkts:
            out = asm.feed(p) or out
        assert out is not None
        np.testing.assert_array_equal(out.payload, payload)
        assert out.timestamp == 123456 and out.channel_offset == 64

    def test_out_of_order_reassembly(self):
        payload = RNG.integers(0, 255, 9000, dtype=np.uint8)
        pkts = packetize(payload, heap_id=1)
        asm = HeapAssembler()
        out = None
        for p in reversed(pkts):
            out = asm.feed(p) or out
        np.testing.assert_array_equal(out.payload, payload)

    def test_heap_gap_counts_losses(self):
        asm = HeapAssembler()
        for heap_id in (0, 1, 4):  # 2, 3 lost
            for p in packetize(np.zeros(100, np.uint8), heap_id):
                asm.feed(p)
        assert asm.stats.lost == 2
        assert asm.stats.consumed == 3

    def test_incomplete_heap_evicted(self):
        asm = HeapAssembler(window=2)
        pkts = packetize(np.zeros(9000, np.uint8), heap_id=0)
        asm.feed(pkts[0])  # heap 0 partial
        for heap_id in (1, 2, 3):
            for p in packetize(np.zeros(100, np.uint8), heap_id):
                asm.feed(p)
        assert asm.incomplete_dropped == 1

    def test_malformed_packet_ignored(self):
        asm = HeapAssembler()
        assert asm.feed(b"garbage") is None
        assert parse_header(b"\x00" * 40) is None

    def test_pattern_contract(self):
        words = fill_pattern(512, chunk_id=7, counter=99)
        assert words[0] == 99
        assert words[1] == (7 << 32) + 1
        assert check_pattern(words, 7) == 0
        words[100] ^= np.uint64(1)
        assert check_pattern(words, 7) == 1


class TestStreamStats:
    def test_gap_accounting(self):
        st = StreamStats()
        for seq in (0, 1, 5, 6):
            st.observe(seq, 10)
        assert st.lost == 3
        assert st.consumed == 4
        assert st.bytes == 40


class TestUdpTransport:
    def test_localhost_roundtrip_with_pattern(self):
        ring = ChunkRing(16, 70000)
        rx = UdpReceiver(("127.0.0.1", 0), ring).start()
        tx = UdpSender(("127.0.0.1", rx.port))
        try:
            sent = {}
            for seq in range(5):
                words = fill_pattern(4096, seq, counter=seq)
                sent[seq] = words
                tx.send_chunk(Chunk(words.view(np.uint8), seq=seq, timestamp=seq * 100))
            deadline = time.time() + 5
            got = 0
            while got < 5 and time.time() < deadline:
                item = ring.acquire_read()
                if item is None:
                    time.sleep(0.01)
                    continue
                view, seq = item
                chunk = UdpReceiver.unpack(view)
                assert chunk.timestamp == seq * 100
                words = np.ascontiguousarray(chunk.payload).view(np.uint64)
                assert check_pattern(words, seq) == 0
                ring.release_read()
                got += 1
            assert got == 5, f"only {got}/5 chunks arrived"
            assert rx.assembler.stats.lost == 0
        finally:
            tx.close()
            rx.stop()
            ring.close()


class TestDeviceFeed:
    def test_feed_moves_chunks_to_device(self):
        import jax

        ring = ChunkRing(8, 4096)
        feed = DeviceFeed(
            ring, reshape=lambda b: b.view(np.int8).reshape(-1, 64)
        ).start()
        try:
            for seq in range(3):
                ring.put(np.full(4096, seq, np.uint8), seq)
            seen = []
            for _ in range(3):
                arr, seq = feed.get(timeout=5)
                assert isinstance(arr, jax.Array)
                assert arr.shape == (64, 64)
                seen.append(seq)
            assert seen == [0, 1, 2]
            assert feed.stats.lost == 0
        finally:
            feed.stop()
            ring.close()

    def test_feed_counts_gaps(self):
        ring = ChunkRing(8, 256)
        feed = DeviceFeed(ring).start()
        try:
            ring.put(np.zeros(16, np.uint8), 0)
            ring.put(np.zeros(16, np.uint8), 3)  # 1, 2 lost upstream
            feed.get(timeout=5)
            feed.get(timeout=5)
            assert feed.stats.lost == 2
        finally:
            feed.stop()
            ring.close()


class TestRateReporter:
    def test_reports_at_interval(self):
        lines = []
        t = [0.0]
        rep = RateReporter(interval_s=1.0, sink=lines.append, clock=lambda: t[0])
        rep.account(1000)
        assert not lines
        t[0] = 1.5
        rep.account(500)
        assert len(lines) == 1
        assert "Gbps" in lines[0]


class TestUdpBeamEgress:
    def test_beams_ship_as_int8_heaps(self):
        from dpdk_dc_sand_tpu.stream.feed import UdpBeamEgress

        sent = []

        class FakeSender:
            def send_chunk(self, chunk):
                sent.append(chunk)

        egress = UdpBeamEgress(FakeSender(), samples_per_chunk=4096, scale=0.5)
        beams = RNG.normal(scale=100, size=(2, 8, 4, 2, 2)).astype(np.float32)
        egress(beams, seq=3)
        assert len(sent) == 1
        chunk = sent[0]
        assert chunk.seq == 3 and chunk.timestamp == 3 * 4096
        got = chunk.payload.view(np.int8).reshape(beams.shape)
        want = np.clip(np.rint(beams * 0.5), -127, 127).astype(np.int8)
        np.testing.assert_array_equal(got, want)
