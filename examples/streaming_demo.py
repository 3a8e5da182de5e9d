"""End-to-end transport demo through the public API: pattern chunks ->
SPEAD-lite UDP -> receiver reassembly -> ChunkRing -> DeviceFeed -> jax
device array, with drop stats. Plus probes: a deliberately lost packet and
a corrupted datagram."""
import time
import numpy as np
from dpdk_dc_sand_tpu.stream import Chunk, ChunkRing, UdpReceiver, UdpSender
from dpdk_dc_sand_tpu.stream.feed import DeviceFeed, RateReporter
from dpdk_dc_sand_tpu.stream.spead import check_pattern, fill_pattern, packetize

ring = ChunkRing(32, 70000)
lines = []
rx = UdpReceiver(("127.0.0.1", 0), ring).start()
tx = UdpSender(("127.0.0.1", rx.port), reporter=RateReporter(0.1, lines.append))
feed = DeviceFeed(ring, reshape=lambda b: b[16:].copy()).start()

n_ok = 0
for seq in range(8):
    words = fill_pattern(4096, seq, counter=seq)
    tx.send_chunk(Chunk(words.view(np.uint8), seq=seq, timestamp=seq * 4096))
    time.sleep(0.01)

# probe 1: drop one packet of heap 8 on purpose (simulate loss)
pkts = packetize(fill_pattern(4096, 8).view(np.uint8), heap_id=8)
for p in pkts[:-1]:
    tx.sock.sendto(p, tx.dest)
# probe 2: corrupted garbage datagram
tx.sock.sendto(b"\xde\xad\xbe\xef" * 10, tx.dest)
# heap 9 complete again
tx.send_chunk(Chunk(fill_pattern(4096, 9).view(np.uint8), seq=9))

got = []
deadline = time.time() + 10
while len(got) < 9 and time.time() < deadline:
    try:
        arr, seq = feed.get(timeout=0.5)
    except Exception:
        continue
    got.append(seq)
    if seq <= 7:
        words = np.asarray(arr).view(np.uint64)
        assert check_pattern(words, seq) == 0, f"pattern corrupt in chunk {seq}"
        n_ok += 1

print("received seqs:", got)
print("pattern-verified chunks:", n_ok)
print("assembler stats: lost heaps =", rx.assembler.stats.lost,
      "| consumer-side seq gaps (feed) =", feed.stats.lost)
print("rate report sample:", lines[0] if lines else "(interval not hit)")
assert got == [0,1,2,3,4,5,6,7,9], got
assert feed.stats.lost == 1  # heap 8 never completed -> gap seen at feed
tx.close(); rx.stop(); feed.stop(); ring.close()
print("OK: end-to-end UDP->ring->device chain with loss accounting")
