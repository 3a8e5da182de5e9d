// Native UDP burst data plane — the kernel-socket fast path.
//
// The reference moves sample streams with kernel-bypass burst I/O:
// `rte_eth_tx_burst` of 32 packets (dpdk_send_recv/dpdk_send.cpp:273-315)
// and 2048-deep RX rings drained in bursts (ibverbs_rx.c:282-335). The
// portable-socket equivalent of burst I/O is sendmmsg/recvmmsg: one
// syscall per 32-64 packets instead of one per packet, which is the
// difference between ~0.5 Gbps (python sendto loop) and saturating a
// multi-Gbps kernel path. Heap reassembly (SPEAD-lite, see
// spead_codec.cpp) runs here too, delivering only completed chunks into
// the SPSC ring (ringbuffer.cpp) — Python never touches per-packet work.
//
// C ABI for ctypes. No exceptions across the boundary.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/uio.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <thread>

extern "C" {
// From ringbuffer.cpp / spead_codec.cpp (same shared library).
std::uint8_t* rb_acquire_write(void* r);
void rb_commit_write(void* r, std::uint64_t nbytes, std::uint64_t seq);
void rb_count_drop(void* r);
std::uint64_t rb_slot_bytes(const void* r);
std::uint64_t sp_header_bytes();
std::uint64_t sp_packetize(const std::uint8_t* payload, std::uint64_t heap_len,
                           std::uint64_t heap_id, std::uint64_t timestamp,
                           std::uint32_t channel_offset,
                           std::uint64_t mtu_payload, std::uint8_t* out,
                           std::uint64_t out_stride);
int sp_parse_header(const std::uint8_t* pkt, std::uint64_t pkt_len,
                    std::uint64_t* heap_id, std::uint64_t* timestamp,
                    std::uint32_t* channel_offset, std::uint16_t* packet_idx,
                    std::uint16_t* n_packets, std::uint32_t* payload_len,
                    std::uint32_t* heap_len);
}

namespace {

constexpr int kBurst = 32;          // packets per sendmmsg/recvmmsg call
constexpr int kInflightHeaps = 8;   // concurrent partially-assembled heaps

bool is_multicast(const char* ip) {
  in_addr a{};
  if (inet_pton(AF_INET, ip, &a) != 1) return false;
  std::uint32_t host = ntohl(a.s_addr);
  return host >= 0xE0000000u && host <= 0xEFFFFFFFu;
}

struct Sender {
  int fd = -1;
  std::uint64_t mtu_payload = 0;
  std::uint64_t stride = 0;       // header + mtu_payload, per staged packet
  std::uint8_t* stage = nullptr;  // kBurst staged packets
  std::atomic<std::uint64_t> packets{0};
  std::atomic<std::uint64_t> bytes{0};
};

struct HeapSlot {
  std::uint64_t heap_id = ~0ull;
  std::uint64_t timestamp = 0;
  std::uint32_t channel_offset = 0;
  std::uint32_t heap_len = 0;
  std::uint16_t n_packets = 0;
  std::uint16_t received = 0;
  std::uint8_t* buf = nullptr;  // heap payload assembly
};

struct Receiver {
  int fd = -1;
  std::uint64_t mtu_payload = 0;
  void* ring = nullptr;
  std::uint64_t slot_bytes = 0;
  HeapSlot heaps[kInflightHeaps];
  std::uint8_t* pkt_arena = nullptr;  // kBurst receive buffers
  std::thread thread;
  std::atomic<bool> stop{false};
  std::atomic<std::uint64_t> packets{0};
  std::atomic<std::uint64_t> bytes{0};
  std::atomic<std::uint64_t> heaps_done{0};
  std::atomic<std::uint64_t> ring_drops{0};
  std::atomic<std::uint64_t> evicted{0};  // incomplete heaps overwritten
};

void deliver(Receiver* rx, HeapSlot& h) {
  // Ring slot layout matches stream.udp.UdpReceiver._deliver: a 16-byte
  // little-endian (timestamp, channel_offset) prefix, then the payload.
  std::uint8_t* slot = rb_acquire_write(rx->ring);
  if (!slot || 16 + h.heap_len > rx->slot_bytes) {
    rb_count_drop(rx->ring);
    rx->ring_drops.fetch_add(1, std::memory_order_relaxed);
    return;
  }
  std::uint64_t meta[2] = {h.timestamp, h.channel_offset};
  std::memcpy(slot, meta, 16);
  std::memcpy(slot + 16, h.buf, h.heap_len);
  rb_commit_write(rx->ring, 16 + h.heap_len, h.heap_id);
  rx->heaps_done.fetch_add(1, std::memory_order_relaxed);
}

void feed_packet(Receiver* rx, const std::uint8_t* pkt, std::uint64_t len) {
  std::uint64_t heap_id, timestamp;
  std::uint32_t channel_offset, payload_len, heap_len;
  std::uint16_t packet_idx, n_packets;
  if (!sp_parse_header(pkt, len, &heap_id, &timestamp, &channel_offset,
                       &packet_idx, &n_packets, &payload_len, &heap_len))
    return;
  if (heap_len > rx->slot_bytes - 16) return;  // cannot ever deliver
  HeapSlot& h = rx->heaps[heap_id % kInflightHeaps];
  if (h.heap_id != heap_id) {
    if (h.heap_id != ~0ull && h.received > 0 && h.received < h.n_packets)
      rx->evicted.fetch_add(1, std::memory_order_relaxed);
    h.heap_id = heap_id;
    h.timestamp = timestamp;
    h.channel_offset = channel_offset;
    h.heap_len = heap_len;
    h.n_packets = n_packets;
    h.received = 0;
  }
  std::uint64_t off =
      static_cast<std::uint64_t>(packet_idx) * rx->mtu_payload;
  if (off + payload_len > h.heap_len) return;
  std::memcpy(h.buf + off, pkt + sp_header_bytes(), payload_len);
  h.received++;
  if (h.received == h.n_packets) {
    deliver(rx, h);
    h.heap_id = ~0ull;
    h.received = 0;
  }
}

void rx_loop(Receiver* rx) {
  const std::uint64_t pkt_cap = sp_header_bytes() + rx->mtu_payload;
  mmsghdr msgs[kBurst];
  iovec iovs[kBurst];
  while (!rx->stop.load(std::memory_order_relaxed)) {
    std::memset(msgs, 0, sizeof(msgs));
    for (int i = 0; i < kBurst; ++i) {
      iovs[i].iov_base = rx->pkt_arena + i * pkt_cap;
      iovs[i].iov_len = pkt_cap;
      msgs[i].msg_hdr.msg_iov = &iovs[i];
      msgs[i].msg_hdr.msg_iovlen = 1;
    }
    int n = recvmmsg(rx->fd, msgs, kBurst, MSG_WAITFORONE, nullptr);
    if (n <= 0) continue;  // timeout (SO_RCVTIMEO) or transient error
    std::uint64_t nbytes = 0;
    for (int i = 0; i < n; ++i) {
      feed_packet(rx, rx->pkt_arena + i * pkt_cap, msgs[i].msg_len);
      nbytes += msgs[i].msg_len;
    }
    rx->packets.fetch_add(n, std::memory_order_relaxed);
    rx->bytes.fetch_add(nbytes, std::memory_order_relaxed);
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- sender

void* ub_sender_create(const char* ip, std::uint16_t port,
                       std::uint64_t mtu_payload) {
  if (!ip || mtu_payload == 0) return nullptr;
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return nullptr;
  sockaddr_in dst{};
  dst.sin_family = AF_INET;
  dst.sin_port = htons(port);
  if (inet_pton(AF_INET, ip, &dst.sin_addr) != 1 ||
      connect(fd, reinterpret_cast<sockaddr*>(&dst), sizeof(dst)) != 0) {
    close(fd);
    return nullptr;
  }
  if (is_multicast(ip)) {
    int ttl = 1, loop = 1;
    setsockopt(fd, IPPROTO_IP, IP_MULTICAST_TTL, &ttl, sizeof(ttl));
    setsockopt(fd, IPPROTO_IP, IP_MULTICAST_LOOP, &loop, sizeof(loop));
  }
  int sndbuf = 8 << 20;
  setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sndbuf, sizeof(sndbuf));
  auto* s = new (std::nothrow) Sender();
  if (!s) {
    close(fd);
    return nullptr;
  }
  s->fd = fd;
  s->mtu_payload = mtu_payload;
  s->stride = sp_header_bytes() + mtu_payload;
  s->stage = static_cast<std::uint8_t*>(std::malloc(kBurst * s->stride));
  if (!s->stage) {
    close(fd);
    delete s;
    return nullptr;
  }
  return s;
}

// Packetize one chunk and transmit it in bursts of kBurst datagrams per
// sendmmsg. Blocking socket => lossless backpressure (the
// tx_done_cleanup spin of dpdk_send.cpp:259-267). Returns packets sent,
// or -1 on error.
long long ub_send_chunk(void* handle, const std::uint8_t* payload,
                        std::uint64_t heap_len, std::uint64_t heap_id,
                        std::uint64_t timestamp,
                        std::uint32_t channel_offset) {
  auto* s = static_cast<Sender*>(handle);
  if (!s || !payload) return -1;
  std::uint64_t total =
      (heap_len + s->mtu_payload - 1) / s->mtu_payload;
  if (total == 0) total = 1;
  if (total > 0xFFFF) return -1;
  std::uint64_t sent_total = 0, sent_bytes = 0;
  for (std::uint64_t base = 0; base < total; base += kBurst) {
    int count = static_cast<int>(
        total - base < kBurst ? total - base : kBurst);
    // Stage headers+slices for this burst. sp_packetize writes packets
    // for the WHOLE heap given offset bookkeeping, so stage per-packet.
    mmsghdr msgs[kBurst];
    iovec iovs[kBurst];
    std::memset(msgs, 0, sizeof(mmsghdr) * count);
    for (int i = 0; i < count; ++i) {
      std::uint64_t pkt_idx = base + i;
      std::uint64_t off = pkt_idx * s->mtu_payload;
      std::uint64_t len = heap_len - off < s->mtu_payload
                              ? heap_len - off
                              : s->mtu_payload;
      // Reuse the codec for the header by packetizing a 1-packet view:
      // cheaper to write the header inline via sp_packetize on the slice
      // would renumber packet_idx, so build the full header here through
      // the codec's packetize of the whole heap is O(heap); instead call
      // sp_packetize once per packet on its own slice and patch idx/n.
      std::uint8_t* dst = s->stage + i * s->stride;
      sp_packetize(payload + off, len, heap_id, timestamp, channel_offset,
                   s->mtu_payload, dst, s->stride);
      // Patch packet_idx (offset 24) / n_packets (26) / heap_len (32).
      std::uint16_t idx16 = static_cast<std::uint16_t>(pkt_idx);
      std::uint16_t n16 = static_cast<std::uint16_t>(total);
      std::uint32_t hl32 = static_cast<std::uint32_t>(heap_len);
      std::memcpy(dst + 24, &idx16, 2);
      std::memcpy(dst + 26, &n16, 2);
      std::memcpy(dst + 32, &hl32, 4);
      iovs[i].iov_base = dst;
      iovs[i].iov_len = sp_header_bytes() + len;
      msgs[i].msg_hdr.msg_iov = &iovs[i];
      msgs[i].msg_hdr.msg_iovlen = 1;
      sent_bytes += iovs[i].iov_len;
    }
    int done = 0;
    while (done < count) {
      int n = sendmmsg(s->fd, msgs + done, count - done, 0);
      if (n < 0) return -1;
      done += n;
    }
    sent_total += count;
  }
  s->packets.fetch_add(sent_total, std::memory_order_relaxed);
  s->bytes.fetch_add(sent_bytes, std::memory_order_relaxed);
  return static_cast<long long>(sent_total);
}

void ub_sender_stats(void* handle, std::uint64_t* packets,
                     std::uint64_t* bytes) {
  auto* s = static_cast<Sender*>(handle);
  if (!s) return;
  if (packets) *packets = s->packets.load(std::memory_order_relaxed);
  if (bytes) *bytes = s->bytes.load(std::memory_order_relaxed);
}

void ub_sender_destroy(void* handle) {
  auto* s = static_cast<Sender*>(handle);
  if (!s) return;
  close(s->fd);
  std::free(s->stage);
  delete s;
}

// -------------------------------------------------------------- receiver

void* ub_receiver_create(const char* bind_ip, std::uint16_t port,
                         const char* group, std::uint64_t mtu_payload,
                         void* ring) {
  if (!bind_ip || mtu_payload == 0 || !ring) return nullptr;
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return nullptr;
  int reuse = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
  int rcvbuf = 16 << 20;  // deep RX ring analog (ibverbs_rx.c:155-217)
  setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
  timeval tv{0, 50000};  // 50 ms poll for stop flag
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  if (inet_pton(AF_INET, bind_ip, &addr.sin_addr) != 1 ||
      bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    close(fd);
    return nullptr;
  }
  if (group && is_multicast(group)) {
    ip_mreq mreq{};
    inet_pton(AF_INET, group, &mreq.imr_multiaddr);
    mreq.imr_interface.s_addr = htonl(INADDR_ANY);
    setsockopt(fd, IPPROTO_IP, IP_ADD_MEMBERSHIP, &mreq, sizeof(mreq));
  }
  auto* rx = new (std::nothrow) Receiver();
  if (!rx) {
    close(fd);
    return nullptr;
  }
  rx->fd = fd;
  rx->mtu_payload = mtu_payload;
  rx->ring = ring;
  rx->slot_bytes = rb_slot_bytes(ring);
  std::uint64_t pkt_cap = sp_header_bytes() + mtu_payload;
  rx->pkt_arena = static_cast<std::uint8_t*>(std::malloc(kBurst * pkt_cap));
  bool ok = rx->pkt_arena != nullptr;
  for (auto& h : rx->heaps) {
    h.buf = static_cast<std::uint8_t*>(std::malloc(rx->slot_bytes));
    ok = ok && h.buf;
  }
  if (!ok) {
    for (auto& h : rx->heaps) std::free(h.buf);
    std::free(rx->pkt_arena);
    close(fd);
    delete rx;
    return nullptr;
  }
  rx->thread = std::thread(rx_loop, rx);
  return rx;
}

std::uint16_t ub_receiver_port(void* handle) {
  auto* rx = static_cast<Receiver*>(handle);
  if (!rx) return 0;
  sockaddr_in addr{};
  socklen_t len = sizeof(addr);
  if (getsockname(rx->fd, reinterpret_cast<sockaddr*>(&addr), &len) != 0)
    return 0;
  return ntohs(addr.sin_port);
}

void ub_receiver_stats(void* handle, std::uint64_t* packets,
                       std::uint64_t* bytes, std::uint64_t* heaps,
                       std::uint64_t* ring_drops, std::uint64_t* evicted) {
  auto* rx = static_cast<Receiver*>(handle);
  if (!rx) return;
  if (packets) *packets = rx->packets.load(std::memory_order_relaxed);
  if (bytes) *bytes = rx->bytes.load(std::memory_order_relaxed);
  if (heaps) *heaps = rx->heaps_done.load(std::memory_order_relaxed);
  if (ring_drops) *ring_drops = rx->ring_drops.load(std::memory_order_relaxed);
  if (evicted) *evicted = rx->evicted.load(std::memory_order_relaxed);
}

void ub_receiver_destroy(void* handle) {
  auto* rx = static_cast<Receiver*>(handle);
  if (!rx) return;
  rx->stop.store(true);
  if (rx->thread.joinable()) rx->thread.join();
  close(rx->fd);
  for (auto& h : rx->heaps) std::free(h.buf);
  std::free(rx->pkt_arena);
  delete rx;
}

}  // extern "C"
