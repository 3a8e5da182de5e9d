"""Native burst UDP transport (sendmmsg / GSO / io_uring fast paths).

Python's per-datagram ``sendto`` loop tops out well under a Gbps; the
reference's data plane bursts 32 packets per call into the NIC
(dpdk_send.cpp:273-315, ``rte_eth_tx_burst``). This wraps the native
engines (:mod:`dpdk_dc_sand_tpu.native` ``udp_burst.cpp``): sendmmsg
bursts, UDP_SEGMENT/UDP_GRO segmentation offload (~15 wire packets per
kernel stack traversal, ~480 per syscall), or an io_uring
submission-queue ring (the descriptor-ring model of ibverbs_tx.c:255-262)
— header build + heap reassembly in C++, completed chunks delivered
straight into the native SPSC ring. Python touches data only at chunk
granularity, exactly like the reference's chunked zero-copy pipeline.
Measured rates: see benchmarks/udp_rate_bench.py (committed artifact
benchmarks/UDP_RATE.json).

API mirrors :mod:`dpdk_dc_sand_tpu.stream.udp`; ring slot layout is
identical (16-byte timestamp/channel_offset prefix + payload), so
consumers use ``UdpReceiver.unpack`` unchanged.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from dpdk_dc_sand_tpu.native import load_native
from dpdk_dc_sand_tpu.stream.chunk import Chunk
from dpdk_dc_sand_tpu.stream.ring import ChunkRing


def burst_available() -> bool:
    """Whether the native burst engine can be used on this host."""
    return load_native() is not None


#: Engine selection: mode name -> native mode id.
_MODES = {"burst": 0, "gso": 1, "uring": 2}


def _resolve_mode(mode: str) -> list[int]:
    """Candidate native mode ids, best first (``auto`` tries gso→burst)."""
    if mode == "auto":
        return [_MODES["gso"], _MODES["burst"]]
    if mode not in _MODES:
        raise ValueError(f"unknown transport mode {mode!r}")
    return [_MODES[mode]]


class BurstUdpSender:
    """Chunk transmitter over the native kernel fast paths.

    ``mode``: ``"auto"`` (GSO segmentation offload when the kernel
    supports it, else sendmmsg), ``"burst"`` (sendmmsg), ``"gso"``
    (UDP_SEGMENT super-datagrams), or ``"uring"`` (io_uring submission
    ring).
    """

    def __init__(
        self,
        dest: Tuple[str, int],
        mtu_payload: int = 4096,
        mode: str = "auto",
        wire_format: str = "lite",
    ) -> None:
        lib = load_native()
        if lib is None:
            raise RuntimeError("native toolchain unavailable; use stream.udp")
        if wire_format not in ("lite", "spead64"):
            raise ValueError(f"unknown wire_format {wire_format!r}")
        self._lib = lib
        self.dest = dest
        self.mtu_payload = mtu_payload
        #: "spead64" emits real SPEAD-64-48 packets at native rate
        #: (spead_codec.cpp sp64_packetize; OR'd kFlagWire64 mode bit).
        self.wire_format = wire_format
        flag = 0x200 if wire_format == "spead64" else 0
        self._h = ctypes.c_void_p()
        for m in _resolve_mode(mode):
            self._h = ctypes.c_void_p(
                lib.ub_sender_create_mode(
                    dest[0].encode(), dest[1], mtu_payload, m | flag
                )
            )
            if self._h:
                break
        if not self._h:
            raise OSError(f"cannot open UDP sender to {dest} (mode={mode})")
        self.mode = {v: k for k, v in _MODES.items()}[
            lib.ub_sender_mode(self._h)
        ]

    def send_chunk(self, chunk: Chunk) -> int:
        payload = np.ascontiguousarray(chunk.payload).view(np.uint8).ravel()
        n = self._lib.ub_send_chunk(
            self._h,
            payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            payload.nbytes,
            chunk.seq,
            chunk.timestamp,
            chunk.channel_offset,
        )
        if n < 0:
            raise OSError("ub_send_chunk failed")
        return int(n)

    def stats(self) -> Tuple[int, int]:
        """(packets, bytes) sent."""
        p, b = ctypes.c_uint64(), ctypes.c_uint64()
        self._lib.ub_sender_stats(self._h, ctypes.byref(p), ctypes.byref(b))
        return p.value, b.value

    def close(self) -> None:
        if self._h:
            self._lib.ub_sender_destroy(self._h)
            self._h = ctypes.c_void_p()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


class BurstUdpReceiver:
    """Burst receiver: C++ thread drains the socket, reassembles heaps,
    and delivers completed chunks into ``ring`` (which must be native)."""

    def __init__(
        self,
        bind: Tuple[str, int],
        ring: ChunkRing,
        mtu_payload: int = 4096,
        group: Optional[str] = None,
        mode: str = "auto",
        reuse_port: bool = False,
    ) -> None:
        lib = load_native()
        if lib is None:
            raise RuntimeError("native toolchain unavailable; use stream.udp")
        if getattr(ring, "_lib", None) is None:
            raise ValueError("BurstUdpReceiver needs a native ChunkRing")
        self._lib = lib
        self.ring = ring
        self._h = ctypes.c_void_p()
        # reuse_port: N worker receivers share one port (the multi-queue
        # RSS analog); the kernel flow-hashes by 4-tuple, so each TX
        # socket's heaps land wholly on one worker and reassembly stays
        # per-worker. OR'd into the native mode word (kFlagReusePort).
        flag = 0x100 if reuse_port else 0
        for m in _resolve_mode(mode):
            self._h = ctypes.c_void_p(
                lib.ub_receiver_create_mode(
                    bind[0].encode(),
                    bind[1],
                    group.encode() if group else None,
                    mtu_payload,
                    ring._ring,
                    m | flag,
                )
            )
            if self._h:
                break
        if not self._h:
            raise OSError(f"cannot bind UDP receiver on {bind} (mode={mode})")
        self.mode = {v: k for k, v in _MODES.items()}[
            lib.ub_receiver_mode(self._h)
        ]

    @property
    def port(self) -> int:
        return int(self._lib.ub_receiver_port(self._h))

    def stats(self) -> dict:
        vals = [ctypes.c_uint64() for _ in range(5)]
        self._lib.ub_receiver_stats(self._h, *map(ctypes.byref, vals))
        keys = ("packets", "bytes", "heaps", "ring_drops", "evicted")
        return dict(zip(keys, (v.value for v in vals)))

    def stop(self) -> None:
        if self._h:
            self._lib.ub_receiver_destroy(self._h)
            self._h = ctypes.c_void_p()

    close = stop

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.stop()
        except Exception:
            pass
