"""Async device feed and rate reporting.

Replaces the reference's NIC→GPU ingest path with host→HBM: a producer
fills a :class:`ChunkRing`, a feeder thread moves committed chunks onto
the device (``jax.device_put``) keeping a small prefetch queue, and the
pipeline consumes device arrays — double-buffered exactly like the
reference's chunk reuse gating (dpdk_send.cpp:248-267) and spead2 frame
futures (fgpu_send_prototype.py:101-109). Rates are reported every
interval as the transport loops do (dpdk_recv.cpp:246-253).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Optional

import numpy as np

from dpdk_dc_sand_tpu.stream.chunk import Chunk, StreamStats
from dpdk_dc_sand_tpu.stream.ring import ChunkRing


class RateReporter:
    """Per-interval packet/byte rate reporting (dpdk_recv.cpp:199-253)."""

    def __init__(
        self,
        interval_s: float = 1.0,
        sink: Optional[Callable[[str], None]] = None,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.interval_s = interval_s
        self.sink = sink or (lambda line: print(line, flush=True))
        self.clock = clock
        self._t0 = clock()
        self._chunks = 0
        self._bytes = 0

    def account(self, nbytes: int) -> None:
        self._chunks += 1
        self._bytes += nbytes
        now = self.clock()
        dt = now - self._t0
        if dt >= self.interval_s:
            self.sink(
                f"rate: {self._chunks / dt:.1f} chunks/s, "
                f"{self._bytes * 8 / dt / 1e9:.3f} Gbps"
            )
            self._t0 = now
            self._chunks = 0
            self._bytes = 0


class DeviceFeed:
    """Ring → device prefetcher with sequence-gap loss accounting.

    Parameters
    ----------
    ring:
        Source ring (producer side owned by the caller).
    reshape:
        Optional callable turning a raw uint8 payload view into the typed
        array to put on device (e.g. ``lambda b: b.view(np.int8).reshape(shape)``).
        Applied before the copy to device; the view is only borrowed.
    depth:
        Device-side prefetch depth (2 = classic double buffering).
    """

    def __init__(
        self,
        ring: ChunkRing,
        reshape: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        depth: int = 2,
        reporter: Optional[RateReporter] = None,
        device=None,
    ) -> None:
        self.ring = ring
        self.reshape = reshape or (lambda b: b)
        self.depth = depth
        self.reporter = reporter
        self.device = device
        self.stats = StreamStats()
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "DeviceFeed":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        import jax

        while not self._stop.is_set():
            item = self.ring.acquire_read()
            if item is None:
                time.sleep(50e-6)  # idle wait (epoll analog, dpdk_recv.cpp:230-244)
                continue
            view, seq = item
            try:
                host = np.array(self.reshape(view))  # copy out of the slot
            except Exception:  # noqa: BLE001 - malformed chunk must not
                # kill the feed thread: a wrong-sized or corrupt chunk is
                # a data-plane fault to ACCOUNT (the drop-counter
                # discipline, ibverbs_rx.c:303-319), not a crash. The
                # slot is released and the stream continues.
                self.stats.malformed += 1
                self.ring.release_read()
                continue
            self.ring.release_read()
            arr = (
                jax.device_put(host, self.device)
                if self.device is not None
                else jax.device_put(host)
            )
            self.stats.observe(seq, host.nbytes)
            if self.reporter is not None:
                self.reporter.account(host.nbytes)
            while not self._stop.is_set():
                try:
                    self._q.put((arr, seq), timeout=0.05)
                    break
                except queue.Full:
                    continue

    def get(self, timeout: Optional[float] = None):
        """Next (device_array, seq); blocks up to ``timeout``."""
        return self._q.get(timeout=timeout)

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)


class UdpBeamEgress:
    """Beam-output egress: requantise-and-packetize onto a UDP sender.

    The F/B-engine transmit side of the reference (beam output send, L4;
    fgpu_send_prototype.py's double-buffered heap pattern): plug an
    instance into :class:`~dpdk_dc_sand_tpu.engine_node.EngineNode` as
    ``on_beams``. Beams are scaled to int8 transport format and shipped
    as one SPEAD-lite heap per step with the step's ADC timestamp.
    """

    def __init__(
        self, sender, samples_per_chunk: int, scale: float | None = 0.25
    ):
        self.sender = sender
        self.samples_per_chunk = samples_per_chunk
        #: Host-side requantisation gain; ``None`` means the beams arrive
        #: already int8 (device-side ``FBEngine(beam_quant_scale=…)``) and
        #: ship as-is — no extra host pass over the payload.
        self.scale = scale

    def __call__(self, beams: np.ndarray, seq: int) -> None:
        from dpdk_dc_sand_tpu.golden.requant import requantise
        from dpdk_dc_sand_tpu.stream.chunk import Chunk

        if self.scale is None:
            if beams.dtype != np.int8:
                raise TypeError(
                    "scale=None expects device-quantised int8 beams, got "
                    f"{beams.dtype}"
                )
            payload = beams.ravel()
        else:
            payload = requantise(beams, self.scale).ravel()
        self.sender.send_chunk(
            Chunk(
                payload.view(np.uint8),
                seq=seq,
                timestamp=seq * self.samples_per_chunk,
            )
        )


class UdpVisEgress:
    """Visibility-dump egress: integrated f32 visibilities onto UDP.

    The X-engine transmit side: plug into
    :class:`~dpdk_dc_sand_tpu.engine_node.EngineNode` as
    ``on_visibilities``. Each integrated window ships as one SPEAD-lite
    heap — payload ``[C, I, I, 2]`` float32 (re, im stacked trailing),
    heap id = the window's first chunk sequence number, timestamp = that
    chunk's first ADC sample (the SPEAD 0x1600 convention).
    """

    def __init__(self, sender, samples_per_chunk: int):
        self.sender = sender
        self.samples_per_chunk = samples_per_chunk

    def __call__(
        self, vis_re: np.ndarray, vis_im: np.ndarray, first_seq: int
    ) -> None:
        from dpdk_dc_sand_tpu.stream.chunk import Chunk

        payload = np.ascontiguousarray(
            np.stack([vis_re, vis_im], axis=-1), dtype="<f4"
        ).ravel()
        self.sender.send_chunk(
            Chunk(
                payload.view(np.uint8),
                seq=first_seq,
                timestamp=first_seq * self.samples_per_chunk,
            )
        )
