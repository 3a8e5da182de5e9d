"""Wire-level channel-slice fan-out over multicast — the xeng_id model.

The reference distributes the spectrum by UDP multicast: the F stage
fans channelised voltages out over per-slice multicast groups and each
X/B-engine subscribes to exactly the groups whose channels it owns,
steering with the absolute channel offset
(ibverbs_rx.c:207-210 "subscribe to multiple multicast streams";
coeff_generator.py:49-53 ``ichannel = ichannelindex +
n_channels_per_stream*xeng_id``). These tests run that model end to end
over real multicast loopback: one sender, per-slice groups, subscriber
nodes reassembling and beamforming only their slice.
"""

import socket
import time

import numpy as np
import pytest

from dpdk_dc_sand_tpu.config import ArrayConfig
from dpdk_dc_sand_tpu.models import BeamformPipeline
from dpdk_dc_sand_tpu.stream import Chunk, ChunkRing, UdpReceiver, UdpSender

CFG = ArrayConfig(n_ants=4, n_channels=64, n_beams=2, n_batches=1)
GROUP_BASE = "239.102.23.{}"


def _multicast_ok() -> bool:
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_LOOP, 1)
        s.sendto(b"x", (GROUP_BASE.format(250), 9))
        s.close()
        return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _multicast_ok(), reason="multicast loopback unavailable"
)


def _slice_payload(samples: np.ndarray, xeng_id: int) -> np.ndarray:
    cps = CFG.n_channels_per_stream
    return np.ascontiguousarray(
        samples[:, :, xeng_id * cps : (xeng_id + 1) * cps]
    )


def _fanout_sender(dests):
    """Send each channel slice to its own multicast group (one heap per
    slice), exactly the F-engine transmit layout."""
    rng = np.random.default_rng(2021)
    samples = rng.integers(-128, 127, size=(
        CFG.n_batches, CFG.n_ants, CFG.n_channels,
        CFG.n_samples_per_channel, CFG.n_pols, 2), dtype=np.int8)
    for xeng_id, dest in dests.items():
        tx = UdpSender(dest, mtu_payload=2048)
        payload = _slice_payload(samples, xeng_id)
        tx.send_chunk(
            Chunk(
                payload.view(np.uint8).ravel(),
                seq=xeng_id,
                timestamp=12345,
                channel_offset=CFG.channel_offset(xeng_id),
            )
        )
        tx.close()
    return samples


def _drain(ring, n_chunks, timeout_s=8.0):
    got = []
    deadline = time.time() + timeout_s
    while len(got) < n_chunks and time.time() < deadline:
        item = ring.acquire_read()
        if item is None:
            time.sleep(0.01)
            continue
        view, seq = item
        c = UdpReceiver.unpack(view)
        got.append((seq, int(c.timestamp), int(c.channel_offset),
                    np.array(c.payload)))
        ring.release_read()
    return got


def test_multigroup_join_single_socket():
    """One engine subscribing to MULTIPLE multicast streams on one socket
    receives every slice it owns (the ibverbs_rx.c:207-210 pattern)."""
    slice_bytes = (
        CFG.n_batches * CFG.n_ants * CFG.n_channels_per_stream
        * CFG.n_samples_per_channel * CFG.n_pols * 2
    )
    ring = ChunkRing(8, slice_bytes + 16)
    groups = [GROUP_BASE.format(10), GROUP_BASE.format(11)]
    rx = UdpReceiver(("", 0), ring, mtu_payload=2048, group=groups).start()
    try:
        assert rx.groups == groups
        dests = {0: (groups[0], rx.port), 1: (groups[1], rx.port)}
        samples = _fanout_sender(dests)
        got = _drain(ring, 2)
        assert len(got) == 2, f"received {len(got)}/2 slices"
        by_offset = {off: pay for _, _, off, pay in got}
        cps = CFG.n_channels_per_stream
        # Combined spectrum coverage: both owned slices arrived intact.
        assert set(by_offset) == {0, cps}
        for xeng_id in (0, 1):
            want = _slice_payload(samples, xeng_id).view(np.uint8).ravel()
            np.testing.assert_array_equal(by_offset[xeng_id * cps], want)
    finally:
        rx.stop()


def test_channel_slice_fanout_two_nodes():
    """Two subscriber nodes, each joined to its own group, each beamform
    ONLY their slice with the correct absolute-channel steering."""
    slice_bytes = (
        CFG.n_batches * CFG.n_ants * CFG.n_channels_per_stream
        * CFG.n_samples_per_channel * CFG.n_pols * 2
    )
    nodes = {}
    for xeng_id in (0, 1):
        grp = GROUP_BASE.format(20 + xeng_id)
        ring = ChunkRing(8, slice_bytes + 16)
        # Bind to the group address itself: kernel-level stream isolation,
        # the rte_flow/ibv_flow steering-rule analog.
        rx = UdpReceiver((grp, 0), ring, mtu_payload=2048, group=grp).start()
        nodes[xeng_id] = (grp, ring, rx, BeamformPipeline(CFG, xeng_id=xeng_id))
    try:
        dests = {k: (nodes[k][0], nodes[k][2].port) for k in nodes}
        samples = _fanout_sender(dests)

        rng = np.random.default_rng(7)
        dv = np.zeros(CFG.delay_vals_shape, np.float32)
        dv[..., 0] = rng.uniform(0, 5e-9, dv.shape[:-1])
        dv[..., 2] = rng.uniform(-np.pi, np.pi, dv.shape[:-1])

        for xeng_id, (grp, ring, rx, pipe) in nodes.items():
            got = _drain(ring, 1)
            assert len(got) == 1, f"node {xeng_id}: no heap"
            seq, ts, offset, payload = got[0]
            # Channel ownership: this node's slice only.
            assert seq == xeng_id
            assert offset == CFG.channel_offset(xeng_id)
            assert ts == 12345
            ingest = payload.view(np.int8).reshape(CFG.ingest_shape)
            got_beams = np.asarray(pipe(ingest, dv))
            # Transport + offset plumbing: identical to beamforming the
            # local slice directly with this xeng_id's steering.
            want = np.asarray(pipe(_slice_payload(samples, xeng_id), dv))
            np.testing.assert_array_equal(got_beams, want)

        # The steering really is absolute-channel: the same slice data
        # beamformed under the OTHER engine's xeng_id differs.
        ingest0 = _slice_payload(samples, 0)
        b0 = np.asarray(nodes[0][3](ingest0, dv))
        b1 = np.asarray(nodes[1][3](ingest0, dv))
        assert not np.array_equal(b0, b1)
    finally:
        for _, _, rx, _ in nodes.values():
            rx.stop()
