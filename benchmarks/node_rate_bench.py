"""NODE_RATE.json — what one deployed EngineNode sustains end-to-end.

The chip-side bench (bench.py) and the transport bench (UDP_RATE.json)
measure their layers in isolation; this artifact measures the SYSTEM —
UDP ingest → ring → DeviceFeed h2d → fused F+B step on the real chip →
int8 beam egress over UDP — and decomposes the gap between the layers
(the reference's ingest-rate framing,
BeamformerCoefficientTest.cu:426-445).

Geometry: scaled so one ADC chunk fits the 2-CPU loopback transport
(the flagship chunk is ~2.8 GB — a 100 GbE fabric's job, not
loopback's); the chip runs the same fused kernels either way, so the
decomposition, not the absolute, is the artifact.

Rows:
- ``compute_only``   : chained-marginal step rate (no host path at all)
- ``feed_compute``   : chunks submitted straight into the node's ring
                       (ring + h2d + step; no wire)
- ``udp_full``       : SPEAD-lite UDP ingest + step + int8 UDP beam
                       egress, paced at the measured sustainable rate

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/node_rate_bench.py
"""

from __future__ import annotations

import asyncio
import json
import os
import time

import numpy as np

CFG = dict(n_ants=16, n_channels=4096, n_beams=8, n_taps=8)
N_SPECTRA = 64
DURATION_S = 20.0


def compute_only_msps() -> float:
    """Chained-marginal step rate at the node geometry.

    bench.measure's 2-vs-6 marginal is calibrated for the ~112 ms
    flagship step; this geometry's ~1 ms step needs far deeper chains
    to clear the relay noise floor, so measure 32-vs-256 iterations of
    the same chained program."""
    import time

    import bench
    import jax

    from dpdk_dc_sand_tpu.config import ArrayConfig

    cfg = ArrayConfig(**CFG)
    chained, adc_d, fd_d, blocks, rot = bench.build(
        cfg, N_SPECTRA, "fused", bstage="auto", ct_batch_a=True,
        beam_layout="split",
    )
    lo, hi = 32, 256
    r_lo, r_hi = chained(lo), chained(hi)
    float(r_lo(adc_d, fd_d, blocks, rot))
    float(r_hi(adc_d, fd_d, blocks, rot))
    t_lo = t_hi = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r_lo(adc_d, fd_d, blocks, rot))
        t_lo = min(t_lo, time.time() - t0)
        t0 = time.time()
        float(r_hi(adc_d, fd_d, blocks, rot))
        t_hi = min(t_hi, time.time() - t0)
    per = max((t_hi - t_lo) / (hi - lo), 1e-9)
    samples = cfg.n_ants * cfg.n_pols * N_SPECTRA * cfg.fft_size
    return samples / per / 1e6


async def run_node(mode: str, duration_s: float, pace_s: float | None):
    """One node run; returns stats dict. mode: 'ring' or 'udp'."""
    import jax  # noqa: F401  (device init before threads)

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.engine_node import EngineNode
    from dpdk_dc_sand_tpu.stream.chunk import Chunk
    from dpdk_dc_sand_tpu.stream.ring import ChunkRing
    from dpdk_dc_sand_tpu.stream.udp import UdpReceiver, UdpSender

    cfg = ArrayConfig(**CFG)
    node = EngineNode(cfg, n_spectra=N_SPECTRA, beam_quant_scale=0.25)
    await node.start()
    beams_out = [0]
    beam_rx = beam_ring = None
    if mode == "udp":
        beam_ring = ChunkRing(32, 64 << 20)
        beam_rx = UdpReceiver(("127.0.0.1", 0), beam_ring).start()
        node.attach_udp_egress(("127.0.0.1", beam_rx.port))

        adc_rx = node.attach_udp_ingest(("127.0.0.1", 0))
        tx = UdpSender(("127.0.0.1", adc_rx.port))
    else:
        node.on_beams = lambda beams, seq: beams_out.__setitem__(
            0, beams_out[0] + 1
        )

    rng = np.random.default_rng(7)
    adc = rng.integers(-64, 64, size=node.chunk_shape, dtype=np.int8)
    payload = adc.ravel().view(np.uint8)
    chunk_bytes = payload.nbytes

    # Warm the compiled step (first chunk pays the trace/compile);
    # resend periodically — a chunk dropped during warm-up (receiver
    # thread still starting) must not stall the bench.
    t0 = time.time()
    n_warm = 0
    while int(node.s_processed.value) < 1 and time.time() - t0 < 360:
        if time.time() - t0 >= n_warm * 2.0:
            n_warm += 1
            if mode == "udp":
                tx.send_chunk(Chunk(payload=payload, seq=0, timestamp=0,
                                    channel_offset=0))
            else:
                node.submit_chunk(adc, 0)
        await asyncio.sleep(0.05)
    compile_s = time.time() - t0
    if int(node.s_processed.value) < 1:
        await node.stop()
        raise RuntimeError(f"node never processed a warm-up chunk ({mode})")

    p0 = int(node.s_processed.value)
    sent = 0
    t0 = time.perf_counter()
    loop = asyncio.get_event_loop()
    while time.perf_counter() - t0 < duration_s:
        if mode == "udp":
            await loop.run_in_executor(
                None, tx.send_chunk,
                Chunk(payload=payload, seq=sent + 1, timestamp=sent + 1,
                      channel_offset=0),
            )
        else:
            # Backpressure via the processed counter: keep <= 4 chunks
            # in flight so the ring never overruns (its drop accounting
            # is for *wire* overrun; here we measure steady-state
            # capacity).
            while sent - (int(node.s_processed.value) - p0) > 4:
                await asyncio.sleep(0.002)
            node.submit_chunk(adc, sent + 1)
        sent += 1
        if pace_s:
            lag = t0 + sent * pace_s - time.perf_counter()
            if lag > 0:
                await asyncio.sleep(lag)
    # drain
    t_end = time.perf_counter()
    for _ in range(200):
        if int(node.s_processed.value) - p0 >= sent:
            break
        await asyncio.sleep(0.05)
    processed = int(node.s_processed.value) - p0
    lost = int(node.s_lost.value) if hasattr(node, "s_lost") else None
    elapsed = t_end - t0
    ring_drops = int(node.ring.stats()[2])
    await node.stop()
    if beam_rx is not None:
        beam_rx.stop()
        beam_ring.close()
    samples = cfg.n_ants * cfg.n_pols * N_SPECTRA * cfg.fft_size
    return {
        "mode": mode,
        "pace_s": pace_s,
        "duration_s": round(elapsed, 2),
        "chunk_bytes": chunk_bytes,
        "chunks_sent": sent,
        "chunks_processed": processed,
        "chunks_unprocessed": sent - processed,
        "ring_drops": ring_drops,
        "heaps_lost": lost,
        "compile_s": round(compile_s, 1),
        "msamples_per_s": round(processed * samples / elapsed / 1e6, 1),
        "ingest_gbps": round(processed * chunk_bytes * 8 / elapsed / 1e9, 2),
    }


def main() -> None:
    from dpdk_dc_sand_tpu.config import ArrayConfig

    cfg = ArrayConfig(**CFG)
    samples = cfg.n_ants * cfg.n_pols * N_SPECTRA * cfg.fft_size

    comp = compute_only_msps()
    print(json.dumps({"row": "compute_only", "msamples_per_s": round(comp, 1)}),
          flush=True)

    # The relay's device->host pull of one beam chunk — measured, because
    # on THIS env it dominates the node loop (EngineNode hands host
    # ndarrays to on_beams/egress). A production PCIe host moves the
    # same bytes in ~1 ms.
    import jax
    import jax.numpy as jnp

    beams_bytes = cfg.n_pols * cfg.n_channels * N_SPECTRA * cfg.n_beams * 2
    dev = jax.device_put(
        jnp.zeros((beams_bytes,), jnp.int8)
    ).block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(dev)
    d2h_s = time.perf_counter() - t0
    print(json.dumps({"row": "relay_d2h_beams",
                      "bytes": beams_bytes,
                      "seconds": round(d2h_s, 3)}), flush=True)

    ring_row = asyncio.run(run_node("ring", DURATION_S, None))
    print(json.dumps(ring_row), flush=True)

    # UDP: first blast to find the sustainable rate, then pace at 90%.
    blast = asyncio.run(run_node("udp", DURATION_S / 2, None))
    print(json.dumps(blast), flush=True)
    sustain = blast["chunks_processed"] / blast["duration_s"]
    pace = 1.0 / (0.9 * sustain) if sustain > 0 else None
    paced = asyncio.run(run_node("udp", DURATION_S, pace))
    print(json.dumps(paced), flush=True)

    # Projection: the same node on a production host path (PCIe-class
    # ~10 GB/s h2d+d2h instead of the relay's measured ~34 MB/s):
    # per-chunk = compute + chunk upload + beam download, serialised
    # (conservative: DeviceFeed prefetch overlaps uploads in practice).
    chunk_b = int(np.prod(
        [CFG["n_ants"], 2, (N_SPECTRA + CFG["n_taps"] - 1) * 2 * CFG["n_channels"]]
    ))
    pcie = 10e9
    t_proj = samples / (comp * 1e6) + chunk_b / pcie + beams_bytes / pcie
    proj_msps = samples / t_proj / 1e6

    artifact = {
        "config": {**CFG, "n_spectra": N_SPECTRA,
                   "chunk_samples": samples,
                   "beam_egress": "int8 (beam_quant_scale=0.25)"},
        "environment": "single axon TPU v5e chip via relay; 2-CPU host; "
        "UDP loopback (SPEAD-lite); flagship chunks (~2.8 GB) need a "
        "real 100 GbE fabric, so the node runs a scaled geometry — the "
        "decomposition is the artifact",
        "rows": {
            "compute_only_msps": round(comp, 1),
            "relay_d2h_beams_s": round(d2h_s, 3),
            "feed_compute": ring_row,
            "udp_blast": blast,
            "udp_paced": paced,
        },
        "projected_production_host": {
            "assumption": "PCIe-class ~10 GB/s host<->device path "
            "(serialised, no prefetch overlap — conservative)",
            "msamples_per_s": round(proj_msps, 1),
            "fraction_of_compute_only": round(proj_msps / comp, 3),
        },
        "gap_decomposition": {
            "compute_only_msps": round(comp, 1),
            "feed_compute_msps": ring_row["msamples_per_s"],
            "udp_paced_msps": paced["msamples_per_s"],
            "feed_overhead_pct": round(
                100 * (1 - ring_row["msamples_per_s"] / comp), 1
            ),
            "transport_overhead_pct": round(
                100
                * (
                    1
                    - paced["msamples_per_s"]
                    / max(ring_row["msamples_per_s"], 1e-9)
                ),
                1,
            ),
            "note": "compute→feed gap on THIS env is dominated by the "
            "axon relay's device→host pull of each beam chunk "
            "(relay_d2h_beams_s measured above; a production PCIe host "
            "moves the same bytes in ~1 ms, putting the node within a "
            "few % of compute_only); feed→udp gap = loopback SPEAD "
            "transport (CPU-bound on this 2-core host; scales with "
            "NIC/queues in deployment)",
        },
    }
    out = os.path.join(os.path.dirname(__file__), "NODE_RATE.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
