"""Packet latency/jitter tool tests (packet_latency analog)."""

import numpy as np

from dpdk_dc_sand_tpu.stream.latency import (
    extract_timestamps,
    latency_stats,
    plot_latency,
)
from dpdk_dc_sand_tpu.stream.spead import packetize

ADC_RATE = 1712e6


def _capture(jitter_us):
    """Synthesise a capture: heaps at a steady ADC cadence + known jitter."""
    rng = np.random.default_rng(7)
    captures = []
    samples_per_heap = 4096
    t0 = 100.0
    for i in range(200):
        adc_ts = i * samples_per_heap
        true_time = t0 + adc_ts / ADC_RATE
        jitter = rng.normal(scale=jitter_us * 1e-6)
        pkt = packetize(
            np.zeros(64, np.uint8), heap_id=i, timestamp=adc_ts
        )[0]
        captures.append((true_time + jitter, pkt))
    return captures


def test_extract_skips_garbage():
    caps = _capture(1.0)
    caps.insert(5, (123.0, b"not a packet"))
    recs = extract_timestamps(caps)
    assert recs.shape == (200, 2)
    assert recs[0, 1] == 0
    assert recs[-1, 1] == 199 * 4096


def test_stats_recover_injected_jitter():
    recs = extract_timestamps(_capture(5.0))
    stats = latency_stats(recs, ADC_RATE)
    assert stats["n"] == 200
    # recovered std within 40% of the injected 5 µs
    assert 3.0 < stats["jitter_std_us"] < 7.0
    assert stats["jitter_p2p_us"] >= stats["jitter_std_us"]


def test_zero_jitter_is_flat():
    recs = extract_timestamps(_capture(0.0))
    stats = latency_stats(recs, ADC_RATE)
    assert stats["jitter_p2p_us"] < 0.5


def test_empty_capture():
    assert latency_stats(np.zeros((0, 2)))["n"] == 0


def test_plot_writes_file(tmp_path):
    recs = extract_timestamps(_capture(2.0))
    out = tmp_path / "jitter.png"
    plot_latency(recs, ADC_RATE, str(out))
    assert out.exists() and out.stat().st_size > 1000
