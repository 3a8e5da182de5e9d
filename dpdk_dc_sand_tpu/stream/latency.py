"""Packet latency / jitter analysis — the ``packet_latency`` analog.

The reference extracts ADC timestamps (SPEAD item 0x1600) from captured
packets and compares them against NIC capture times to characterise send
jitter (packet_latency/extract_timestamps.py:17-35, plot_latency.py:20-27:
``pkt_time − adc_time/1712e6``). Same contract here against SPEAD-lite
captures: feed (capture_time, packet_bytes) records, get jitter stats and
an optional plot.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import numpy as np

from dpdk_dc_sand_tpu.stream.spead import parse_header


def extract_timestamps(
    packets: Iterable[Tuple[float, bytes]],
) -> np.ndarray:
    """``[(capture_time_s, adc_timestamp), …]`` float64 array [n, 2].

    Non-protocol packets are skipped (the pcap filter analog).
    """
    rows: List[Tuple[float, int]] = []
    for t, pkt in packets:
        hdr = parse_header(pkt)
        if hdr is None:
            continue
        rows.append((t, hdr.timestamp))
    return np.asarray(rows, np.float64).reshape(-1, 2)


def latency_stats(
    records: np.ndarray, adc_sample_rate: float = 1712e6
) -> dict:
    """Jitter of ``capture_time − adc_time/rate``, mean-detrended.

    The absolute offset between the capture clock and the ADC epoch is
    arbitrary; jitter (spread around the mean) is the metric
    (plot_latency.py:20-27).
    """
    if len(records) == 0:
        return {"n": 0}
    lat = records[:, 0] - records[:, 1] / adc_sample_rate
    lat = lat - lat.mean()
    return {
        "n": int(len(lat)),
        "jitter_std_us": float(lat.std() * 1e6),
        "jitter_p2p_us": float((lat.max() - lat.min()) * 1e6),
        "jitter_min_us": float(lat.min() * 1e6),
        "jitter_max_us": float(lat.max() * 1e6),
    }


def plot_latency(
    records: np.ndarray,
    adc_sample_rate: float = 1712e6,
    path: Optional[str] = None,
):
    """Scatter of per-packet latency vs packet index (plot_latency.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lat = records[:, 0] - records[:, 1] / adc_sample_rate
    lat = (lat - lat.mean()) * 1e6
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(lat, ".", markersize=2)
    ax.set_xlabel("packet")
    ax.set_ylabel("latency jitter (µs)")
    ax.set_title("SPEAD packet send jitter")
    if path is not None:
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
    return fig
