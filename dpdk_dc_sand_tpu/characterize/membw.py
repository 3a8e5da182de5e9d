"""Host RAM bandwidth sweep — the memRateTest analog.

Parity with ``utilities/pcie_bandwidth_tests/memRateTest.{hpp,cpp}`` +
``main.cpp:193-246``: N threads each scanning a private buffer, swept over
a thread range, CSV-style rows out. The scan loops live in native code
(:mod:`dpdk_dc_sand_tpu.native.membw`) so the compiler can't elide them —
the role the reference's hand-written AVX asm plays
(memRateTest_asm.h:37-113). Falls back to a numpy scan when no toolchain
is present.
"""

from __future__ import annotations

import time
from typing import Iterable, List, Tuple

import numpy as np

from dpdk_dc_sand_tpu.native import load_native


def _python_scan(bytes_per_thread: int, seconds: float, mode: int) -> float:
    buf = np.ones(bytes_per_thread // 8, np.uint64)
    total = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        if mode == 0:
            buf[:] = 1
        else:
            _ = buf.sum()
        total += buf.nbytes
    return total / (time.perf_counter() - t0)


def mem_rate(
    n_threads: int,
    bytes_per_thread: int = 256 * 1024 * 1024,
    seconds: float = 0.5,
    mode: str = "write",
) -> float:
    """Aggregate bandwidth in bytes/s (native threads when available)."""
    m = 0 if mode == "write" else 1
    lib = load_native()
    if lib is not None:
        rate = lib.membw_scan(n_threads, bytes_per_thread, seconds, m)
        if rate > 0:
            return rate
    # fallback: single python thread regardless of n_threads (GIL)
    return _python_scan(bytes_per_thread, seconds, m)


def mem_rate_sweep(
    thread_range: Iterable[int] = (1, 2, 4),
    bytes_per_thread: int = 128 * 1024 * 1024,
    seconds: float = 0.3,
) -> List[Tuple[int, float, float]]:
    """Sweep threads → ``[(threads, write_GBps, read_GBps), …]``.

    The run_test_suite.sh / main.cpp sweep loop producing CSV rows.
    """
    rows = []
    for t in thread_range:
        w = mem_rate(t, bytes_per_thread, seconds, "write") / 1e9
        r = mem_rate(t, bytes_per_thread, seconds, "read") / 1e9
        rows.append((t, w, r))
    return rows


def main() -> None:
    print("threads,write_GBps,read_GBps")
    for t, w, r in mem_rate_sweep():
        print(f"{t},{w:.2f},{r:.2f}")


if __name__ == "__main__":
    main()
