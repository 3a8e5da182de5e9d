"""Worker process for the 2-process multihost integration test.

NOT a test module (no ``test_`` prefix) — launched as a subprocess by
``tests/test_multihost.py``, one instance per simulated host. Each
worker owns a slice of the virtual CPU device mesh, feeds ONLY its local
shards (the per-host multicast-subscription ingest model,
ibverbs_rx.c:207-210), runs the distributed F+B step, and reports a
deterministic checksum for cross-process / single-process equivalence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--nprocs", type=int, default=1)
    p.add_argument("--coordinator", default="")
    p.add_argument("--out", required=True)
    a = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.nprocs > 1:
        os.environ["JAX_COORDINATOR"] = a.coordinator
        os.environ["JAX_NUM_PROCESSES"] = str(a.nprocs)
        os.environ["JAX_PROCESS_ID"] = str(a.pid)
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        from dpdk_dc_sand_tpu.parallel import initialize_multihost

        if not initialize_multihost():
            print("initialize_multihost returned False", file=sys.stderr)
            return 2

    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.parallel import (
        ShardedFBEngine,
        assemble_global,
        make_mesh,
        shard_indices,
    )

    n_dev = len(jax.devices())
    if n_dev != 8:
        print(f"expected 8 global devices, got {n_dev}", file=sys.stderr)
        return 3
    mesh = make_mesh(8, shape=(2, 4))
    cfg = ArrayConfig(n_ants=8, n_channels=128, n_beams=4, n_taps=4)
    eng = ShardedFBEngine(cfg, mesh, n_spectra=16)
    adc, fd, ph, dv = eng.example_inputs()  # deterministic (seeded)

    # Per-host feed: provider is called once per ADDRESSABLE device, so
    # each process materialises only its own antenna/time slices.
    local_indices = shard_indices(eng.sample_sharding, adc.shape)
    n_local = len(local_indices)
    adc_g = assemble_global(
        lambda idx: adc[idx], eng.sample_sharding, adc.shape
    )
    out = eng(adc_g, fd, ph, dv)
    checksum = float(jax.jit(lambda x: jnp.abs(x).sum())(out))
    result = {
        "pid": a.pid,
        "nprocs": a.nprocs,
        "n_global_devices": n_dev,
        "n_local_shards": n_local,
        "out_shape": list(out.shape),
        "checksum": checksum,
    }
    with open(a.out, "w") as f:
        json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
