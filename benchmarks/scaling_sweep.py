"""Mesh scaling sweep — samples/s and efficiency vs device count, CSV out.

The distributed analog of the reference's bandwidth sweep scripts
(run_test_suite.sh:17-30 → CSVs per config): run the sharded F+B step on
growing meshes and report throughput + scaling efficiency relative to the
1-device baseline — the BASELINE.md north-star's ≥80 % efficiency metric.

On this development container the mesh is virtual CPU devices, so absolute
numbers mean nothing — run on a real pod slice for the production figure.
The harness (shapes, timing discipline, efficiency math) is the deliverable.

Run: ``python benchmarks/scaling_sweep.py [--devices 1,2,4,8]``
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--devices", default="1,2,4,8")
    parser.add_argument("--spectra-per-shard", type=int, default=8)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--ants", type=int, default=8)
    parser.add_argument("--iters", type=int, default=4)
    args = parser.parse_args(argv)
    counts = [int(x) for x in args.devices.split(",")]

    # Virtual devices must be configured before first jax device use.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(counts)}"
        ).strip()
    import jax

    # Decide the platform BEFORE touching jax.devices()/default_backend()
    # (those lock the backend). Real-pod runs opt in explicitly.
    if os.environ.get("DCSAND_SCALING_REAL") != "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.parallel import ShardedFBEngine, make_mesh

    cfg = ArrayConfig(
        n_ants=args.ants, n_channels=args.channels, n_beams=8, n_taps=4
    )

    print("devices,ant_axis,time_axis,msamples_per_s,efficiency")
    base_rate = None
    for n in counts:
        # keep per-shard work constant (weak scaling, the correlator's
        # deployment model: more devices -> more band/time served)
        from dpdk_dc_sand_tpu.parallel.mesh import factor_devices

        shape = factor_devices(n)
        n_spectra = args.spectra_per_shard * shape[1]
        eng = ShardedFBEngine(cfg, make_mesh(n, shape=shape), n_spectra=n_spectra)
        adc, fd, ph, dv = eng.example_inputs()
        eng.set_beam_delays(dv)
        cos, sin = eng._coeffs
        adc_d = jax.device_put(jnp.asarray(adc), eng.sample_sharding)

        def run_once():
            out = eng._step(adc_d, jnp.asarray(fd), jnp.asarray(ph), cos, sin)
            jax.block_until_ready(out)

        run_once()  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run_once()
        dt = (time.perf_counter() - t0) / args.iters
        samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size
        rate = samples / dt / 1e6
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        print(f"{n},{shape[0]},{shape[1]},{rate:.1f},{eff:.3f}")


if __name__ == "__main__":
    main()
