"""Tune the fused F-engine kernel: s_blk × n_spectra sweep + honest
stage shares (kernel alone, B-stage alone) with slice-proof probes and
loop-dependent inputs.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fused_tune.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.beamform import beamform_planes
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    win = jnp.asarray(np.asarray(pfb_window(cfg.n_taps, cfg.fft_size)))

    def log(*a):
        print(*a, flush=True)

    def measure(run_factory, inputs):
        r2, r6 = run_factory(2), run_factory(6)
        t0 = time.time()
        float(r2(*inputs))
        c = time.time() - t0
        float(r6(*inputs))
        t2 = t6 = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(r2(*inputs))
            t2 = min(t2, time.time() - t0)
            t0 = time.time()
            float(r6(*inputs))
            t6 = min(t6, time.time() - t0)
        return max((t6 - t2) / 4, 1e-9), c

    rng = np.random.default_rng(2021)

    # ---- kernel alone (frames already aligned; loop-dependent) ----
    for S in (32, 64):
        n_frames = S + cfg.n_taps - 1
        frames = jax.device_put(jnp.asarray(rng.integers(
            -64, 64, size=(cfg.n_ants, cfg.n_pols, n_frames, cfg.fft_size),
            dtype=np.int8)))
        fd = jnp.asarray(
            rng.uniform(-0.5, 0.5, (cfg.n_ants, cfg.n_pols)).astype(np.float32))
        ph = jnp.asarray(
            rng.uniform(-1, 1, (cfg.n_ants, cfg.n_pols)).astype(np.float32))
        samples = cfg.n_ants * cfg.n_pols * S * cfg.fft_size
        for s_blk in (4, 8, 16):
            def factory(n_iters):
                @jax.jit
                def run(fr0, fd0):
                    def body(i, carry):
                        fr, fd_c, acc = carry
                        qr, qi = fengine_fused(
                            fr, win, fd_c, ph, n_channels=cfg.n_channels,
                            quant_scale=1 / 16, s_blk=s_blk,
                        )
                        probe = (qr.astype(jnp.float32).sum()
                                 + qi.astype(jnp.float32).sum()) * 1e-30
                        return (fr + probe.astype(jnp.int8), fd_c + probe,
                                acc + probe)

                    return jax.lax.fori_loop(
                        0, n_iters, body, (fr0, fd0, jnp.float32(0)))[2]

                return run

            try:
                per, comp = measure(factory, (frames, fd))
                log(f"kernel S={S:3d} s_blk={s_blk:2d}: {per*1e3:7.2f} ms "
                    f"({samples/per/1e9:6.2f} Gs/s) [compile {comp:.0f}s]")
            except Exception as e:
                log(f"kernel S={S:3d} s_blk={s_blk:2d}: FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}")

    # ---- B-stage alone (int8 planes in, loop-dependent, full reduce) ----
    for S in (32, 64):
        q = jax.device_put(jnp.asarray(rng.integers(
            -64, 64, size=(2, cfg.n_ants, cfg.n_pols, S, cfg.n_channels),
            dtype=np.int8)))
        cos = jax.device_put(jnp.asarray(rng.normal(
            size=(cfg.n_channels, cfg.n_beams, cfg.n_ants)
        ).astype(np.float32).astype(jnp.bfloat16)))
        sin = jax.device_put(jnp.asarray(rng.normal(
            size=(cfg.n_channels, cfg.n_beams, cfg.n_ants)
        ).astype(np.float32).astype(jnp.bfloat16)))
        samples = cfg.n_ants * cfg.n_pols * S * cfg.fft_size

        def bfactory(n_iters):
            @jax.jit
            def run(q0, cos_a, sin_a):
                def body(i, carry):
                    qc, acc = carry
                    xr = jnp.transpose(qc[0], (1, 3, 2, 0))
                    xi = jnp.transpose(qc[1], (1, 3, 2, 0))
                    br, bi = beamform_planes(xr, xi, cos_a, sin_a, "bf16")
                    probe = (br.sum() + bi.sum()) * 1e-30
                    return (qc + probe.astype(jnp.int8), acc + probe)

                return jax.lax.fori_loop(
                    0, n_iters, body, (q0, jnp.float32(0)))[1]

            return run

        try:
            per, comp = measure(bfactory, (q, cos, sin))
            log(f"B-only S={S:3d} (bf16):  {per*1e3:7.2f} ms "
                f"({samples/per/1e9:6.2f} Gs/s-equiv) [compile {comp:.0f}s]")
        except Exception as e:
            log(f"B-only S={S:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main(sys.argv[1:])
