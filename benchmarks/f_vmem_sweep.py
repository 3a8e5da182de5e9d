"""F-kernel schedule sweep with a raised Mosaic VMEM cap.

The batch-A schedule was capped at s_blk=8 by the DEFAULT 16 MiB scoped
VMEM limit (ROADMAP 2026-08-19); this sweep raises
``CompilerParams.vmem_limit_bytes`` (v5e has far more physical VMEM than
the default cap) and measures s_blk ∈ {8, 16, 32} honest marginal
timings at the flagship geometry.

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python benchmarks/f_vmem_sweep.py [S]
"""

from __future__ import annotations

import sys
import time

import numpy as np

A, P, B, C, TAPS = 80, 2, 16, 32768, 16
FFT = 2 * C


def run(S, s_blk, vmem_mb):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.delay import coarse_delay
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    rng = np.random.default_rng(5)
    n_in = (S + TAPS - 1) * FFT + 16
    adc = jnp.asarray(rng.integers(-64, 64, (A, P, n_in), dtype=np.int8))
    window = jnp.asarray(np.asarray(pfb_window(TAPS, FFT)))
    cd = jnp.asarray(rng.integers(0, 16, A).astype(np.int32))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, A).astype(np.float32))
    ph = -jnp.pi * fd / 2

    def step(adc_c, fd_c):
        out_len = (S + TAPS - 1) * FFT
        aligned = coarse_delay(adc_c, cd, out_len)
        frames = aligned.reshape(A, P, -1, FFT)
        qr, qi = fengine_fused(
            frames, window,
            jnp.broadcast_to(fd_c[:, None], (A, P)),
            jnp.broadcast_to(ph[:, None], (A, P)),
            n_channels=C, quant_scale=1.0 / 16.0, ct_batch_a=True,
            s_blk=s_blk, vmem_limit_mb=vmem_mb,
        )
        return qr.astype(jnp.float32).sum() + qi.astype(jnp.float32).sum()

    def factory(n_iters):
        @jax.jit
        def runf(adc0, fd0):
            def body(i, carry):
                adc_c, fd_c, acc = carry
                probe = step(adc_c, fd_c) * 1e-30
                return (
                    adc_c.at[0, 0, 0].add(probe.astype(jnp.int8)),
                    fd_c + probe,
                    acc + probe,
                )

            return jax.lax.fori_loop(0, n_iters, body, (adc0, fd0, jnp.float32(0)))[2]

        return runf

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(adc, fd))
    comp = time.time() - t0
    float(r6(adc, fd))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(adc, fd))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(adc, fd))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    samples = A * P * S * FFT
    print(
        f"S={S} s_blk={s_blk:2d} vmem={vmem_mb}MB: {per*1e3:7.2f} ms "
        f"({samples/per/1e9:6.2f} Gs/s F-only) [compile {comp:.0f}s]",
        flush=True,
    )


def main(argv):
    S = int(argv[0]) if argv else 128
    for s_blk, vmem in ((8, None), (16, 64), (32, 64), (16, 100)):
        try:
            run(S, s_blk, vmem)
        except Exception as e:
            print(f"s_blk={s_blk} vmem={vmem}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
