"""XLA TPU rFFT cost vs transform size at constant total elements.

If rfft cost/sample grows with FFT size (extra internal passes), a DIT
split (two half-size rffts + elementwise combine, identity exact) is a
win at the flagship 65536-point size; if it's flat, the FFT is already
traffic-bound and the split only adds combine traffic.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fft_cost_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    total = 1 << 28  # 268M f32 samples = 1.07 GB in

    def measure(run_factory, inputs):
        r2, r6 = run_factory(2), run_factory(6)
        float(r2(*inputs))
        float(r6(*inputs))
        t2 = t6 = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(r2(*inputs))
            t2 = min(t2, time.time() - t0)
            t0 = time.time()
            float(r6(*inputs))
            t6 = min(t6, time.time() - t0)
        return max((t6 - t2) / 4, 1e-9)

    rng = np.random.default_rng(0)
    for logn in (12, 14, 15, 16, 17):
        n = 1 << logn
        rows = total // n
        x = jax.device_put(jnp.asarray(
            rng.normal(size=(rows, n)).astype(np.float32)))

        def factory(n_iters):
            @jax.jit
            def run(x):
                def body(i, carry):
                    x_c, acc = carry
                    y = jnp.fft.rfft(x_c, axis=-1)
                    probe = jnp.real(y[0, 0]) * 1e-30
                    return (x_c + probe, acc + probe)

                return jax.lax.fori_loop(
                    0, n_iters, body, (x, jnp.float32(0)))[1]

            return run

        per = measure(factory, (x,))
        print(f"rfft {n:6d} x {rows:5d} rows: {per*1e3:7.2f} ms "
              f"({total/per/1e9:5.1f} Gs/s)", flush=True)


if __name__ == "__main__":
    main()
