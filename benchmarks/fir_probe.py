"""FIR loop-structure probe: is the window's VMEM traffic elidable?

The fused F kernel's FIR is VMEM-bandwidth-bound, and the WINDOW is the
dominant stream: per output sample it loads 16 window f32 elements and
16 ring bf16 elements (96 B/sample); the window slab for tap t is
identical across the s_blk spectra of a block, so a tap-outer schedule
that applies one window slab to all spectra at once could cut the per-
sample load bytes to ~40 B — IF Mosaic's tiling actually reuses the
broadcast operand's tiles instead of re-loading per spectrum.

Three schedules over identical data (out[j] = Σ_t x[j+t]·w[t]):

- persi:    for j: for t: acc += x[j+t]·w[t]      (the kernel today)
- tapouter: for t: acc3 += x3[t:t+J]·w[t][None]   (broadcast FMA)
- tapo2d:   for t: acc2 += x2d_slice·w_rep[t]     (2-D, window
            pre-tiled J× in VMEM — no broadcast, more window VMEM but
            contiguous 2-D ops)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fir_probe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

N1, N2, TAPS, J, REPS = 256, 256, 16, 8, 40


def make(kind: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = J + TAPS - 1

    def kernel(x_ref, w_ref, o_ref):
        # x: [G*N1, N2] bf16; w: [TAPS*N1, N2] f32; o: [J*N1, N2] f32.
        # REPS passes keep the grid tiny while the slabs stay VMEM-hot,
        # isolating the load/FMA structure from HBM effects.
        acc_prev = None
        for r in range(REPS):
            if kind == "persi":
                outs = []
                for j in range(J):
                    acc = (
                        x_ref[j * N1 : (j + 1) * N1].astype(jnp.float32)
                        * w_ref[0:N1]
                    )
                    for t in range(1, TAPS):
                        acc = acc + (
                            x_ref[(j + t) * N1 : (j + t + 1) * N1].astype(
                                jnp.float32
                            )
                            * w_ref[t * N1 : (t + 1) * N1]
                        )
                    outs.append(acc)
                res = jnp.concatenate(outs, axis=0)
            else:
                x3 = x_ref[:].reshape(G, N1, N2)
                acc3 = x3[0:J].astype(jnp.float32) * w_ref[0:N1][None]
                for t in range(1, TAPS):
                    acc3 = acc3 + (
                        x3[t : t + J].astype(jnp.float32)
                        * w_ref[t * N1 : (t + 1) * N1][None]
                    )
                res = acc3.reshape(J * N1, N2)
            # serialise reps through a data dependence
            res = res + (0.0 if acc_prev is None else acc_prev[0, 0])
            acc_prev = res
        o_ref[...] = acc_prev

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((J * N1, N2), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    return run


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    G = J + TAPS - 1
    x = jnp.asarray(
        rng.normal(size=(G * N1, N2)).astype(np.float32), jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(TAPS * N1, N2)).astype(np.float32))
    flops = REPS * J * TAPS * N1 * N2
    for kind in ("persi", "tapouter"):
        f = make(kind)
        t0 = time.time()
        jax.block_until_ready(f(x, w))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(f(x, w))
            best = min(best, time.time() - t0)
        print(
            f"{kind:9s}: {best*1e3:7.3f} ms  "
            f"({flops/best/1e9:7.1f} GFMA/s) [compile {comp:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
