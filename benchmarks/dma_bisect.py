"""Bisect the production kernel's 23.3 ms DMA row vs ct_ablate's 7.7 ms.

Same trimmed dma-stop kernel as benchmarks/ct_ablate.py, mutated one
axis at a time toward the production configuration:

- v0     : ct_ablate dma exactly (sanity; measured 7.68 ms 2026-08-21)
- v4d    : input constructed [A, P, nf, FFT] int8 and reshaped to
           [batch, rows, N2] before the pallas call (the production
           wrapper's view) — does the reshape materialise a relayout?
- vwrap  : the REAL production kernel via fengine_fused(_ablate="dma"),
           per-si schedule, same inputs as v0 (pre-flattened lead) —
           isolates wrapper/kernel-trace differences from input layout.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dma_bisect.py [S]
"""

from __future__ import annotations

import sys
import time

import numpy as np

A, P, FFT, TAPS = 80, 2, 65536, 16
N1 = N2 = 256


def _chain_measure(call, fr, extra=()):
    import jax
    import jax.numpy as jnp

    def factory(n_iters):
        @jax.jit
        def run(fr0):
            def body(i, carry):
                frc, acc = carry
                qr, qi = call(frc)
                probe = (
                    qr.astype(jnp.float32).sum()
                    + qi.astype(jnp.float32).sum()
                ) * 1e-30
                idx = (0,) * frc.ndim
                return (frc.at[idx].add(probe.astype(jnp.int8)), acc + probe)

            return jax.lax.fori_loop(0, n_iters, body, (fr0, jnp.float32(0)))[1]

        return run

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(fr))
    comp = time.time() - t0
    float(r6(fr))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(fr))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(fr))
        t6 = min(t6, time.time() - t0)
    return max((t6 - t2) / 4, 1e-9), comp


def trimmed_call(S, s_blk):
    """The ct_ablate dma-stop kernel (verbatim structure)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(frames_hbm, rotc_ref, rots_ref, outr_ref, outi_ref,
               scratch, sems):
        b = pl.program_id(0)
        s = pl.program_id(1)
        n_s = pl.num_programs(1)
        rows = (s_blk + TAPS - 1) * N1

        def dma(slot, bi, si):
            return pltpu.make_async_copy(
                frames_hbm.at[bi, pl.ds(si * s_blk * N1, rows), :],
                scratch.at[slot], sems.at[slot])

        step = b * n_s + s
        slot = jax.lax.rem(step, 2)
        next_slot = jax.lax.rem(step + 1, 2)

        @pl.when(step == 0)
        def _():
            dma(slot, b, s).start()

        ns_ = jax.lax.rem(s + 1, n_s)
        nb = b + jnp.where(s + 1 == n_s, 1, 0)
        is_last = step + 1 == pl.num_programs(0) * n_s

        @pl.when(jnp.logical_not(is_last))
        def _():
            dma(next_slot, nb, ns_).start()

        dma(slot, b, s).wait()
        probe = scratch[slot][0:N2 // 2, 0:N1].astype(jnp.int8)
        for si in range(s_blk):
            outr_ref[0, si] = probe
            outi_ref[0, si] = probe

    batch = A * P
    rng = np.random.default_rng(7)
    rotc = jnp.asarray(rng.standard_normal((batch, N2 // 2, N1)), jnp.float32)
    rots = jnp.asarray(rng.standard_normal((batch, N2 // 2, N1)), jnp.float32)
    rows = (s_blk + TAPS - 1) * N1
    rot_spec = pl.BlockSpec(
        (1, N2 // 2, N1), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(batch, S // s_blk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), rot_spec, rot_spec],
        out_specs=(pl.BlockSpec(
            (1, s_blk, N2 // 2, N1), lambda b, s: (b, s, 0, 0),
            memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(
            (batch, S, N2 // 2, N1), jnp.int8),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, rows, N2), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )
    return lambda fr: call(fr, rotc, rots)


def run(S, name):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n_frames = S + TAPS - 1
    batch = A * P
    if name == "v0":
        fr = jnp.asarray(rng.integers(
            -64, 64, size=(batch, n_frames * N1, N2), dtype=np.int8))
        call = trimmed_call(S, 16)
    elif name == "v4d":
        fr = jnp.asarray(rng.integers(
            -64, 64, size=(A, P, n_frames, FFT), dtype=np.int8))
        inner = trimmed_call(S, 16)
        call = lambda f: inner(f.reshape(batch, n_frames * N1, N2))
    elif name == "vwrap":
        from dpdk_dc_sand_tpu.golden.pfb import pfb_window
        from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

        fr = jnp.asarray(rng.integers(
            -64, 64, size=(batch, n_frames, FFT), dtype=np.int8))
        window = jnp.asarray(np.asarray(pfb_window(TAPS, FFT)))
        fd = jnp.asarray(rng.uniform(-0.5, 0.5, batch).astype(np.float32))
        ph = -jnp.pi * fd / 2
        call = lambda f: fengine_fused(
            f, window, fd, ph, n_channels=FFT // 2, quant_scale=1 / 16.0,
            ct_batch_a=True, s_blk=16, ct_pipeline=8, vmem_limit_mb=96,
            _ablate="dma",
        )
    else:
        raise SystemExit(f"unknown variant {name}")
    per, comp = _chain_measure(call, fr)
    samples = A * P * S * FFT
    print(f"S={S} {name:6s}: {per*1e3:7.2f} ms ({samples/per/1e9:6.2f} Gs/s)"
          f" [compile {comp:.0f}s]", flush=True)


def main(argv):
    S = int(argv[0]) if argv else 128
    for name in (argv[1:] or ("v0", "v4d", "vwrap")):
        try:
            run(S, name)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
