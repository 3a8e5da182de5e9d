"""Stage ablation of the fused F-engine kernel at the flagship config.

A bench-only trimmed copy of ``ops/fengine_pallas._fengine_kernel``
(matmul-deint form) with a static ``stop_after`` switch so each stage's
marginal cost is measured on hardware:

- ``dma``    : DMA in, write a constant — bounds the input-stream rate.
- ``conv``   : + whole-tile int8→bf16 conversion.
- ``fir``    : + the 16-tap FIR (VPU), write FIR slab sums.
- ``deint``  : + even/odd selection matmul.
- ``stagea`` : + stage-A DFT matmuls + twiddle.
- ``stageb`` : + stage-B DFT matmuls.
- ``full``   : + DIT combine, fine delay, requant (== production kernel).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fused_ablate.py [S]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def build_kernel(stop_after):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(
        frames_hbm, win_ref, d1c_ref, d1s_ref, d2c_ref, d2s_ref,
        twc_ref, tws_ref, untc_ref, unts_ref, sel_ref,
        outr_ref, outi_ref, scratch, ev_ref, od_ref, sems,
        *, s_blk, n_taps, n1, n2,
    ):
        b = pl.program_id(0)
        s = pl.program_id(1)
        n_s = pl.num_programs(1)
        rows = (s_blk + n_taps - 1) * n1

        def dma(slot, bi, si):
            return pltpu.make_async_copy(
                frames_hbm.at[bi, pl.ds(si * s_blk * n1, rows), :],
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

        if stop_after == "dma":
            probe = scratch[slot][0:8, 0:128].astype(jnp.float32)
            for si in range(s_blk):
                outr_ref[0, si] = jnp.zeros((n2, n1), jnp.int8)
                outi_ref[0, si] = (probe[0, 0]).astype(jnp.int8) * jnp.ones(
                    (n2, n1), jnp.int8)
            return

        tile = scratch[slot].astype(jnp.bfloat16)
        if stop_after == "conv":
            acc = tile[0:n1] + tile[n1 : 2 * n1]
            # bf16 scalar reads are unsupported on TPU — widen first.
            p0 = acc[0:8, 0:128].astype(jnp.float32)[0, 0]
            for si in range(s_blk):
                outr_ref[0, si] = jnp.zeros((n2, n1), jnp.int8)
                outi_ref[0, si] = p0.astype(jnp.int8) * jnp.ones(
                    (n2, n1), jnp.int8)
            return

        dot = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32)

        def dot_t(w, a):
            return jax.lax.dot_general(
                w, a, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        accs = []
        for si in range(s_blk):
            acc = tile[si * n1 : (si + 1) * n1] * win_ref[0:n1]
            for tap in range(1, n_taps):
                acc = acc + (
                    tile[(si + tap) * n1 : (si + tap + 1) * n1]
                    * win_ref[tap * n1 : (tap + 1) * n1])
            if stop_after == "fir":
                outr_ref[0, si] = acc[0:n2, 0:n1].astype(jnp.int8)
                outi_ref[0, si] = acc[n1 - n2 : n1, 0:n1].astype(jnp.int8)
                continue
            deint = dot(acc.astype(jnp.bfloat16), sel_ref[:].astype(jnp.bfloat16))
            ev_ref[:, si * n2 : (si + 1) * n2] = deint[:, :n2].astype(ev_ref.dtype)
            od_ref[:, si * n2 : (si + 1) * n2] = deint[:, n2:].astype(od_ref.dtype)
        if stop_after == "fir":
            return
        if stop_after == "deint":
            for si in range(s_blk):
                outr_ref[0, si] = ev_ref[0:n2, 0:n1].astype(jnp.int8)
                outi_ref[0, si] = od_ref[0:n2, 0:n1].astype(jnp.int8)
            return

        def stage_a(x_ref):
            x = x_ref[:]
            ar, ai = dot(d1c_ref[:].astype(jnp.bfloat16), x), dot(
                d1s_ref[:].astype(jnp.bfloat16), x)
            tr = ar * twc_ref[:] - ai * tws_ref[:]
            ti = ar * tws_ref[:] + ai * twc_ref[:]
            return tr.astype(jnp.bfloat16), ti.astype(jnp.bfloat16)

        etr, eti = stage_a(ev_ref)
        otr, oti = stage_a(od_ref)
        if stop_after == "stagea":
            for si in range(s_blk):
                outr_ref[0, si] = etr[0:n2, 0:n1].astype(jnp.int8)
                outi_ref[0, si] = otr[0:n2, 0:n1].astype(jnp.int8)
            return

        for si in range(s_blk):
            sl = slice(si * n2, (si + 1) * n2)

            def stage_b(tr, ti):
                re = dot_t(d2c_ref[:].astype(jnp.bfloat16), tr[:, sl]) - dot_t(
                    d2s_ref[:].astype(jnp.bfloat16), ti[:, sl])
                im = dot_t(d2c_ref[:].astype(jnp.bfloat16), ti[:, sl]) + dot_t(
                    d2s_ref[:].astype(jnp.bfloat16), tr[:, sl])
                return re, im

            er, ei = stage_b(etr, eti)
            orr, oi = stage_b(otr, oti)
            if stop_after == "stageb":
                outr_ref[0, si] = er.astype(jnp.int8)
                outi_ref[0, si] = orr.astype(jnp.int8)
                continue
            xr = er + untc_ref[:] * orr - unts_ref[:] * oi
            xi = ei + untc_ref[:] * oi + unts_ref[:] * orr
            qr = jnp.clip(jnp.rint(xr * (1 / 16)), -127.0, 127.0)
            qi = jnp.clip(jnp.rint(xi * (1 / 16)), -127.0, 127.0)
            outr_ref[0, si] = qr.astype(jnp.int8)
            outi_ref[0, si] = qi.astype(jnp.int8)

    return kernel


def run_variant(stop_after, S, s_blk):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A, P, TAPS, FFT = 80, 2, 16, 65536
    n = FFT // 2
    n1, n2 = 256, 128
    batch = A * P
    n_frames = S + TAPS - 1
    rng = np.random.default_rng(0)
    fr = jax.device_put(jnp.asarray(rng.integers(
        -64, 64, size=(batch, n_frames * n1, 2 * n2), dtype=np.int8)))
    win = jnp.asarray(rng.normal(size=(TAPS * n1, 2 * n2)).astype(np.float32))

    k1 = np.arange(n1)
    k2 = np.arange(n2)
    a1 = 2 * np.pi * np.outer(k1, k1) / n1
    a2 = 2 * np.pi * np.outer(k2, k2) / n2
    atw = 2 * np.pi * np.outer(k1, k2) / n
    kk = (k2[:, None] * n1 + k1[None, :]).astype(np.float64)
    aun = np.pi * kk / n
    sel = np.zeros((2 * n2, 2 * n2))
    sel[2 * k2, k2] = 1.0
    sel[2 * k2 + 1, n2 + k2] = 1.0
    consts = [jnp.asarray(c, jnp.float32) for c in (
        np.cos(a1), -np.sin(a1), np.cos(a2), -np.sin(a2),
        np.tile(np.cos(atw), (1, s_blk)), np.tile(-np.sin(atw), (1, s_blk)),
        np.cos(aun), -np.sin(aun), sel)]

    rows = (s_blk + TAPS - 1) * n1
    grid = (batch, S // s_blk)
    const_specs = [pl.BlockSpec(c.shape, lambda b, s: (0, 0),
                                memory_space=pltpu.VMEM) for c in consts]

    kern = functools.partial(
        build_kernel(stop_after), s_blk=s_blk, n_taps=TAPS, n1=n1, n2=n2)

    def call(frx):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((TAPS * n1, 2 * n2), lambda b, s: (0, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=(
                pl.BlockSpec((1, s_blk, n2, n1), lambda b, s: (b, s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s_blk, n2, n1), lambda b, s: (b, s, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, S, n2, n1), jnp.int8),
                jax.ShapeDtypeStruct((batch, S, n2, n1), jnp.int8),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, rows, 2 * n2), jnp.int8),
                pltpu.VMEM((n1, s_blk * n2), jnp.bfloat16),
                pltpu.VMEM((n1, s_blk * n2), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(frx, win, *consts)

    def factory(n_iters):
        @jax.jit
        def run(fr0):
            def body(i, carry):
                frc, acc = carry
                qr, qi = call(frc)
                probe = (qr.astype(jnp.float32).sum()
                         + qi.astype(jnp.float32).sum()) * 1e-30
                return (frc.at[0, 0, 0].add(probe.astype(jnp.int8)),
                        acc + probe)

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
    per = max((t6 - t2) / 4, 1e-9)
    samples = A * P * S * FFT
    print(f"S={S:3d} s_blk={s_blk:2d} {stop_after:7s}: {per*1e3:7.2f} ms "
          f"({samples/per/1e9:6.2f} Gs/s) [compile {comp:.0f}s]", flush=True)


def main(argv):
    S = int(argv[0]) if argv else 64
    stages = argv[1:] or ("dma", "conv", "fir", "deint", "stagea", "stageb", "full")
    for stop in stages:
        try:
            run_variant(stop, S, 16)
        except Exception as e:
            print(f"{stop}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
