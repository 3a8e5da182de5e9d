"""Stage ablation of the direct-CT fused F-engine kernel (flagship config).

Bench-only trimmed copy of ``ops/fengine_pallas._fengine_kernel_ct`` with a
static ``stop_after`` switch, measured with the honest chained methodology
(bench.py): each stage's marginal cost on hardware.

- ``dma``    : DMA in, write a constant — input-stream floor.
- ``fir``    : + whole-tile int8→bf16 conversion + 16-tap FIR (VPU).
- ``stagea`` : + stage-A DFT matmuls + twiddle (MXU+VPU).
- ``stageb`` : + stage-B half-output DFT matmuls (MXU).
- ``full``   : + fine delay + requant (== production ct kernel).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ct_ablate.py [S [stage ...]]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

A, P, FFT, TAPS = 80, 2, 65536, 16


def run_variant(stop_after, S, s_blk):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = 256, 256
    assert n1 * n2 == FFT

    def kernel(
        frames_hbm, wina_ref, d1c_ref, d1s_ref, d2c_ref, d2s_ref,
        twc_ref, tws_ref, rotc_ref, rots_ref,
        outr_ref, outi_ref, scratch, sems,
    ):
        b = pl.program_id(0)
        s = pl.program_id(1)
        n_s = pl.num_programs(1)
        rows = (s_blk + TAPS - 1) * n1

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
            probe = scratch[slot][0:n2 // 2, 0:n1].astype(jnp.int8)
            for si in range(s_blk):
                outr_ref[0, si] = probe
                outi_ref[0, si] = probe
            return

        rot_c, rot_s = rotc_ref[0], rots_ref[0]
        d1c, d1s = dft_c(d1c_ref), dft_c(d1s_ref)
        d2c, d2s = dft_c(d2c_ref), dft_c(d2s_ref)

        tile = scratch[slot].astype(jnp.bfloat16)
        for si in range(s_blk):
            acc = tile[si * n1:(si + 1) * n1] * wina_ref[0:n1]
            for tap in range(1, TAPS):
                acc = acc + (
                    tile[(si + tap) * n1:(si + tap + 1) * n1]
                    * wina_ref[tap * n1:(tap + 1) * n1]
                )
            if stop_after == "fir":
                outr_ref[0, si] = acc[0:n2 // 2, 0:n1].astype(jnp.int8)
                outi_ref[0, si] = acc[n2 // 2:n2, 0:n1].astype(jnp.int8)
                continue
            accd = acc.astype(jnp.bfloat16)

            ar, ai = dot(d1c, accd), dot(d1s, accd)
            tr = ar * twc_ref[:] - ai * tws_ref[:]
            ti = ar * tws_ref[:] + ai * twc_ref[:]
            if stop_after == "stagea":
                outr_ref[0, si] = tr[0:n2 // 2, 0:n1].astype(jnp.int8)
                outi_ref[0, si] = ti[0:n2 // 2, 0:n1].astype(jnp.int8)
                continue
            trd, tid = tr.astype(jnp.bfloat16), ti.astype(jnp.bfloat16)

            re = dot_t(d2c, trd) - dot_t(d2s, tid)
            im = dot_t(d2c, tid) + dot_t(d2s, trd)
            if stop_after == "stageb":
                outr_ref[0, si] = re.astype(jnp.int8)
                outi_ref[0, si] = im.astype(jnp.int8)
                continue

            outr = re * rot_c - im * rot_s
            outi = re * rot_s + im * rot_c
            qr = jnp.clip(jnp.rint(outr / 16.0), -127.0, 127.0)
            qi = jnp.clip(jnp.rint(outi / 16.0), -127.0, 127.0)
            outr_ref[0, si] = qr.astype(jnp.int8)
            outi_ref[0, si] = qi.astype(jnp.int8)

    def dft_c(ref):
        return ref[:].astype(jnp.bfloat16)

    def dot(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    def dot_t(w, a):
        return jax.lax.dot_general(
            w, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    batch = A * P
    n_frames = S + TAPS - 1
    rng = np.random.default_rng(7)
    fr = jnp.asarray(rng.integers(
        -64, 64, size=(batch, n_frames * n1, n2), dtype=np.int8))
    wina = jnp.asarray(rng.standard_normal((TAPS * n1, n2)), jnp.float32)
    k1, k2h, nn2 = np.arange(n1), np.arange(n2 // 2), np.arange(n2)
    a1 = 2 * np.pi * np.outer(k1, k1) / n1
    a2 = 2 * np.pi * np.outer(k2h, nn2) / n2
    atw = 2 * np.pi * np.outer(k1, nn2) / FFT
    consts = [jnp.asarray(c, jnp.float32) for c in (
        np.cos(a1), -np.sin(a1), np.cos(a2), -np.sin(a2),
        np.cos(atw), -np.sin(atw))]
    rotc = jnp.asarray(rng.standard_normal((batch, n2 // 2, n1)), jnp.float32)
    rots = jnp.asarray(rng.standard_normal((batch, n2 // 2, n1)), jnp.float32)

    rows = (s_blk + TAPS - 1) * n1
    rot_spec = pl.BlockSpec(
        (1, n2 // 2, n1), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(batch, S // s_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wina.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(c.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM)
              for c in consts],
            rot_spec, rot_spec,
        ],
        out_specs=(pl.BlockSpec(
            (1, s_blk, n2 // 2, n1), lambda b, s: (b, s, 0, 0),
            memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(
            (batch, S, n2 // 2, n1), jnp.int8),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, rows, n2), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    def factory(n_iters):
        @jax.jit
        def run(fr0):
            def body(i, carry):
                frc, acc = carry
                qr, qi = call(frc, wina, *consts, rotc, rots)
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
    S = int(argv[0]) if argv else 32
    stages = argv[1:] or ("dma", "fir", "stagea", "stageb", "full")
    for stop in stages:
        try:
            run_variant(stop, S, 16)
        except Exception as e:
            print(f"{stop}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
