"""F-kernel bottleneck diagnostic — same-process A/B variants.

Isolates where the fused F kernel's time goes at the flagship geometry
by perturbing one axis per variant (same methodology as
turned_stage_split.py, so numbers are comparable within one run):

- base      : taps=16, batch-A, s_blk=8 (the production config)
- taps1     : taps=1 — deletes 15/16 of the FIR VPU work AND the
              sliding-window DMA/convert amplification; base − taps1 ≈
              FIR + amplification cost
- taps4     : taps=4 — interpolates the FIR axis
- persi     : taps=16, per-si schedule s_blk=16 (no batch-A staging)
- sblk4     : taps=16, batch-A, s_blk=4 — more grid steps, less VMEM

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python benchmarks/f_diag.py [S [variant ...]]
"""

from __future__ import annotations

import sys
import time

import numpy as np

A, P, C = 80, 2, 32768
FFT = 2 * C

VARIANTS = {
    "base": dict(taps=16, batch_a=True, s_blk=None),
    "taps1": dict(taps=1, batch_a=True, s_blk=None),
    "taps4": dict(taps=4, batch_a=True, s_blk=None),
    "persi": dict(taps=16, batch_a=False, s_blk=16),
    "sblk4": dict(taps=16, batch_a=True, s_blk=4),
    # coarse delay folded into the kernel DMA (raw ADC in, no XLA
    # alignment pass) — compare against the stage-split 'f' stage
    # (XLA coarse + kernel), not against 'base' (no coarse at all).
    "ckernel": dict(taps=16, batch_a=True, s_blk=None, coarse="kernel"),
    "cxla": dict(taps=16, batch_a=True, s_blk=None, coarse="xla"),
    # rolling FIR-history ring (fresh groups only per step)
    "roll": dict(taps=16, batch_a=True, s_blk=None, rolling=True),
    "rollck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True
    ),
    # software-pipelined half-block batch-A schedule (ROADMAP lever 3)
    "pipe": dict(taps=16, batch_a=True, s_blk=None, pipeline=True),
    "piperollck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=True,
    ),
    # 4-way sub-block rotation (deeper VPU/MXU interleave)
    "pipe4rollck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=4,
    ),
    # wider block, 8-way rotation (needs the raised VMEM cap)
    "pipe8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96,
    ),
    # cross-block carry: last chunk's tail deferred into the next grid
    # step so no tail is ever exposed (whole-batch out window)
    "xpipe4rollck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=4, xpipe=True,
    ),
    "xpipe2rollck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=2, xpipe=True,
    ),
    "pipe4rollf32ck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=4, ring="float32",
    ),
    "pipe4rolltock": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=4, tapouter=True,
    ),
    # slab-major tap-outer: ring slabs stored transposed so the chunk
    # accumulator IS the stage-A operand (no relayout copy)
    "pipe4rollslabck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=4, tapouter="slab",
    ),
    "pipe2rollslabck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=2, tapouter="slab",
    ),
    "xpipewinrollck": dict(
        taps=16, batch_a=True, s_blk=None, coarse="kernel", rolling=True,
        pipeline=4, xpipe="win",
    ),
    "xpipe8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, xpipe=True, vmem_mb=96,
    ),
    # tap sweep AT the best schedule (round-4 second session): taps16
    # 47.19 / taps4 43.39 / taps1 42.46 ms same-run — the FIR is ~85%
    # hidden; the non-FIR path is the remaining floor (ROADMAP lever 2)
    # stage-B pair fused into one double-width dot (ct_bfuse)
    "bfuse8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, bfuse=True,
    ),
    # round-5 attack on the non-FIR dependency floor:
    # skew: chunk j's stage-B issued after chunk j+1's stage-A (MXU
    # back-to-back); bchunk: whole-chunk stage-B in ONE fat dot
    "skew8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, skew=True,
    ),
    "bchunk8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, bfuse="chunk",
    ),
    "skewbchunk8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, bfuse="chunk", skew=True,
    ),
    "bchunk4s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=4, vmem_mb=96, bfuse="chunk",
    ),
    "skewbchunk4s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=4, vmem_mb=96, bfuse="chunk", skew=True,
    ),
    # stage-ablation ladder AT the best schedule (kernel _ablate stops):
    # marginal of each pipeline stage in the production formulation
    "abl_dma8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, ablate="dma",
    ),
    # dma-row knob isolation: which of rolling/coarse makes the DMA row
    # 31.9 ms here vs 7.7 ms in the plain per-si kernel (2026-08-21)?
    "abl_dma_plain": dict(
        taps=16, batch_a=True, s_blk=16, pipeline=8, vmem_mb=96,
        ablate="dma",
    ),
    "abl_dma_roll": dict(
        taps=16, batch_a=True, s_blk=16, rolling=True, pipeline=8,
        vmem_mb=96, ablate="dma",
    ),
    "abl_dma_ck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", pipeline=8,
        vmem_mb=96, ablate="dma",
    ),
    "abl_dma_persi": dict(
        taps=16, batch_a=False, s_blk=16, ablate="dma",
    ),
    # chain_fd=False: fine delays constant across iterations, so XLA
    # hoists the [B, C/2, N1] cos/sin rotation-plane computation out of
    # the loop — the marginal vs the chained row is the per-step cost of
    # recomputing the planes (production updates delays at the
    # 256-accumulation cadence, so a cached-plane engine is honest)
    "nofd_pipe8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, chain_fd=False,
    ),
    "nofd_abl_dma8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, ablate="dma", chain_fd=False,
    ),
    # XLA-side coarse alignment AT the best schedule: the abl ladder
    # shows the in-kernel coarse DMA costs ~10-12 ms/step here, far
    # more than an XLA alignment pass's ~2.8 GB copy
    "cxla8s16roll": dict(
        taps=16, batch_a=True, s_blk=16, coarse="xla", rolling=True,
        pipeline=8, vmem_mb=96,
    ),
    # wire-rowed input: the stream born [A, P, rows, N2] (the kernel's
    # own HBM view) — deletes the per-step whole-stream relayout copy
    # that a flat-born stream pays (~15 ms, benchmarks/dma_bisect.py)
    "rowed8s16rollck": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True,
    ),
    "rowed_abl_dma8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, ablate="dma",
    ),
    # rowed x schedule levers: with the relayout floor gone, re-test the
    # MXU-side schedules (all were within noise at the old 47 ms floor)
    "rowed_bfuse": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, bfuse=True,
    ),
    "rowed_bchunk": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, bfuse="chunk",
    ),
    "rowed_skew": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, skew=True,
    ),
    "rowed_pipe4": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=4, vmem_mb=96, rowed=True,
    ),
    "rowed_taps1": dict(
        taps=1, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True,
    ),
    "rowed_s32": dict(
        taps=16, batch_a=True, s_blk=32, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True,
    ),
    "rowed_s32p16": dict(
        taps=16, batch_a=True, s_blk=32, coarse="kernel", rolling=True,
        pipeline=16, vmem_mb=96, rowed=True,
    ),
    # rolling off: the ring's per-step pl.when regions are scheduling
    # barriers (round-4 finding); the plain sliding window re-DMAs
    # (taps-1)/s_blk more input but has ONE unconditional DMA + convert
    "rowed_fine": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, skew="fine",
    ),
    "rowed_fine4": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=4, vmem_mb=96, rowed=True, skew="fine",
    ),
    "rowed_noroll": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", pipeline=8,
        vmem_mb=96, rowed=True,
    ),
    "rowed_abl_fir": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, ablate="fir",
    ),
    "rowed_abl_stagea": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, ablate="stagea",
    ),
    "rowed_abl_stageb": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, rowed=True, ablate="stageb",
    ),
    "abl_fir8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, ablate="fir",
    ),
    "abl_stagea8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, ablate="stagea",
    ),
    "abl_stageb8s16": dict(
        taps=16, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96, ablate="stageb",
    ),
    "taps1pipe8s16": dict(
        taps=1, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96,
    ),
    "taps4pipe8s16": dict(
        taps=4, batch_a=True, s_blk=16, coarse="kernel", rolling=True,
        pipeline=8, vmem_mb=96,
    ),
}


def run(S, name):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    v = VARIANTS[name]
    taps = v["taps"]
    coarse = v.get("coarse")
    rng = np.random.default_rng(5)
    n_frames = S + taps - 1
    if coarse:
        margin = 16384
        n_in = n_frames * FFT + margin
        raw = rng.integers(-64, 64, (A, P, n_in), dtype=np.int8)
        frames = jnp.asarray(
            raw.reshape(A, P, -1, 256) if v.get("rowed") else raw
        )
        cd = jnp.asarray(
            np.broadcast_to(
                rng.integers(0, 8192, A).astype(np.int32)[:, None], (A, P)
            )
        )
    else:
        frames = jnp.asarray(
            rng.integers(-64, 64, (A, P, n_frames, FFT), dtype=np.int8)
        )
    window = jnp.asarray(np.asarray(pfb_window(taps, FFT)))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, (A, P)).astype(np.float32))
    ph = -jnp.pi * fd / 2

    def step(frames_c, fd_c):
        if coarse == "kernel":
            qr, qi = fengine_fused(
                frames_c, window, fd_c, ph,
                n_channels=C, quant_scale=1.0 / 16.0,
                ct_batch_a=v["batch_a"], s_blk=v["s_blk"],
                coarse_delays=cd, n_spectra=S,
                rolling=v.get("rolling", False),
                ct_pipeline=v.get("pipeline", False),
                ct_xpipe=v.get("xpipe", False),
                rolling_dtype=v.get("ring", "bfloat16"),
                fir_tapouter=v.get("tapouter", False),
                ct_bfuse=v.get("bfuse", False),
                ct_skew=v.get("skew", False),
                _ablate=v.get("ablate"),
                rowed=v.get("rowed", False),
                vmem_limit_mb=v.get("vmem_mb"),
            )
        else:
            if coarse == "xla":
                from dpdk_dc_sand_tpu.ops.delay import coarse_delay

                aligned = coarse_delay(frames_c, cd[:, 0], n_frames * FFT)
                fr = aligned.reshape(A, P, n_frames, FFT)
            else:
                fr = frames_c
            qr, qi = fengine_fused(
                fr, window, fd_c, ph,
                n_channels=C, quant_scale=1.0 / 16.0,
                ct_batch_a=v["batch_a"], s_blk=v["s_blk"],
                rolling=v.get("rolling", False),
                ct_pipeline=v.get("pipeline", False),
                ct_xpipe=v.get("xpipe", False),
                rolling_dtype=v.get("ring", "bfloat16"),
                fir_tapouter=v.get("tapouter", False),
                ct_bfuse=v.get("bfuse", False),
                ct_skew=v.get("skew", False),
                _ablate=v.get("ablate"),
                vmem_limit_mb=v.get("vmem_mb"),
            )
        return qr.astype(jnp.float32).sum() + qi.astype(jnp.float32).sum()

    def factory(n_iters):
        @jax.jit
        def runf(f0, fd0):
            chain_fd = v.get("chain_fd", True)

            def body(i, carry):
                f_c, fd_c, acc = carry
                probe = step(f_c, fd_c) * 1e-30
                return (
                    f_c.at[(0,) * f_c.ndim].add(probe.astype(jnp.int8)),
                    fd_c + probe if chain_fd else fd_c,
                    acc + probe,
                )

            return jax.lax.fori_loop(0, n_iters, body, (f0, fd0, jnp.float32(0)))[2]

        return runf

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(frames, fd))
    comp = time.time() - t0
    float(r6(frames, fd))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(frames, fd))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(frames, fd))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    samples = A * P * S * FFT
    print(
        f"S={S} {name:6s}: {per*1e3:7.2f} ms ({samples/per/1e9:6.2f} Gs/s)"
        f" [compile {comp:.0f}s]",
        flush=True,
    )


def main(argv):
    S = int(argv[0]) if argv else 128
    names = argv[1:] or list(VARIANTS)
    for n in names:
        try:
            run(S, n)
        except Exception as e:
            print(f"{n}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
