"""North-star benchmark: Msamples/s/chip through the fused PFB+beamform.

Runs the flagship F+B pipeline (80 antennas, 2 pols, 32k channels, 16
beams, 16-tap PFB — the BASELINE.md target config) on the local
accelerator and prints ONE JSON line.

Methodology (this environment's relay adds ~2-3 ms fixed cost per dispatch
and per loop iteration, and `block_until_ready` is unreliable through the
tunnel — see .claude/skills/verify/SKILL.md):
- the step is iterated inside a jitted ``fori_loop`` whose carry makes the
  **ADC array itself** data-dependent on the previous iteration (as in
  real streaming, where every step ingests a new chunk) — this defeats
  loop-invariant hoisting of the FIR+FFT stages (an earlier version
  perturbed only the fine delay and XLA hoisted the whole F-stage out of
  the timing loop, inflating the number ~10x);
- the probe is a full reduction of the output (slice probes let XLA
  collapse channel-batched stages to one channel);
- a scalar is pulled at the end (forces completion);
- per-iteration time is the *marginal* cost between a 2-iteration and a
  6-iteration run of the same program, cancelling dispatch and setup.

``vs_baseline`` is throughput divided by the MeerKAT L-band digitiser rate
(1712 Msamples/s per antenna-pol, BeamformerParameters.h:16) — i.e. how
many realtime antenna-pol streams one chip sustains through the full
channelise+beamform chain.
"""

from __future__ import annotations

import json
import time


ADC_RATE_MSPS = 1712.0  # MeerKAT digitiser, Msamples/s per antenna-pol


def build(cfg, n_spectra, fengine, bstage="planar", ct_batch_a=False,
          beam_layout="split", **engine_kw):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.models import FBEngine

    fb = FBEngine(
        cfg, n_spectra=n_spectra, fengine=fengine, precision="bf16",
        bstage=bstage, ct_batch_a=ct_batch_a, beam_layout=beam_layout,
        **engine_kw,
    )
    # Enough trailing ADC margin that the engine takes the in-kernel
    # coarse-delay path (DMA row offsets + in-VMEM sub-row shift) instead
    # of the XLA alignment pass — the production ingest provisions this
    # slack the same way (models/fbengine.coarse path; ROADMAP). The
    # delay *budget* is separate from the DMA slack: delays are drawn in
    # [0, budget) only, and budget > one DMA row block (8·N2 = 2048 at
    # the flagship geometry) so nonzero 8-aligned DMA row offsets are
    # genuinely exercised by the measured path.
    budget = 4096
    rowed = False
    if fengine != "xla":
        from dpdk_dc_sand_tpu.ops.fengine_pallas import (
            coarse_margin_samples,
            ingest_alignment,
        )

        slack = coarse_margin_samples(
            cfg.fft_size, cfg.n_taps, n_spectra, fb.ct_batch_a,
            fb.fengine_s_blk,
        )
        margin = (slack or 0) + budget
        # Wire-rowed ingest (the production feed's upload shape): the
        # stream is born [A, P, rows, N2], deleting the per-step
        # whole-stream relayout (benchmarks/dma_bisect.py, −25.7 ms).
        n2 = ingest_alignment(cfg.fft_size)
        rowed = n2 is not None and (fb.samples_in + margin) % n2 == 0
    else:
        margin = budget
    adc, cd, fd, ph, dv = fb.example_inputs(
        margin=margin, delay_budget=budget, rowed=rowed
    )
    adc_d = jax.device_put(jnp.asarray(adc))
    cd_d, fd_d = jnp.asarray(cd), jnp.asarray(fd)
    ph_d = jnp.asarray(ph)
    # Steering blocks AND fine-rotation planes generated once per delay
    # update (256-accumulation reuse cadence); the steady-state step
    # consumes both caches. Recomputing the rotation planes per step
    # measured ~14 ms at the flagship config (f_diag nofd_* rows).
    fb.set_beam_delays(dv)
    blocks = fb._coeff_blocks
    rot = fb._fine_rot(fd_d, ph_d)

    def chained(n_iters):
        @jax.jit
        def run(adc, fd, blocks, rot):
            # blocks/planes must be arguments: closing over
            # multi-hundred-MB device arrays bakes them into the
            # executable as constants and the compile never finishes.
            def body(i, carry):
                adc_c, fd_c, rot_c, acc = carry
                out = fb._step(
                    adc_c, cd_d, fd_c, ph_d, blocks, rot_planes=rot_c
                )
                probe = out.astype(jnp.float32).sum() * 1e-30
                # New "ingested" chunk: a data-dependent single-element
                # update (0 at runtime) chains the iterations without the
                # full-array rewrite a real double-buffered ingest
                # wouldn't pay. The rotation planes are loop-carried the
                # same way: read from HBM every step (as production
                # does), never recomputed inside the loop (as production
                # doesn't).
                if rot_c is not None:
                    rc, rs = rot_c
                    rot_n = (rc.at[0, 0, 0].add(probe), rs)
                else:
                    rot_n = rot_c
                return (
                    adc_c.at[(0,) * adc_c.ndim].add(probe.astype(jnp.int8)),
                    fd_c + probe,
                    rot_n,
                    acc + probe,
                )

            return jax.lax.fori_loop(
                0, n_iters, body, (adc, fd, rot, jnp.float32(0))
            )[3]

        return run

    return chained, adc_d, fd_d, blocks, rot


def measure(cfg, n_spectra, fengine, bstage="planar", ct_batch_a=False,
            beam_layout="split", **engine_kw):
    chained, adc_d, fd_d, blocks, rot = build(
        cfg, n_spectra, fengine, bstage, ct_batch_a, beam_layout, **engine_kw
    )
    r2, r6 = chained(2), chained(6)
    float(r2(adc_d, fd_d, blocks, rot))  # compile
    float(r6(adc_d, fd_d, blocks, rot))  # compile
    t2 = t6 = float("inf")
    for _ in range(2):  # best-of to shed relay jitter
        t0 = time.time()
        float(r2(adc_d, fd_d, blocks, rot))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(adc_d, fd_d, blocks, rot))
        t6 = min(t6, time.time() - t0)
    per_iter = max((t6 - t2) / 4, 1e-9)
    samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size
    return samples / per_iter / 1e6


def main() -> None:
    from dpdk_dc_sand_tpu.config import ArrayConfig

    flagship = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    attempts = [
        # fused F kernel + batch-A stage-A schedule + Pallas corner-turn
        # B-stage ("turned") + dot-natural beam layout is the measured-
        # best config: the 394 GB/s corner-turn kernel replaces the
        # ~34 GB/s XLA turn (ops/corner_turn.py), and the natural
        # [C, P·S, 2B] output deletes the ~7 ms split/transpose/stack
        # epilogue (benchmarks/beam_layout_ab.py, 2026-08-21:
        # 66.7 ms vs 74.1 split). Fallbacks in decreasing ambition for
        # OOM/unsupported geometry.
        # S=256 amortises per-batch boundary work (ring reload, grid
        # edges): +6% over S=128 same-run (23.25 vs 21.91 Gs/s,
        # 2026-08-21).
        # s_blk=16 + 8-way rotation (needs the raised VMEM cap): round-3
        # measured it within jitter of the default F-only; in the full
        # step the attempt ladder lets the measured-best win.
        (flagship, 256, "fused", True, "fused", "natural",
         dict(fengine_s_blk=16, fengine_vmem_mb=96, fengine_pipeline=8,
              fengine_bfuse=True)),
        (flagship, 256, "fused", True, "fused", "natural",
         dict(fengine_s_blk=16, fengine_vmem_mb=96, fengine_pipeline=8)),
        (flagship, 256, "fused", True, "fused", "natural"),
        (flagship, 128, "fused", True, "fused", "natural"),
        (flagship, 128, "fused", True, "turned", "natural"),
        (flagship, 128, "fused", True, "turned", "split"),
        (flagship, 128, "fused", True, "planar", "split"),
        (flagship, 128, "fused", False, "planar", "split"),
        (flagship, 64, "fused", False, "planar", "split"),
        (flagship, 32, "fused", False, "planar", "split"),
        (flagship, 32, "xla", False, "planar", "split"),
        (ArrayConfig(n_ants=64, n_channels=8192, n_beams=16, n_taps=16), 64, "xla", False, "planar", "split"),
        (ArrayConfig(n_ants=16, n_channels=1024, n_beams=16, n_taps=16), 64, "xla", False, "planar", "split"),
    ]
    value, used = None, None
    #: The first N attempts are tuning CONTENDERS at the same geometry:
    #: measure all that run and keep the fastest (a first-success break
    #: would let a slower tuning variant shadow the default).
    contenders = 3
    for idx, (cfg, n_spectra, fengine, batch_a, bstage, layout, *extra) in (
        enumerate(attempts)
    ):
        try:
            v = measure(cfg, n_spectra, fengine, bstage=bstage,
                        ct_batch_a=batch_a, beam_layout=layout,
                        **(extra[0] if extra else {}))
        except Exception as e:  # OOM / unsupported: fall back smaller
            print(f"# bench config failed ({type(e).__name__}); falling back", flush=True)
            continue
        if value is None or v > value:
            value, used = v, (cfg, n_spectra)
        if idx >= contenders - 1 and value is not None:
            break
    if value is None:
        raise SystemExit("all bench configs failed")
    cfg, n_spectra = used
    # Honest capacity framing: vs_baseline counts realtime *antenna-pol
    # streams* per chip; a full instrument needs n_ants·n_pols of them,
    # so a whole 80-ant dual-pol array at this rate needs this many
    # chips (the reference's GPUs-per-ingest cost model,
    # BeamformerCoefficientTest.cu:441-448).
    streams = cfg.n_ants * cfg.n_pols
    record = {
        "metric": (
            "PFB+beamform pipeline throughput "
            f"({cfg.n_ants} ant x {cfg.n_channels} chan x "
            f"{cfg.n_beams} beams, 16-tap PFB)"
        ),
        "value": round(value, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(value / ADC_RATE_MSPS, 2),
        "chips_per_instrument": round(streams * ADC_RATE_MSPS / value, 2),
    }
    # Score against the measured first-principles ceiling (ROOFLINE.json,
    # benchmarks/roofline.py — the committed max of the HBM/MXU/VPU
    # lower bounds at this geometry): "fast" as a judged number.
    import os

    rf = os.path.join(os.path.dirname(__file__), "ROOFLINE.json")
    if os.path.exists(rf):
        with open(rf) as f:
            ceiling = json.load(f).get("ceiling_msamples_per_s")
        if ceiling:
            record["roofline_frac"] = round(value / ceiling, 3)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
