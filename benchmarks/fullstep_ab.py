"""Full-step A/B: in-kernel coarse+rolling vs XLA-coarse, same stream.

The F-stage-only diagnostic (f_diag.py) showed 63.0 -> 54.4 ms from the
in-kernel coarse delay + rolling ring, but the full-step flagship bench
barely moved; this harness measures the COMPLETE default step (fused F +
turned B) with the margin present (kernel coarse path) vs sliced away
(XLA alignment fallback), plus rolling on/off, same methodology as
bench.py (chained ADC, marginal 2-vs-6 iteration timing).

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python benchmarks/fullstep_ab.py [variant ...]
variants: kernel_roll kernel_noroll xla_roll xla_noroll
"""

from __future__ import annotations

import sys
import time

VARIANTS = {
    "kernel_roll": dict(coarse="kernel", rolling=True),
    "kernel_noroll": dict(coarse="kernel", rolling=False),
    "xla_roll": dict(coarse="xla", rolling=True),
    "xla_noroll": dict(coarse="xla", rolling=False),
}


def run(name):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.models import FBEngine
    from dpdk_dc_sand_tpu.ops.fengine_pallas import coarse_margin_samples

    v = VARIANTS[name]
    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    S = 128
    fb = FBEngine(
        cfg, n_spectra=S, precision="bf16", fengine_rolling=v["rolling"]
    )
    # Shared in-budget delays: cd drawn in [0, 16) for every variant, so
    # the kernel-coarse and XLA legs apply the SAME alignments and their
    # outputs are comparable (not just their timings).
    slack = coarse_margin_samples(cfg.fft_size, cfg.n_taps, S, fb.ct_batch_a)
    adc, cd, fd, ph, dv = fb.example_inputs(
        margin=(slack or 0) + 16, delay_budget=16
    )
    if v["coarse"] == "xla":
        adc = adc[..., : fb.samples_in + 16]
    adc_d = jax.device_put(jnp.asarray(adc))
    cd_d, fd_d, ph_d = jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
    fb.set_beam_delays(dv)
    blocks = fb._coeff_blocks

    def factory(n_iters):
        @jax.jit
        def runf(adc0, fd0, blk):
            def body(i, carry):
                adc_c, fd_c, acc = carry
                out = fb._step(adc_c, cd_d, fd_c, ph_d, blk)
                probe = out.astype(jnp.float32).sum() * 1e-30
                return (
                    adc_c.at[0, 0, 0].add(probe.astype(jnp.int8)),
                    fd_c + probe,
                    acc + probe,
                )

            return jax.lax.fori_loop(
                0, n_iters, body, (adc0, fd0, jnp.float32(0))
            )[2]

        return runf

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(adc_d, fd_d, blocks))
    comp = time.time() - t0
    float(r6(adc_d, fd_d, blocks))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(adc_d, fd_d, blocks))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(adc_d, fd_d, blocks))
        t6 = min(t6, time.time() - t0)
    ms = max((t6 - t2) / 4, 1e-9) * 1e3
    gsps = cfg.n_ants * cfg.n_pols * S * cfg.fft_size / (ms * 1e-3) / 1e9
    print(
        f"{name:14s}: {ms:7.2f} ms ({gsps:6.2f} Gs/s) [compile {comp:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    names = sys.argv[1:] or ["kernel_roll", "xla_noroll"]
    for n in names:
        run(n)
