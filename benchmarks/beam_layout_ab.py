"""Full-step A/B: B-stage epilogue deletion + int8 beam transport.

turned_stage_split.py attributed ~5 ms of the B-stage marginal to the
pure output-layout shuffle ([C, P·S, 2B] → [P, C, S, B, 2] split/
transpose/stack) and the f32 beam write is 2.1 GB/step at the flagship
config. Variants (same chained-ADC marginal methodology as bench.py):

- split_f32: the round-2 recorded path (epilogue + f32 beams).
- nat_f32:   beam_layout="natural" — no epilogue, f32 beams.
- nat_i8:    natural + beam_quant_scale (int8 SPEAD transport format,
             test_parameters.py:22-25) — no epilogue, 4× smaller write.

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python benchmarks/beam_layout_ab.py [variant ...]
"""

from __future__ import annotations

import sys
import time

VARIANTS = {
    "split_f32": dict(beam_layout="split", beam_quant_scale=None),
    "nat_f32": dict(beam_layout="natural", beam_quant_scale=None),
    "nat_i8": dict(beam_layout="natural", beam_quant_scale=0.25),
    # one-kernel corner turn + block-diagonal dot, packed wire format
    # (no HBM x_t round-trip, no unpack epilogue)
    "natf_f32": dict(
        beam_layout="natural", beam_quant_scale=None, bstage="fused"
    ),
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
    fb = FBEngine(cfg, n_spectra=S, precision="bf16", **v)
    budget = 4096
    slack = coarse_margin_samples(cfg.fft_size, cfg.n_taps, S, fb.ct_batch_a)
    adc, cd, fd, ph, dv = fb.example_inputs(
        margin=(slack or 0) + budget, delay_budget=budget
    )
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
        f"{name:10s}: {ms:7.2f} ms ({gsps:6.2f} Gs/s) [compile {comp:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    names = sys.argv[1:] or ["split_f32", "nat_f32", "nat_i8"]
    for n in names:
        run(n)
