"""Stage-level timing of the flagship FB step on the target chip.

Times (marginal method, see bench.py) the full fused step and its two
halves — F-stage (coarse delay + PFB + fine delay + requant) and B-stage
(corner turn + beamform) — at the BASELINE config, for n_spectra in
{32, 64}. Directs optimisation effort: the ROADMAP candidates (Pallas
beamform operand staging vs. FFT-chain fusion) pay off in proportion to
their stage's share.

Run on the real chip: `python benchmarks/stage_breakdown.py [n_spectra ...]`
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def main(spectra_list):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.models import FBEngine
    from dpdk_dc_sand_tpu.models.fbengine import _fb_step
    from dpdk_dc_sand_tpu.ops.beamform import beamform_planes

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)

    def log(*a):
        print(*a, flush=True)

    def measure(run_factory, inputs):
        r2, r6 = run_factory(2), run_factory(6)
        t0 = time.time()
        float(r2(*inputs))
        c = time.time() - t0
        float(r6(*inputs))
        t2 = t6 = float("inf")
        for _ in range(2):
            t0 = time.time()
            float(r2(*inputs))
            t2 = min(t2, time.time() - t0)
            t0 = time.time()
            float(r6(*inputs))
            t6 = min(t6, time.time() - t0)
        return max((t6 - t2) / 4, 1e-9), c

    for n_spectra in spectra_list:
        fb = FBEngine(cfg, n_spectra=n_spectra)
        adc, cd, fd, ph, dv = fb.example_inputs(margin=16)
        adc_d = jax.device_put(jnp.asarray(adc))
        cd_d, fd_d, ph_d = jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
        fb.set_beam_delays(dv)
        blocks = fb._coeff_blocks
        samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size

        # --- full step ---
        def full_factory(n_iters):
            @jax.jit
            def run(adc, fd, blocks):
                def body(i, carry):
                    fd_c, acc = carry
                    out = fb._step(adc, cd_d, fd_c, ph_d, blocks)
                    probe = out[0, 0, 0, 0, 0]
                    return (fd_c + probe * 1e-30, acc + probe)

                return jax.lax.fori_loop(0, n_iters, body, (fd, jnp.float32(0)))[1]

            return run

        per, comp = measure(full_factory, (adc_d, fd_d, blocks))
        log(
            f"S={n_spectra:3d} full   : {per*1e3:8.2f} ms/iter "
            f"({samples/per/1e9:6.1f} Gs/s) [compile {comp:.0f}s]"
        )

        # --- F-stage only (stop at the int8 transport format) ---
        from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay, coarse_delay
        from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise
        from dpdk_dc_sand_tpu.ops.requant import requantise

        out_len = (n_spectra + cfg.n_taps - 1) * cfg.fft_size

        def f_stage(adc, fd_c):
            aligned = coarse_delay(adc, cd_d, out_len)
            spectra = pfb_channelise(aligned, fb.window, n_channels=cfg.n_channels)
            re, im = apply_fine_delay(
                jnp.real(spectra), jnp.imag(spectra),
                fd_c[:, None], ph_d[:, None], n_channels=cfg.n_channels,
            )
            return requantise(re, 1 / 16), requantise(im, 1 / 16)

        def fstage_factory(n_iters):
            @jax.jit
            def run(adc, fd):
                def body(i, carry):
                    fd_c, acc = carry
                    qr, qi = f_stage(adc, fd_c)
                    # full reduction: the 256x256 matmul-FFT is sliceable,
                    # a single-element probe lets XLA DCE the whole F chain
                    probe = (
                        qr.astype(jnp.float32).sum() + qi.astype(jnp.float32).sum()
                    ) * 1e-30
                    return (fd_c + probe * 1e-30, acc + probe)

                return jax.lax.fori_loop(0, n_iters, body, (fd, jnp.float32(0)))[1]

            return run

        per_f, comp = measure(fstage_factory, (adc_d, fd_d))
        log(f"S={n_spectra:3d} F-only : {per_f*1e3:8.2f} ms/iter [compile {comp:.0f}s]")

        # --- B-stage only (corner turn + planar 4-dot) from static int8 ---
        rng = np.random.default_rng(0)
        quant = jax.device_put(
            jnp.asarray(
                rng.integers(
                    -64, 64,
                    size=(2, cfg.n_ants, cfg.n_pols, n_spectra, cfg.n_channels),
                    dtype=np.int8,
                )
            )
        )

        def bstage_factory(n_iters):
            @jax.jit
            def run(quant, blocks):
                cos, sin = blocks

                def body(i, carry):
                    gain, acc = carry
                    xr = jnp.transpose(quant[0], (1, 3, 2, 0))
                    xi = jnp.transpose(quant[1], (1, 3, 2, 0))
                    br, bi = beamform_planes(xr, xi, cos * gain, sin, "f32")
                    probe = br[0, 0, 0, 0]
                    return (gain + probe * 1e-30, acc + probe)

                return jax.lax.fori_loop(
                    0, n_iters, body, (jnp.float32(1), jnp.float32(0))
                )[1]

            return run

        per_b, comp = measure(bstage_factory, (quant, blocks))
        log(f"S={n_spectra:3d} B-only : {per_b*1e3:8.2f} ms/iter [compile {comp:.0f}s]")
        log(f"S={n_spectra:3d} F+B sum: {(per_f+per_b)*1e3:8.2f} ms (vs full {per*1e3:.2f})")


if __name__ == "__main__":
    spectra = [int(a) for a in sys.argv[1:]] or [32, 64]
    main(spectra)
