"""Flagship-step shoot-out: XLA-composed F-engine vs the fused Pallas kernel.

Times the full FB step (marginal method, see bench.py) with
``fengine="xla"`` (pallas FIR + XLA rFFT + fused elementwise) and
``fengine="fused"`` (ops/fengine_pallas.py single kernel), plus the fused
F-stage alone with a full-reduction probe (slice-DCE-proof).

Run on the real chip:
``PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fused_fengine_bench.py [n_spectra ...]``
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(spectra_list):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.models import FBEngine

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
        samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size
        for backend in ("fused", "xla"):
            fb = FBEngine(cfg, n_spectra=n_spectra, fengine=backend)
            adc, cd, fd, ph, dv = fb.example_inputs(margin=16)
            adc_d = jax.device_put(jnp.asarray(adc))
            cd_d, fd_d, ph_d = jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
            fb.set_beam_delays(dv)
            blocks = fb._coeff_blocks

            def full_factory(n_iters):
                @jax.jit
                def run(adc, fd, blocks):
                    def body(i, carry):
                        fd_c, acc = carry
                        out = fb._step(adc, cd_d, fd_c, ph_d, blocks)
                        probe = out[0, 0, 0, 0, 0]
                        return (fd_c + probe * 1e-30, acc + probe)

                    return jax.lax.fori_loop(
                        0, n_iters, body, (fd, jnp.float32(0))
                    )[1]

                return run

            try:
                per, comp = measure(full_factory, (adc_d, fd_d, blocks))
            except Exception as e:
                log(f"S={n_spectra:3d} {backend:5s}: FAILED {type(e).__name__}: {e}")
                continue
            log(
                f"S={n_spectra:3d} {backend:5s} full: {per*1e3:8.2f} ms/iter "
                f"({samples/per/1e9:6.1f} Gs/s) [compile {comp:.0f}s]"
            )

        # fused F-stage alone, full-reduction probe
        from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused
        from dpdk_dc_sand_tpu.ops.delay import coarse_delay
        from dpdk_dc_sand_tpu.golden.pfb import pfb_window

        win = jnp.asarray(np.asarray(pfb_window(cfg.n_taps, cfg.fft_size)))
        out_len = (n_spectra + cfg.n_taps - 1) * cfg.fft_size
        fd2 = jnp.broadcast_to(fd_d[:, None], (cfg.n_ants, cfg.n_pols))
        ph2 = jnp.broadcast_to(ph_d[:, None], (cfg.n_ants, cfg.n_pols))

        def fstage_factory(n_iters):
            @jax.jit
            def run(adc, fd):
                def body(i, carry):
                    fd_c, acc = carry
                    frames = coarse_delay(adc, cd_d, out_len).reshape(
                        cfg.n_ants, cfg.n_pols, -1, cfg.fft_size
                    )
                    qr, qi = fengine_fused(
                        frames, win,
                        fd2 + fd_c[:, None] * 0.0, ph2,
                        n_channels=cfg.n_channels, quant_scale=1 / 16,
                    )
                    probe = (
                        qr.astype(jnp.float32).sum()
                        + qi.astype(jnp.float32).sum()
                    ) * 1e-30
                    return (fd_c + probe * 1e-30, acc + probe)

                return jax.lax.fori_loop(0, n_iters, body, (fd, jnp.float32(0)))[1]

            return run

        try:
            per_f, comp = measure(fstage_factory, (adc_d, fd_d))
            log(
                f"S={n_spectra:3d} fused F-only: {per_f*1e3:8.2f} ms/iter "
                f"[compile {comp:.0f}s]"
            )
        except Exception as e:
            log(f"S={n_spectra:3d} fused F-only: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    spectra = [int(a) for a in sys.argv[1:]] or [32]
    main(spectra)
