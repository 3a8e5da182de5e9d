"""Flagship throughput vs beamform precision and spectra-per-step.

bf16 mode now stores the steering planes in bf16 at coefficient-update
time (halving the dominant B-stage HBM term); larger n_spectra amortises
coefficient reads across more samples. Sweep both.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/precision_spectra_bench.py
"""

from __future__ import annotations

import itertools
import sys
import time


def main(spectra_list, precisions):
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

    for n_spectra, prec in itertools.product(spectra_list, precisions):
        samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size
        try:
            fb = FBEngine(cfg, n_spectra=n_spectra, precision=prec)
            adc, cd, fd, ph, dv = fb.example_inputs(margin=16)
            adc_d = jax.device_put(jnp.asarray(adc))
            cd_d, fd_d, ph_d = jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
            fb.set_beam_delays(dv)
            blocks = fb._coeff_blocks

            def factory(n_iters):
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

            per, comp = measure(factory, (adc_d, fd_d, blocks))
            log(
                f"S={n_spectra:3d} {prec:4s}: {per*1e3:8.2f} ms/iter "
                f"({samples/per/1e9:6.1f} Gs/s) [compile {comp:.0f}s]"
            )
        except Exception as e:
            log(f"S={n_spectra:3d} {prec:4s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    spectra = [int(a) for a in sys.argv[1:]] or [32, 64]
    main(spectra, ["bf16", "f32"])
