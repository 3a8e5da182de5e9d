"""HONEST flagship streaming benchmark: loop-dependent ADC data.

The earlier marginal benches perturbed only the fine-delay input between
iterations, so XLA hoisted the entire loop-invariant FIR+FFT out of the
timing loop — they measured fine-delay→beamform only (and unfairly
penalised the fused kernel, which consumes the delay inside one pallas
call and therefore could not be hoisted). Here the ADC array itself is
data-dependent on the previous iteration (as in real streaming, where
every step ingests a new chunk), so every stage is timed.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/streaming_bench.py [S ...]
"""

from __future__ import annotations

import sys
import time


def main(spectra_list, backends):
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
        for backend, prec in backends:
            try:
                fb = FBEngine(
                    cfg, n_spectra=n_spectra, fengine=backend, precision=prec
                )
                adc, cd, fd, ph, dv = fb.example_inputs(margin=16)
                adc_d = jax.device_put(jnp.asarray(adc))
                cd_d, fd_d, ph_d = (
                    jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
                )
                fb.set_beam_delays(dv)
                blocks = fb._coeff_blocks

                def factory(n_iters):
                    @jax.jit
                    def run(adc0, fd, blocks):
                        def body(i, carry):
                            adc_c, fd_c, acc = carry
                            out = fb._step(adc_c, cd_d, fd_c, ph_d, blocks)
                            # full reduction: slice probes let XLA collapse
                            # batched dots / linear stages to one channel
                            probe = out.astype(jnp.float32).sum() * 1e-30
                            # new "ingested" chunk: a data-dependent
                            # single-element in-place update (0 at
                            # runtime) defeats loop-invariant hoisting
                            # without the full-array rewrite a real
                            # double-buffered ingest wouldn't pay
                            bump = probe.astype(jnp.int8)
                            return (
                                adc_c.at[0, 0, 0].add(bump),
                                fd_c + probe,
                                acc + probe,
                            )

                        return jax.lax.fori_loop(
                            0, n_iters, body, (adc0, fd, jnp.float32(0))
                        )[2]

                    return run

                per, comp = measure(factory, (adc_d, fd_d, blocks))
                log(
                    f"S={n_spectra:3d} {backend:9s}/{prec:4s}: "
                    f"{per*1e3:8.2f} ms/iter ({samples/per/1e9:6.2f} Gs/s) "
                    f"[compile {comp:.0f}s]"
                )
            except Exception as e:
                log(
                    f"S={n_spectra:3d} {backend:9s}/{prec:4s}: "
                    f"FAILED {type(e).__name__}: {e}"
                )


if __name__ == "__main__":
    spectra = [int(a) for a in sys.argv[1:]] or [32]
    main(
        spectra,
        [("xla", "bf16"), ("fused", "bf16"), ("xla", "f32"), ("fused_f32", "f32")],
    )
