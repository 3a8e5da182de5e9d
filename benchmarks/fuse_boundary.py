"""Variants of the F->B handoff inside the fused step.

stage_breakdown.py found full(S=32) = 14.4 ms but F-only + B-only = 5.2 ms:
XLA's layout assignment propagates the B-stage transpose back through the
FFT chain, inserting padded f32 copies (and OOMing at S=64). Candidates:

- barrier: lax.optimization_barrier on the int8 transport block between
  the stages (keeps the staged programs' layouts);
- planar: never build the trailing-2 stack on-chip — requantise re/im as
  separate [A,P,S,C] int8 planes and feed the beamform dots directly;
- planar+barrier.

Run on the real chip: `python benchmarks/fuse_boundary.py [n_spectra]`.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(n_spectra):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.models import FBEngine
    from dpdk_dc_sand_tpu.ops.beamform import beamform
    from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay, coarse_delay
    from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise
    from dpdk_dc_sand_tpu.ops.requant import requantise

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)

    def log(*a):
        print(*a, flush=True)

    fb = FBEngine(cfg, n_spectra=n_spectra)
    adc, cd, fd, ph, dv = fb.example_inputs(margin=16)
    adc_d = jax.device_put(jnp.asarray(adc))
    cd_d, fd_d, ph_d = jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
    fb.set_beam_delays(dv)
    blocks = fb._coeff_blocks
    out_len = (n_spectra + cfg.n_taps - 1) * cfg.fft_size
    samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size

    def f_common(adc, fd_c):
        aligned = coarse_delay(adc, cd_d, out_len)
        spectra = pfb_channelise(aligned, fb.window, n_channels=cfg.n_channels)
        return apply_fine_delay(
            jnp.real(spectra), jnp.imag(spectra),
            fd_c[:, None], ph_d[:, None], n_channels=cfg.n_channels,
        )

    def step_current(adc, fd_c, cos, sin):
        re, im = f_common(adc, fd_c)
        quant = requantise(jnp.stack([re, im], axis=-1), 1 / 16)
        bdata = jnp.transpose(quant, (1, 3, 2, 0, 4))
        br, bi = beamform(bdata, cos, sin, "f32")
        return jnp.stack([br, bi], axis=-1)

    def step_barrier(adc, fd_c, cos, sin):
        re, im = f_common(adc, fd_c)
        quant = requantise(jnp.stack([re, im], axis=-1), 1 / 16)
        quant = lax.optimization_barrier(quant)
        bdata = jnp.transpose(quant, (1, 3, 2, 0, 4))
        br, bi = beamform(bdata, cos, sin, "f32")
        return jnp.stack([br, bi], axis=-1)

    def planar_dots(xr, xi, cos, sin):
        # xr/xi: [P, C, S, A] int8; cos/sin [C, B, A] f32
        wc = jnp.swapaxes(cos, -1, -2).astype(jnp.float32)
        ws = jnp.swapaxes(sin, -1, -2).astype(jnp.float32)

        def cdot(x, w):
            dims = (((3,), (1,)), ((1,), (0,)))
            return lax.dot_general(
                x.astype(jnp.float32), w, dims,
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [C, P, S, B]

        rr = cdot(xr, wc); ii = cdot(xi, ws)
        ri = cdot(xr, ws); ir = cdot(xi, wc)
        br = jnp.moveaxis(rr - ii, 0, 1)
        bi = jnp.moveaxis(ri + ir, 0, 1)
        return br, bi

    def step_planar(adc, fd_c, cos, sin, barrier):
        re, im = f_common(adc, fd_c)
        qr = requantise(re, 1 / 16)  # [A, P, S, C] int8
        qi = requantise(im, 1 / 16)
        if barrier:
            qr, qi = lax.optimization_barrier((qr, qi))
        xr = jnp.transpose(qr, (1, 3, 2, 0))  # [P, C, S, A]
        xi = jnp.transpose(qi, (1, 3, 2, 0))
        br, bi = planar_dots(xr, xi, cos, sin)
        return jnp.stack([br, bi], axis=-1)

    def measure(step, tag):
        def factory(n_iters):
            @jax.jit
            def run(adc, fd, blocks):
                cos, sin = blocks

                def body(i, carry):
                    fd_c, acc = carry
                    out = step(adc, fd_c, cos, sin)
                    probe = out[0, 0, 0, 0, 0]
                    return (fd_c + probe * 1e-30, acc + probe)

                return jax.lax.fori_loop(0, n_iters, body, (fd, jnp.float32(0)))[1]

            return run

        try:
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
            per = max((t6 - t2) / 4, 1e-9)
            log(
                f"S={n_spectra:3d} {tag:16s}: {per*1e3:8.2f} ms/iter "
                f"({samples/per/1e9:6.1f} Gs/s) [compile {comp:.0f}s]"
            )
        except Exception as e:
            log(f"S={n_spectra:3d} {tag:16s}: FAIL {type(e).__name__} {str(e)[:160]}")

    measure(step_barrier, "barrier")
    measure(lambda a, f, c, s: step_planar(a, f, c, s, False), "planar")
    measure(lambda a, f, c, s: step_planar(a, f, c, s, True), "planar+barrier")
    measure(step_current, "current")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
