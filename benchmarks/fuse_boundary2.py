"""Round 2 of F->B handoff variants: output-side layout.

Round 1 (fuse_boundary.py): dropping the trailing-2 transport stack
between the stages (planar int8 re/im planes) halved the step:
14.5 -> 7.46 ms at S=32. The remaining gap vs the staged sum (5.19 ms) is
on the output side — the final [P,C,S,B,2] trailing-2 stack — and the
int8 corner-turn transpose. Variants here:

- planar      : round-1 winner (trailing-2 output stack), reference point
- planar2out  : return (beam_re, beam_im) as two arrays, no output stack
- planar0     : stack outputs on a LEADING axis [2,P,C,S,B]
- direct2out  : no int8 pre-transpose — contract antennas straight out of
                the F-layout [A,P,S,C] planes; two outputs

Run on the real chip: `python benchmarks/fuse_boundary2.py [n_spectra ...]`
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(spectra_list):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.models import FBEngine
    from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay, coarse_delay
    from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise
    from dpdk_dc_sand_tpu.ops.requant import requantise

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)

    def log(*a):
        print(*a, flush=True)

    for n_spectra in spectra_list:
        fb = FBEngine(cfg, n_spectra=n_spectra)
        adc, cd, fd, ph, dv = fb.example_inputs(margin=16)
        adc_d = jax.device_put(jnp.asarray(adc))
        cd_d, fd_d, ph_d = jnp.asarray(cd), jnp.asarray(fd), jnp.asarray(ph)
        fb.set_beam_delays(dv)
        blocks = fb._coeff_blocks
        out_len = (n_spectra + cfg.n_taps - 1) * cfg.fft_size
        samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size

        def f_planes(adc, fd_c):
            aligned = coarse_delay(adc, cd_d, out_len)
            spectra = pfb_channelise(aligned, fb.window, n_channels=cfg.n_channels)
            re, im = apply_fine_delay(
                jnp.real(spectra), jnp.imag(spectra),
                fd_c[:, None], ph_d[:, None], n_channels=cfg.n_channels,
            )
            return requantise(re, 1 / 16), requantise(im, 1 / 16)  # [A,P,S,C] i8

        def dots_transposed(qr, qi, cos, sin):
            xr = jnp.transpose(qr, (1, 3, 2, 0))  # [P, C, S, A]
            xi = jnp.transpose(qi, (1, 3, 2, 0))
            wc = jnp.swapaxes(cos, -1, -2).astype(jnp.float32)  # [C, A, B]
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
            return jnp.moveaxis(rr - ii, 0, 1), jnp.moveaxis(ri + ir, 0, 1)

        def dots_direct(qr, qi, cos, sin):
            # contract antennas straight out of [A, P, S, C]
            wc = jnp.swapaxes(cos, -1, -2).astype(jnp.float32)  # [C, A, B]
            ws = jnp.swapaxes(sin, -1, -2).astype(jnp.float32)

            def cdot(x, w):
                # lhs [A,P,S,C]: batch (3,)=C, contract (0,)=A
                dims = (((0,), (1,)), ((3,), (0,)))
                return lax.dot_general(
                    x.astype(jnp.float32), w, dims,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # [C, P, S, B]

            rr = cdot(qr, wc); ii = cdot(qi, ws)
            ri = cdot(qr, ws); ir = cdot(qi, wc)
            return jnp.moveaxis(rr - ii, 0, 1), jnp.moveaxis(ri + ir, 0, 1)

        def step_planar(adc, fd_c, cos, sin):
            br, bi = dots_transposed(*f_planes(adc, fd_c), cos, sin)
            return (jnp.stack([br, bi], axis=-1),)

        def step_planar2out(adc, fd_c, cos, sin):
            return dots_transposed(*f_planes(adc, fd_c), cos, sin)

        def step_planar0(adc, fd_c, cos, sin):
            br, bi = dots_transposed(*f_planes(adc, fd_c), cos, sin)
            return (jnp.stack([br, bi], axis=0),)

        def step_direct2out(adc, fd_c, cos, sin):
            return dots_direct(*f_planes(adc, fd_c), cos, sin)

        def measure(step, tag):
            def factory(n_iters):
                @jax.jit
                def run(adc, fd, blocks):
                    cos, sin = blocks

                    def body(i, carry):
                        fd_c, acc = carry
                        outs = step(adc, fd_c, cos, sin)
                        probe = sum(o.reshape(-1)[0] for o in outs)
                        return (fd_c + probe * 1e-30, acc + probe)

                    return jax.lax.fori_loop(
                        0, n_iters, body, (fd, jnp.float32(0))
                    )[1]

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
                    f"S={n_spectra:3d} {tag:14s}: {per*1e3:8.2f} ms/iter "
                    f"({samples/per/1e9:6.1f} Gs/s) [compile {comp:.0f}s]"
                )
            except Exception as e:
                log(
                    f"S={n_spectra:3d} {tag:14s}: FAIL "
                    f"{type(e).__name__} {str(e)[:160]}"
                )

        measure(step_planar2out, "planar2out")
        measure(step_planar0, "planar0")
        measure(step_direct2out, "direct2out")
        measure(step_planar, "planar")


if __name__ == "__main__":
    spectra = [int(a) for a in sys.argv[1:]] or [32]
    main(spectra)
