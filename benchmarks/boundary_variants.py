"""F→B handoff experiments at the flagship config.

Stage timing (stage_breakdown.py) shows full-step ≈ 8 ms while the
F-stage alone is ≈ 1.9 ms; the remainder sits in the corner turn +
int8→f32 conversion + beamform dots. These variants probe which layout /
materialisation decision XLA is getting wrong in the full program:

  v0  current: jnp.transpose int8 planes → beamform_planes (f32 HIGHEST)
  v1  optimization_barrier AFTER the transpose (force int8 [P,C,S,A]
      materialisation; dots then fuse convert into operand reads)
  v2  optimization_barrier BEFORE the transpose (int8 [A,P,S,C]
      materialised — the isolated B-bench condition)
  v3  no transpose: dot_general straight off [A,P,S,C] (batch=C,
      contract=A)
  v4  v1 with bf16 operands (halved weight traffic)
  v5  flat-batch coarse delay: adc pre-reshaped [A·P, n] so the frame
      reshape into the pallas FIR is layout-trivial (the OOM dump shows
      reshape.73 materialising a 790 MB s8 relayout copy because the
      coarse-delay fusion emits layout {2,0,1})
  v6  no coarse delay at all (static slice) — bounds the cost of the
      delay copy + its layout fallout

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/boundary_variants.py [variants]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(which):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.beamform import beamform_planes
    from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay, coarse_delay
    from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise
    from dpdk_dc_sand_tpu.ops.requant import requantise

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    S = 32

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

    rng = np.random.default_rng(2021)
    n_in = (S + cfg.n_taps - 1) * cfg.fft_size + 16
    adc = jax.device_put(jnp.asarray(rng.integers(
        -64, 64, size=(cfg.n_ants, cfg.n_pols, n_in), dtype=np.int8)))
    cd = jnp.asarray(rng.integers(0, 16, cfg.n_ants).astype(np.int32))
    fd0 = jnp.asarray(rng.uniform(-0.5, 0.5, cfg.n_ants).astype(np.float32))
    ph = jnp.asarray(rng.uniform(-1, 1, cfg.n_ants).astype(np.float32))
    cos = jax.device_put(jnp.asarray(rng.normal(
        size=(cfg.n_channels, cfg.n_beams, cfg.n_ants)).astype(np.float32)))
    sin = jax.device_put(jnp.asarray(rng.normal(
        size=(cfg.n_channels, cfg.n_beams, cfg.n_ants)).astype(np.float32)))
    window = jnp.asarray(np.asarray(pfb_window(cfg.n_taps, cfg.fft_size)))
    out_len = (S + cfg.n_taps - 1) * cfg.fft_size

    def fstage(adc_in, fd, variant="v0"):
        if variant == "v5":
            flat = adc_in.reshape(cfg.n_ants * cfg.n_pols, -1)
            aligned = coarse_delay(
                flat, jnp.repeat(cd, cfg.n_pols), out_len
            ).reshape(cfg.n_ants, cfg.n_pols, out_len)
        elif variant == "v6":
            aligned = adc_in[..., :out_len]
        else:
            aligned = coarse_delay(adc_in, cd, out_len)
        spec = pfb_channelise(aligned, window, n_channels=cfg.n_channels)
        re, im = apply_fine_delay(
            jnp.real(spec), jnp.imag(spec), fd[:, None], ph[:, None],
            n_channels=cfg.n_channels,
        )
        return requantise(re, 1 / 16), requantise(im, 1 / 16)

    def direct_dot(x, w):
        # x [A,P,S,C] (int8->f32), w [C,A,B]; batch C, contract A
        return lax.dot_general(
            x.astype(jnp.float32), w,
            (((0,), (1,)), ((3,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [C, P, S, B]

    def bstage(qr, qi, cos, sin, variant):
        if variant == "v2":
            qr, qi = lax.optimization_barrier((qr, qi))
        if variant == "v3":
            wc = jnp.swapaxes(cos, -1, -2)  # [C, A, B]
            ws = jnp.swapaxes(sin, -1, -2)
            rr, ii = direct_dot(qr, wc), direct_dot(qi, ws)
            ri, ir = direct_dot(qr, ws), direct_dot(qi, wc)
            return rr - ii  # [C,P,S,B] (imag part analogous; probe only)
        xr = jnp.transpose(qr, (1, 3, 2, 0))
        xi = jnp.transpose(qi, (1, 3, 2, 0))
        if variant in ("v1", "v4"):
            xr, xi = lax.optimization_barrier((xr, xi))
        prec = "bf16" if variant == "v4" else "f32"
        br, bi = beamform_planes(xr, xi, cos, sin, prec)
        return br

    def factory(variant):
        def make(n_iters):
            @jax.jit
            def run(adc_in, fd, cos_a, sin_a):
                # coefficient planes must be arguments: closing over
                # multi-hundred-MB device arrays bakes them into the
                # compile request (see bench.py).
                def body(i, carry):
                    fd_c, acc = carry
                    qr, qi = fstage(adc_in, fd_c, variant)
                    br = bstage(qr, qi, cos_a, sin_a, variant)
                    probe = br[0, 0, 0, 0]
                    return (fd_c + probe * 1e-30, acc + probe)

                return lax.fori_loop(0, n_iters, body, (fd, jnp.float32(0)))[1]

            return run

        return make

    samples = cfg.n_ants * cfg.n_pols * S * cfg.fft_size
    for v in which:
        try:
            per, comp = measure(factory(v), (adc, fd0, cos, sin))
            log(f"{v}: {per*1e3:8.2f} ms/iter ({samples/per/1e9:6.1f} Gs/s) "
                f"[compile {comp:.0f}s]")
        except Exception as e:
            log(f"{v}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["v0", "v1", "v2", "v3", "v4"])
