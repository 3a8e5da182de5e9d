"""FB-vs-FXB marginal at a geometry far above the dispatch floor.

Round-3 measured FXB ≈ FB only at 16 ant × 4k chan × 64 spectra, where
both steps sat under the ~2-3 ms relay dispatch floor — not evidence at
scale. This bench runs the flagship array (80 ant × 32k chan) at S=64
(the full-band single-chip X is vis-output-bound: the [C, 160, 160] f32
visibility pair alone is 6.7 GB of HBM per step) with the same
chained-ADC marginal methodology as f_diag/bench.py, and reports the
FXB/FB step ratio — the ≤1.3× criterion (ROADMAP "Capabilities").

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fxb_flagship.py [S]
"""

from __future__ import annotations

import sys
import time

import numpy as np

A, P, C, B_BEAMS, TAPS = 80, 2, 32768, 16, 16
FFT = 2 * C


def run(S: int, vis: bool, vis_precision: str = "int8"):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.models import FBEngine, FXBEngine

    cfg = ArrayConfig(
        n_ants=A, n_channels=C, n_beams=B_BEAMS, n_taps=TAPS
    )
    # int8 device-quantised beams for BOTH engines: the full-band
    # single-chip step at S=128 is HBM-tight (the visibility planes
    # alone are 6.7 GB); the marginal comparison is unaffected.
    if vis:
        eng = FXBEngine(
            cfg, n_spectra=S, precision="bf16", vis_precision=vis_precision,
            beam_quant_scale=0.25,
        )
    else:
        eng = FBEngine(cfg, n_spectra=S, precision="bf16",
                       beam_quant_scale=0.25)
    rng = np.random.default_rng(5)
    margin = 16384
    from dpdk_dc_sand_tpu.ops.fengine_pallas import ingest_alignment

    align = ingest_alignment(cfg.fft_size) or 1
    n_in = eng.samples_in + margin
    n_in += -n_in % align
    adc = jnp.asarray(rng.integers(-64, 64, (A, P, n_in), dtype=np.int8))
    cd = jnp.asarray(rng.integers(0, 8192, A).astype(np.int32))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, A).astype(np.float32))
    ph = -jnp.pi * fd / 2
    dv = np.zeros((B_BEAMS, A, 4), np.float32)
    eng.set_beam_delays(dv)
    coeffs = eng._coeff_blocks if hasattr(eng, "_coeff_blocks") else eng._coeffs

    def step(adc_c, fd_c, blocks):
        out = eng._step(adc_c, cd, fd_c, ph, blocks)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(x.astype(jnp.float32).sum() for x in leaves)

    def factory(n_iters):
        # blocks as an argument: closing over multi-hundred-MB steering
        # planes bakes them into the program as constants (bench.py).
        @jax.jit
        def runf(a0, f0, blocks):
            def body(i, carry):
                a_c, f_c, acc = carry
                probe = step(a_c, f_c, blocks) * 1e-30
                return (
                    a_c.at[(0, 0, 0)].add(probe.astype(jnp.int8)),
                    f_c + probe,
                    acc + probe,
                )

            return jax.lax.fori_loop(0, n_iters, body, (a0, f0, jnp.float32(0)))[2]

        return runf

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(adc, fd, coeffs))
    comp = time.time() - t0
    float(r6(adc, fd, coeffs))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(adc, fd, coeffs))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(adc, fd, coeffs))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    name = f"fxb[{vis_precision}]" if vis else "fb"
    samples = A * P * S * FFT
    print(
        f"S={S} {name:10s}: {per*1e3:7.2f} ms ({samples/per/1e9:6.2f} Gs/s)"
        f" [compile {comp:.0f}s]",
        flush=True,
    )
    return per


def run_xonly(S: int):
    """Standalone X marginal: Pallas turn + visibility kernel over
    realistic F planes. The FULL FXB chain at full-band S=128 exceeds
    the 16 GB single-chip HBM (visibility planes alone are 6.7 GB plus
    the F/B working set) — deployments shard channels; the marginal is
    what the ≤1.3× criterion needs."""
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.ops.corner_turn import corner_turn_planes_x
    from dpdk_dc_sand_tpu.ops.xcorr_pallas import correlate_turned_fused

    rng = np.random.default_rng(5)
    qr = jnp.asarray(
        rng.integers(-64, 64, (A, P, S, C), dtype=np.int8)
    )
    qi = jnp.asarray(rng.integers(-64, 64, (A, P, S, C), dtype=np.int8))

    from dpdk_dc_sand_tpu.ops.xcorr_pallas import correlate_planes_fused

    def step(qr_c, qi_c):
        vre, vim = correlate_planes_fused(qr_c, qi_c, int8_mxu=True)
        # Probe a row slice, not the full planes: a full .sum() re-reads
        # the 13.4 GB visibility pair (~17 ms) into the marginal. The
        # Pallas custom call materialises its outputs regardless, so the
        # write cost stays in the measurement.
        return vre[:, 0].sum() + vim[:, 0].sum()

    def factory(n_iters):
        @jax.jit
        def runf(r0, i0):
            def body(i, carry):
                r_c, i_c, acc = carry
                probe = step(r_c, i_c) * 1e-30
                return (
                    r_c.at[(0, 0, 0, 0)].add(probe.astype(jnp.int8)),
                    i_c,
                    acc + probe,
                )

            return jax.lax.fori_loop(
                0, n_iters, body, (r0, i0, jnp.float32(0))
            )[2]

        return runf

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(qr, qi))
    comp = time.time() - t0
    float(r6(qr, qi))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(qr, qi))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(qr, qi))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    print(
        f"S={S} x-marginal: {per*1e3:7.2f} ms [compile {comp:.0f}s]",
        flush=True,
    )
    return per


def main(argv):
    S = int(argv[0]) if argv else 64
    if argv[1:] == ["xonly"]:
        run_xonly(S)
        return
    fb = run(S, vis=False)
    if argv[1:] == ["marginal"]:
        x = run_xonly(S)
        print(
            f"FXB/FB ratio (standalone X marginal): {(fb + x)/fb:.3f} "
            "(criterion <= 1.3)"
        )
        return
    fxb8 = run(S, vis=True, vis_precision="int8")
    print(f"FXB/FB ratio (int8 vis): {fxb8/fb:.3f} (criterion <= 1.3)")
    fxbf = run(S, vis=True, vis_precision="f32")
    print(f"FXB/FB ratio (f32 vis):  {fxbf/fb:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
