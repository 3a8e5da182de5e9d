"""Honest-streaming tuning sweep for the fused flagship pipeline.

Reuses bench.py's methodology (data-dependent ADC chain, full-reduction
probe, marginal 2-vs-6 iteration timing) to answer the ROADMAP questions:

1. n_spectra scaling for the fused path (S=32/64/128): the fused kernel
   has no FFT temps, so larger S amortises DMA + coefficient reads and
   fattens the B-stage matmul M dimension (S rows per channel-batched
   dot).
2. F-stage share vs B-stage share at the best S — measured honestly
   (the earlier stage_breakdown.py perturbed only the fine delay, which
   let XLA hoist the FIR+FFT; its F/B split was untrustworthy).

Run on the real chip: ``python benchmarks/honest_tune.py [S ...]``
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from bench import build, measure  # noqa: E402  (repo-root bench harness)


def measure_f_only(cfg, n_spectra, s_blk=None, ct_batch_a=False):
    """Honest-streaming throughput of the fused F-stage alone."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    rng = np.random.default_rng(2021)
    n_frames = n_spectra + cfg.n_taps - 1
    adc = rng.integers(
        -64, 64, size=(cfg.n_ants, cfg.n_pols, n_frames, cfg.fft_size),
        dtype=np.int8,
    )
    window = jnp.asarray(np.asarray(pfb_window(cfg.n_taps, cfg.fft_size)))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, (cfg.n_ants, cfg.n_pols)), jnp.float32)
    ph = -jnp.pi * fd / 2
    adc_d = jax.device_put(jnp.asarray(adc))

    def chained(n_iters):
        @jax.jit
        def run(adc, fd):
            def body(i, carry):
                adc_c, fd_c, acc = carry
                qr, qi = fengine_fused(
                    adc_c, window, fd_c, ph,
                    n_channels=cfg.n_channels, quant_scale=1.0 / 16.0,
                    s_blk=s_blk, ct_batch_a=ct_batch_a,
                )
                probe = (
                    qr.astype(jnp.float32).sum() + qi.astype(jnp.float32).sum()
                ) * 1e-30
                return (
                    adc_c.at[0, 0, 0, 0].add(probe.astype(jnp.int8)),
                    fd_c + probe,
                    acc + probe,
                )

            return jax.lax.fori_loop(0, n_iters, body, (adc, fd, jnp.float32(0)))[2]

        return run

    r2, r6 = chained(2), chained(6)
    float(r2(adc_d, fd))
    float(r6(adc_d, fd))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(adc_d, fd))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(adc_d, fd))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    samples = cfg.n_ants * cfg.n_pols * n_spectra * cfg.fft_size
    return samples / per / 1e6, per


def main() -> None:
    from dpdk_dc_sand_tpu.config import ArrayConfig

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"

    if mode in ("full", "fullb", "fullba", "fullt", "fullta"):
        spectra = [int(a) for a in sys.argv[2:]] or [32, 64, 128]
        bstage = {"fullb": "folded", "fullt": "turned", "fullta": "turned"}.get(
            mode, "planar"
        )
        for s in spectra:
            try:
                t0 = time.time()
                msps = measure(
                    cfg, s, "fused", bstage,
                    ct_batch_a=(mode in ("fullba", "fullta")),
                )
                samples = cfg.n_ants * cfg.n_pols * s * cfg.fft_size
                print(
                    f"S={s:3d} full({bstage}): {msps/1e3:7.2f} Gs/s "
                    f"({samples/(msps*1e6)*1e3:7.2f} ms/step) "
                    f"[wall {time.time()-t0:.0f}s]",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"S={s:3d} full({bstage}): FAILED {type(e).__name__}: {e}",
                    flush=True,
                )
    elif mode == "fonly":
        spectra = [int(a) for a in sys.argv[2:]] or [32, 64]
        for s in spectra:
            try:
                t0 = time.time()
                msps, per = measure_f_only(cfg, s)
                print(
                    f"S={s:3d} F-only     : {msps/1e3:7.2f} Gs/s "
                    f"({per*1e3:7.2f} ms/step) [wall {time.time()-t0:.0f}s]",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"S={s:3d} F-only     : FAILED {type(e).__name__}: {e}",
                    flush=True,
                )
    elif mode == "sblk":
        s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        for blk in [int(a) for a in sys.argv[3:]] or [8, 16, 32]:
            try:
                t0 = time.time()
                msps, per = measure_f_only(cfg, s, s_blk=blk)
                print(
                    f"S={s:3d} s_blk={blk:2d}  : {msps/1e3:7.2f} Gs/s "
                    f"({per*1e3:7.2f} ms/step) [wall {time.time()-t0:.0f}s]",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"S={s:3d} s_blk={blk:2d}  : FAILED {type(e).__name__}: {e}",
                    flush=True,
                )
    elif mode == "batcha":
        s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        for blk in [int(a) for a in sys.argv[3:]] or [16]:
            try:
                t0 = time.time()
                msps, per = measure_f_only(cfg, s, s_blk=blk, ct_batch_a=True)
                print(
                    f"S={s:3d} batchA blk={blk:2d}: {msps/1e3:7.2f} Gs/s "
                    f"({per*1e3:7.2f} ms/step) [wall {time.time()-t0:.0f}s]",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"S={s:3d} batchA blk={blk:2d}: FAILED "
                    f"{type(e).__name__}: {e}",
                    flush=True,
                )
    else:
        raise SystemExit(f"unknown mode {mode!r} (full|fonly|sblk|batcha)")


if __name__ == "__main__":
    main()
