"""Steering-coefficient generation benchmark — the runBeamformerTests analog.

The reference benchmarks four CUDA kernel variants of coefficient
generation and reports a deployment cost model: utilisation =
kernel_time / realtime_window, where the realtime window is the wall time
the array takes to produce one coefficient set's worth of samples
(``NR_SAMPLES_PER_CHANNEL · FFT_SIZE / ADC_rate``), divided by the
256-accumulation coefficient-reuse factor
(BeamformerCoefficientTest.cu:422-454, runBeamformerTests.cpp:12-79).

Variants here: single-timestamp coefficients (the python kernel's
behaviour), all-timestamps in one shot (the grouped_channels_and_timestamps
kernel), and bf16 output (the __half2 16-bit path). Each is verified
against the CPU golden model before timing — every benchmark is also a
correctness test, the UnitTest discipline.

Run: ``python benchmarks/coeff_bench.py``
"""

import time

import numpy as np

SAMPLES_PER_CHANNEL = 256
FFT_SIZE = 8192
ADC_RATE = 1712e6
ACCUM_REUSE = 256


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu import golden
    from dpdk_dc_sand_tpu.config import ArrayConfig
    from dpdk_dc_sand_tpu.ops.coeff_gen import steering_coeffs

    cfg = ArrayConfig(n_ants=64, n_channels=32768, n_beams=16)
    cps = cfg.n_channels_per_stream
    rng = np.random.default_rng(2021)
    dv = np.zeros(cfg.delay_vals_shape, np.float32)
    dv[..., 0] = rng.uniform(0, 5e-9, dv.shape[:-1])
    dv[..., 1] = rng.uniform(-1e-12, 1e-12, dv.shape[:-1])
    dv[..., 2] = rng.uniform(-np.pi, np.pi, dv.shape[:-1])
    dv[..., 3] = rng.uniform(-0.01, 0.01, dv.shape[:-1])
    dv_d = jnp.asarray(dv)

    kw = dict(
        n_channels=cfg.n_channels,
        n_channels_per_stream=cps,
        sample_period=cfg.sample_period,
    )
    window_s = SAMPLES_PER_CHANNEL * FFT_SIZE / ADC_RATE

    def single_t(dv_d):
        return steering_coeffs(dv_d, **kw)

    def all_t(dv_d):
        t = (
            jnp.arange(SAMPLES_PER_CHANNEL, dtype=jnp.float32)
            * (FFT_SIZE / ADC_RATE)
        ).reshape(-1, 1, 1, 1)
        return steering_coeffs(dv_d, **kw, t_s=t)

    def all_t_bf16(dv_d):
        c, s = all_t(dv_d)
        return c.astype(jnp.bfloat16), s.astype(jnp.bfloat16)

    # correctness gate (vs float64 golden) before any timing
    c, s = jax.jit(single_t)(dv_d)
    w = golden.steering_coeffs_complex(dv, cfg.n_channels, cfg.sample_period)
    assert np.abs(np.asarray(c) - w.real).max() < 1e-4
    assert np.abs(np.asarray(s) - w.imag).max() < 1e-4
    c_t, _ = jax.jit(all_t)(dv_d)
    w_t = golden.steering_coeffs_complex(
        dv, cfg.n_channels, cfg.sample_period,
        t_s=(np.arange(SAMPLES_PER_CHANNEL) * FFT_SIZE / ADC_RATE).reshape(
            -1, 1, 1, 1
        ),
    )
    assert np.abs(np.asarray(c_t) - w_t.real).max() < 1e-3

    print(
        f"config: {cfg.n_ants} ants x {cps} chans/stream x {cfg.n_beams} beams"
        f"; realtime window {window_s*1e3:.3f} ms, reuse /{ACCUM_REUSE}"
    )
    print(f"{'variant':28s} {'time_ms':>9s} {'util':>8s} {'util/reuse':>11s}")
    def chained(fn, n_iters):
        # The whole dependent chain lives inside one jit: on relayed
        # backends, eagerly-built chains cost seconds per host sync.
        @jax.jit
        def run(dv_in):
            def body(i, carry):
                d, acc = carry
                out = fn(d)
                # Full reductions force the whole grid to be computed —
                # a single-element probe lets XLA slice the elementwise
                # generation down to one value (dead-code elimination).
                probe = (
                    jnp.sum(out[0], dtype=jnp.float32)
                    + jnp.sum(out[1], dtype=jnp.float32)
                )
                return (dv_in + probe * 1e-30, acc + probe)

            return jax.lax.fori_loop(0, n_iters, body, (dv_in, jnp.float32(0)))[1]

        return run

    for name, fn in [
        ("single-timestamp", single_t),
        ("grouped-all-timestamps", all_t),
        ("grouped-all-timestamps-bf16", all_t_bf16),
    ]:
        r2, r8 = chained(fn, 2), chained(fn, 32)
        float(r2(dv_d))
        float(r8(dv_d))
        t2 = t8 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(r2(dv_d))
            t2 = min(t2, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(r8(dv_d))
            t8 = min(t8, time.perf_counter() - t0)
        dt = max((t8 - t2) / 30, 1e-9)
        util = dt / window_s
        print(
            f"{name:28s} {dt*1e3:9.3f} {util:8.3f} {util/ACCUM_REUSE:11.5f}"
        )
    print(
        "# util = marginal kernel time / realtime window; values ~0.000 are"
        " below the relay's measurement resolution (the kernel is free)."
    )


if __name__ == "__main__":
    main()
