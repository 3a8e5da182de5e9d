"""Stage split of the turned-bstage flagship step (honest methodology).

Cumulative stages, each measured as a full chained program (bench.py
marginal method); successive differences give per-stage costs. The probe
is a full device-side reduction of the stage output (costs one read pass
of that output — comparable across stages, so differences are meaningful).

- ``f``    : coarse delay + fused F kernel (batch-A schedule)
- ``t``    : + Pallas corner turn
- ``b``    : + folded dot (bf16 weights)  -> [C, PS, 2B] f32
- ``b8``   : + folded dot (int8 weights, int8 MXU passes) -> int32
- ``full`` : + output split/transpose/stack to [P, C, S, B, 2]
- ``bf``   : fused turn+dot kernel (ops/bstage_pallas.py) -> beam planes
- ``bffull``: fused turn+dot + stack to [P, C, S, B, 2]

Run: PYTHONPATH=/root/.axon_site:/root/repo \
     python benchmarks/turned_stage_split.py [S [stage ...]]
"""

from __future__ import annotations

import sys
import time

import numpy as np

A, P, B, C, TAPS = 80, 2, 16, 32768, 16
FFT = 2 * C


def run_stage(stage, S):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.corner_turn import corner_turn_planes
    from dpdk_dc_sand_tpu.ops.delay import coarse_delay
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    rng = np.random.default_rng(5)
    n_in = (S + TAPS - 1) * FFT + 16
    adc = jnp.asarray(rng.integers(-64, 64, (A, P, n_in), dtype=np.int8))
    window = jnp.asarray(np.asarray(pfb_window(TAPS, FFT)))
    cd = jnp.asarray(rng.integers(0, 16, A).astype(np.int32))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, A).astype(np.float32))
    ph = -jnp.pi * fd / 2
    th = rng.uniform(-np.pi, np.pi, (C, A, B)).astype(np.float32)
    cos, sin = np.cos(th), np.sin(th)
    wf = np.zeros((C, 2 * A, 2 * B), np.float32)
    wf[:, :A, :B] = cos
    wf[:, :A, B:] = sin
    wf[:, A:, :B] = -sin
    wf[:, A:, B:] = cos
    wfb = jnp.asarray(wf, jnp.bfloat16)
    wf8 = jnp.asarray(np.clip(np.rint(wf * 127.0), -127, 127), jnp.int8)

    def step(adc_c, fd_c, wfb, wf8):
        out_len = (S + TAPS - 1) * FFT
        aligned = coarse_delay(adc_c, cd, out_len)
        frames = aligned.reshape(A, P, -1, FFT)
        qr, qi = fengine_fused(
            frames, window,
            jnp.broadcast_to(fd_c[:, None], (A, P)),
            jnp.broadcast_to(ph[:, None], (A, P)),
            n_channels=C, quant_scale=1.0 / 16.0, ct_batch_a=True,
        )
        if stage == "f":
            return qr.astype(jnp.float32).sum() + qi.astype(jnp.float32).sum()
        if stage in ("bf", "bffull"):
            from dpdk_dc_sand_tpu.ops.bstage_pallas import beamform_turned_fused

            br, bi = beamform_turned_fused(qr, qi, wfb, n_pols=P)
            if stage == "bf":
                return br.sum() + bi.sum()
            return jnp.stack([br, bi], axis=-1).sum()
        x_t = corner_turn_planes(qr, qi)
        if stage == "t":
            return x_t.astype(jnp.float32).sum()
        if stage == "b8":
            out = jax.lax.dot_general(
                x_t, wf8, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            return out.sum().astype(jnp.float32) * 1e-9
        out = jax.lax.dot_general(
            x_t.astype(jnp.bfloat16), wfb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [C, PS, 2B]
        if stage == "b":
            return out.sum()
        out = out.reshape(C, P, S, 2 * B)
        br = jnp.transpose(out[..., :B], (1, 0, 2, 3))
        bi = jnp.transpose(out[..., B:], (1, 0, 2, 3))
        beams = jnp.stack([br, bi], axis=-1)  # [P, C, S, B, 2]
        return beams.sum()

    def factory(n_iters):
        @jax.jit
        def run(adc0, fd0, wfb, wf8):
            def body(i, carry):
                adc_c, fd_c, acc = carry
                probe = step(adc_c, fd_c, wfb, wf8) * 1e-30
                return (
                    adc_c.at[0, 0, 0].add(probe.astype(jnp.int8)),
                    fd_c + probe,
                    acc + probe,
                )

            return jax.lax.fori_loop(
                0, n_iters, body, (adc0, fd0, jnp.float32(0))
            )[2]

        return run

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(adc, fd, wfb, wf8))
    comp = time.time() - t0
    float(r6(adc, fd, wfb, wf8))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(adc, fd, wfb, wf8))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(adc, fd, wfb, wf8))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    samples = A * P * S * FFT
    print(
        f"S={S:3d} {stage:5s}: {per*1e3:7.2f} ms/step "
        f"({samples/per/1e9:6.2f} Gs/s) [compile {comp:.0f}s]",
        flush=True,
    )


def main(argv):
    S = int(argv[0]) if argv else 128
    stages = argv[1:] or ("f", "t", "b", "full", "b8")
    for st in stages:
        try:
            run_stage(st, S)
        except Exception as e:
            print(f"{st}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
