"""Honest B-stage micro-bench: beamform variants from int8 F planes.

The F-stage hands the B-stage int8 (re, im) planes ``[A, P, S, C]``; at
the flagship config the B-stage + handoff is over half the full fused
step (benchmarks/honest_tune.py, 2026-08: 26.6 of 49.8 ms at S=64). Its
MXU floor is ~2-6 ms — the per-channel matmul is M=S, K=2A=160, N=2B=32,
so N caps utilisation at 25% — which means the gap is lowering quality,
not physics. Variants (all with the honest chained methodology of
bench.py):

- ``planar4``  : production beamform_planes — 4 dots [S,A]@[A,B] per
  (pol, chan), corner turn left to XLA fusion.
- ``folded``   : pols-into-M block-complex form — materialise the corner
  turn as X [C, P*S, 2A] int8 (lane-concat of re|im), then ONE dot
  [C, P*S, 2A] @ [C, 2A, 2B] bf16. M=2S, and the transpose is an explicit
  int8 copy instead of strided reads inside 65k tiny dots.
- ``folded_int8``: same with int8 quantised weights (int8 MXU passes),
  accuracy of the 1e-1 fused-kernel tolerance class.

Run: python benchmarks/bstage_honest.py [S [variant ...]]
"""

from __future__ import annotations

import sys
import time

import numpy as np

A, P, B, C = 80, 2, 16, 32768


def build_weights(rng):
    """Folded block-complex weights [C, 2A, 2B] from random steering."""
    th = rng.uniform(-np.pi, np.pi, (C, A, B)).astype(np.float32)
    cos, sin = np.cos(th), np.sin(th)
    w = np.zeros((C, 2 * A, 2 * B), np.float32)
    w[:, :A, :B] = cos
    w[:, :A, B:] = sin
    w[:, A:, :B] = -sin
    w[:, A:, B:] = cos
    return cos, sin, w


def run_variant(variant, S):
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.ops.beamform import beamform_planes

    rng = np.random.default_rng(5)
    if variant in ("turned_sub", "turned_min"):
        shape = (C, 2 * A, P * S) if variant == "turned_sub" else (C, P * S, 2 * A)
        qr = jnp.asarray(rng.integers(-64, 64, shape, dtype=np.int8))
        qi = qr  # unused second carry
    else:
        qr = jnp.asarray(rng.integers(-64, 64, (A, P, S, C), dtype=np.int8))
        qi = jnp.asarray(rng.integers(-64, 64, (A, P, S, C), dtype=np.int8))
    cos, sin, wf = build_weights(rng)
    # [C, B, A] planes for planar4; folded blocks for the others.
    cosp = jnp.asarray(np.swapaxes(cos, 1, 2), jnp.bfloat16)
    sinp = jnp.asarray(np.swapaxes(sin, 1, 2), jnp.bfloat16)
    wfb = jnp.asarray(wf, jnp.bfloat16)
    wf8 = jnp.asarray(np.clip(np.rint(wf * 127.0), -127, 127), jnp.int8)

    def step(qr_c, qi_c, cosp, sinp, wfb, wf8):
        if variant in ("turned_sub", "turned_min"):
            # Pre-turned operands (loop-carried): isolates the dot +
            # output-handling cost per corner-turn output layout.
            # turned_sub: x_t [C, 2A, P*S], contract the sublane axis.
            # turned_min: x_t [C, P*S, 2A], contract the minor axis.
            x = qr_c  # already shaped by the caller
            cdim = 1 if variant == "turned_sub" else 2
            out = jax.lax.dot_general(
                x.astype(jnp.bfloat16), wfb,
                (((cdim,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [C, P*S, 2B]
            out = out.reshape(C, P, S, 2 * B)
            br = jnp.transpose(out[..., :B], (1, 0, 2, 3))
            bi = jnp.transpose(out[..., B:], (1, 0, 2, 3))
            return br.sum() + bi.sum()
        if variant == "planar4":
            xr = jnp.transpose(qr_c, (1, 3, 2, 0))
            xi = jnp.transpose(qi_c, (1, 3, 2, 0))
            br, bi = beamform_planes(xr, xi, cosp, sinp, "bf16")
            return br.sum() + bi.sum()
        # corner turn materialised: [A,P,S,C] -> [C, P*S, A] int8 planes,
        # lane-concat re|im -> [C, P*S, 2A].
        xr = jnp.transpose(qr_c, (3, 1, 2, 0)).reshape(C, P * S, A)
        xi = jnp.transpose(qi_c, (3, 1, 2, 0)).reshape(C, P * S, A)
        x = jnp.concatenate([xr, xi], axis=-1)
        x = jax.lax.optimization_barrier(x)
        if variant == "folded":
            out = jax.lax.dot_general(
                x.astype(jnp.bfloat16), wfb,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        elif variant == "folded_int8":
            out = jax.lax.dot_general(
                x, wf8,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (1.0 / 127.0)
        else:
            raise SystemExit(f"unknown variant {variant}")
        return out.sum()

    def factory(n_iters):
        # Weights ride as arguments: closing over multi-hundred-MB device
        # arrays bakes them into the program (relay rejects the upload).
        @jax.jit
        def run(qr0, qi0, cosp, sinp, wfb, wf8):
            def body(i, carry):
                qr_c, qi_c, acc = carry
                probe = step(qr_c, qi_c, cosp, sinp, wfb, wf8) * 1e-30
                p8 = probe.astype(jnp.int8)
                return (
                    qr_c.at[(0,) * qr_c.ndim].add(p8),
                    qi_c.at[(0,) * qi_c.ndim].add(p8),
                    acc + probe,
                )

            return jax.lax.fori_loop(
                0, n_iters, body, (qr0, qi0, jnp.float32(0))
            )[2]

        return run

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    float(r2(qr, qi, cosp, sinp, wfb, wf8))
    comp = time.time() - t0
    float(r6(qr, qi, cosp, sinp, wfb, wf8))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(r2(qr, qi, cosp, sinp, wfb, wf8))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        float(r6(qr, qi, cosp, sinp, wfb, wf8))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    samples = A * P * S * C * 2  # ADC-equivalent samples (C = fft/2)
    print(
        f"S={S:3d} {variant:12s}: {per*1e3:7.2f} ms/step "
        f"({samples/per/1e9:6.2f} Gs/s-equiv) [compile {comp:.0f}s]",
        flush=True,
    )


def main(argv):
    S = int(argv[0]) if argv else 64
    variants = argv[1:] or ("planar4", "folded", "folded_int8")
    for v in variants:
        try:
            run_variant(v, S)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
