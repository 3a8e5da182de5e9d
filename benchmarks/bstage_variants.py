"""Isolate the B-stage cost structure at the flagship config.

Variants (all loop-dependent, full-reduction probes, marginal timing):

- ``planes``    : production form — int8 planes in F layout [A,P,S,C],
                  transpose + 4 planar dots, f32 beams out.
- ``pre_t``     : input already corner-turned [P,C,S,A] — isolates the
                  int8 transpose share.
- ``int8_out``  : production form + fused int8 requant epilogue —
                  isolates the f32 beam-write share.
- ``direct``    : transpose-free dot_general contracting the antenna
                  axis in place (batch dim = channel on dim 3/0).
- ``folded1``   : ONE batched dot per step — (re/im, pol, time) stacked
                  into 2·P·S = 128 rows, (cos|sin) stacked into 2B = 32
                  columns; per-channel matmul [128, A]@[A, 32] instead of
                  four [64, A]@[A, 16] — 4x fewer MXU passes at the same
                  MACs (the per-channel batched matmul is MXU-pass-latency
                  bound, not HBM bound).
- ``folded2``   : two dots [64, A]@[A, 32] (wide weights only).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bstage_variants.py [S ...]
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
    from dpdk_dc_sand_tpu.ops.beamform import beamform_planes
    from dpdk_dc_sand_tpu.ops.requant import requantise

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    rng = np.random.default_rng(2021)

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

    for S in spectra_list:
        samples = cfg.n_ants * cfg.n_pols * S * cfg.fft_size
        cos = jax.device_put(jnp.asarray(rng.normal(
            size=(cfg.n_channels, cfg.n_beams, cfg.n_ants)
        ).astype(np.float32)).astype(jnp.bfloat16))
        sin = jax.device_put(jnp.asarray(rng.normal(
            size=(cfg.n_channels, cfg.n_beams, cfg.n_ants)
        ).astype(np.float32)).astype(jnp.bfloat16))

        def variant(name, body, q_shape):
            q = jax.device_put(jnp.asarray(rng.integers(
                -64, 64, size=q_shape, dtype=np.int8)))

            def factory(n_iters):
                @jax.jit
                def run(q0, cos_a, sin_a):
                    def bd(i, carry):
                        qc, acc = carry
                        probe = body(qc, cos_a, sin_a)
                        return (qc + probe.astype(jnp.int8), acc + probe)

                    return lax.fori_loop(0, n_iters, bd, (q0, jnp.float32(0)))[1]

                return run

            try:
                per, comp = measure(factory, (q, cos, sin))
                log(f"S={S:3d} {name:9s}: {per*1e3:7.2f} ms "
                    f"({samples/per/1e9:6.2f} Gs/s-equiv) [compile {comp:.0f}s]")
            except Exception as e:
                log(f"S={S:3d} {name:9s}: FAILED {type(e).__name__}: {str(e)[:100]}")

        def planes_body(qc, cos_a, sin_a):
            xr = jnp.transpose(qc[0], (1, 3, 2, 0))
            xi = jnp.transpose(qc[1], (1, 3, 2, 0))
            br, bi = beamform_planes(xr, xi, cos_a, sin_a, "bf16")
            return (br.sum() + bi.sum()) * 1e-30

        def pre_t_body(qc, cos_a, sin_a):
            br, bi = beamform_planes(qc[0], qc[1], cos_a, sin_a, "bf16")
            return (br.sum() + bi.sum()) * 1e-30

        def int8_out_body(qc, cos_a, sin_a):
            xr = jnp.transpose(qc[0], (1, 3, 2, 0))
            xi = jnp.transpose(qc[1], (1, 3, 2, 0))
            br, bi = beamform_planes(xr, xi, cos_a, sin_a, "bf16")
            qbr, qbi = requantise(br, 0.25), requantise(bi, 0.25)
            return (qbr.astype(jnp.float32).sum()
                    + qbi.astype(jnp.float32).sum()) * 1e-30

        def direct_body(qc, cos_a, sin_a):
            # q [A,P,S,C] · w[C,B,A] -> [C,P,S,B]; contraction in place.
            wc = cos_a.astype(jnp.bfloat16)
            ws = sin_a.astype(jnp.bfloat16)
            dims = (((0,), (2,)), ((3,), (0,)))

            def d(x, w):
                return lax.dot_general(
                    x.astype(jnp.bfloat16), w, dims,
                    preferred_element_type=jnp.float32)

            br = d(qc[0], wc) - d(qc[1], ws)
            bi = d(qc[0], ws) + d(qc[1], wc)
            return (br.sum() + bi.sum()) * 1e-30

        def folded1_body(qc, cos_a, sin_a):
            # X [C, 2, P, S, A]: rows = (reim, pol, time); W [C, A, 2B].
            x = jnp.transpose(qc, (4, 0, 2, 3, 1)).astype(jnp.bfloat16)
            c, two, p, s, a = x.shape
            x = x.reshape(c, two * p * s, a)
            w = jnp.concatenate(
                [jnp.swapaxes(cos_a, -1, -2), jnp.swapaxes(sin_a, -1, -2)],
                axis=-1,
            )  # [C, A, 2B]
            y = lax.dot_general(
                x, w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(c, two, p, s, 2, cfg.n_beams)
            br = y[:, 0, :, :, 0] - y[:, 1, :, :, 1]
            bi = y[:, 0, :, :, 1] + y[:, 1, :, :, 0]
            return (br.sum() + bi.sum()) * 1e-30

        def folded2_body(qc, cos_a, sin_a):
            xr = jnp.transpose(qc[0], (3, 1, 2, 0)).astype(jnp.bfloat16)
            xi = jnp.transpose(qc[1], (3, 1, 2, 0)).astype(jnp.bfloat16)
            c, p, s, a = xr.shape
            w = jnp.concatenate(
                [jnp.swapaxes(cos_a, -1, -2), jnp.swapaxes(sin_a, -1, -2)],
                axis=-1,
            )  # [C, A, 2B]

            def d(x):
                return lax.dot_general(
                    x.reshape(c, p * s, a), w, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(c, p, s, 2, cfg.n_beams)

            yr, yi = d(xr), d(xi)
            br = yr[..., 0, :] - yi[..., 1, :]
            bi = yr[..., 1, :] + yi[..., 0, :]
            return (br.sum() + bi.sum()) * 1e-30

        variant("planes", planes_body,
                (2, cfg.n_ants, cfg.n_pols, S, cfg.n_channels))
        variant("folded1", folded1_body,
                (2, cfg.n_ants, cfg.n_pols, S, cfg.n_channels))
        variant("folded2", folded2_body,
                (2, cfg.n_ants, cfg.n_pols, S, cfg.n_channels))
        variant("pre_t", pre_t_body,
                (2, cfg.n_pols, cfg.n_channels, S, cfg.n_ants))
        variant("int8_out", int8_out_body,
                (2, cfg.n_ants, cfg.n_pols, S, cfg.n_channels))
        variant("direct", direct_body,
                (2, cfg.n_ants, cfg.n_pols, S, cfg.n_channels))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [32, 64])
