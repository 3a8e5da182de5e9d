"""Pallas corner-turn kernel probe: int8 [A,P,S,C] -> [C, 2A, P*S].

The F->B handoff at the flagship config moves ~1.3 GB of int8 through an
XLA transpose that runs at ~34 GB/s effective (ROADMAP: the corner-turn
wall, 26.6 of 49.8 ms at S=64). This probes whether a Pallas kernel with
explicit tiling beats it, and which (c_blk, s_chunk) tiling + in-kernel
transpose method wins:

- ``i8``  : direct int8 transpose in VMEM (Mosaic packed-shuffle support?)
- ``i32`` : widen int8->int32, 32-bit transpose, narrow back
- ``copy``: same DMA tiling, no transpose — the pure-DMA roofline for
  this block geometry (separates shuffle cost from HBM granularity cost)

Output layout is [C, 2A, P*S] (antennas on sublanes — 160 = 5 exact int8
sublane tiles, no padding; spectra on lanes), which the folded B-stage
dot contracts on the sublane axis.

Run: python benchmarks/ct_kernel_probe.py [S] [variant ...]
  variant = mode:c_blk:s_chunk, e.g. i8:128:128
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

A, P, C = 80, 2, 32768


def make_ct(mode, c_blk, s_chunk, S):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cb = C // c_blk
    n_sb = S // s_chunk

    def kernel(qr_ref, qi_ref, out_ref):
        xr = qr_ref[:, 0]  # [A, s_chunk, c_blk] int8
        xi = qi_ref[:, 0]
        if mode == "copy":
            out_ref[0, :, 0] = xr
            out_ref[1, :, 0] = xi
            return

        if mode in ("i8m", "i8m2"):
            # Minor-antenna layout [C, P*S, 2A]: lanes = 2A so the folded
            # dot contracts the minor axis (the XLA-native gemm form).
            def turn_m(x):
                if mode == "i8m":
                    # swap (A, s) majors first, then 2D transpose.
                    w = jnp.swapaxes(x, 0, 1)  # [s_chunk, A, c_blk]
                    t = w.reshape(s_chunk * A, c_blk).T
                    return t.reshape(c_blk, s_chunk, A)
                # i8m2: 2D transpose then batched minor-2 transpose.
                t = x.reshape(A * s_chunk, c_blk).T.reshape(c_blk, A, s_chunk)
                return jnp.swapaxes(t, 1, 2)

            out_ref[:, :, 0:A] = turn_m(xr)
            out_ref[:, :, A : 2 * A] = turn_m(xi)
            return

        def turn(x):
            # (2,0,1) permute as a 2D transpose + minor-split reshape
            # (Mosaic supports 8-bit 2D transposes; the direct 3D permute
            # does not lower).
            if mode == "i32":
                x = x.astype(jnp.int32)
            t = x.reshape(A * s_chunk, c_blk).T.reshape(c_blk, A, s_chunk)
            return t.astype(jnp.int8)

        out_ref[:, 0:A, :] = turn(xr)
        out_ref[:, A : 2 * A, :] = turn(xi)

    in_spec = pl.BlockSpec(
        (A, 1, s_chunk, c_blk),
        lambda cb, p, sb: (0, p, sb, cb),
        memory_space=pltpu.VMEM,
    )
    if mode == "copy":
        out_spec = pl.BlockSpec(
            (2, A, 1, s_chunk, c_blk),
            lambda cb, p, sb: (0, 0, p, sb, cb),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((2, A, P, S, C), jnp.int8)
    elif mode in ("i8m", "i8m2"):
        out_spec = pl.BlockSpec(
            (c_blk, s_chunk, 2 * A),
            lambda cb, p, sb: (cb, p * n_sb + sb, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((C, P * S, 2 * A), jnp.int8)
    else:
        out_spec = pl.BlockSpec(
            (c_blk, 2 * A, s_chunk),
            lambda cb, p, sb: (cb, 0, p * n_sb + sb),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((C, 2 * A, P * S), jnp.int8)

    @jax.jit
    def ct(qr, qi):
        return pl.pallas_call(
            kernel,
            grid=(n_cb, P, n_sb),
            in_specs=[in_spec, in_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
                # Wide c_blk tiles (bigger DMA segments) need headroom
                # past the 16 MB scoped-VMEM default.
                vmem_limit_bytes=100 << 20,
            ),
        )(qr, qi)

    return ct


def run_variant(spec, S):
    import jax
    import jax.numpy as jnp

    mode, c_blk, s_chunk = spec.split(":")
    c_blk, s_chunk = int(c_blk), int(s_chunk)
    ct = make_ct(mode, c_blk, s_chunk, S)

    rng = np.random.default_rng(5)
    qr = jnp.asarray(rng.integers(-64, 64, (A, P, S, C), dtype=np.int8))
    qi = jnp.asarray(rng.integers(-64, 64, (A, P, S, C), dtype=np.int8))

    # Correctness check once (tiny probe elements via device-side compare).
    out = ct(qr, qi)
    if mode == "copy":
        ok = bool(jnp.all(out[0] == qr) & jnp.all(out[1] == qi))
    else:
        want_r = jnp.transpose(qr, (3, 1, 2, 0)).reshape(C, P * S, A)
        want_i = jnp.transpose(qi, (3, 1, 2, 0)).reshape(C, P * S, A)
        want = jnp.concatenate([want_r, want_i], -1)  # [C, PS, 2A]
        if mode not in ("i8m", "i8m2"):
            want = jnp.transpose(want, (0, 2, 1))
        ok = bool(jnp.all(out == want))
    tag = "OK " if ok else "BAD"

    def factory(n_iters):
        @jax.jit
        def run(qr0, qi0):
            def body(i, carry):
                qr_c, qi_c, acc = carry
                o = ct(qr_c, qi_c)
                probe = (
                    o[0, 0, 0].astype(jnp.int32)
                    + o[o.shape[0] - 1, 0, 0].astype(jnp.int32)
                )
                p8 = probe.astype(jnp.int8)
                return (
                    qr_c.at[0, 0, 0, 0].add(p8),
                    qi_c.at[0, 0, 0, 0].add(p8),
                    acc + probe,
                )

            return jax.lax.fori_loop(0, n_iters, body, (qr0, qi0, jnp.int32(0)))[2]

        return run

    r2, r6 = factory(2), factory(6)
    t0 = time.time()
    int(r2(qr, qi))
    comp = time.time() - t0
    int(r6(qr, qi))
    t2 = t6 = float("inf")
    for _ in range(2):
        t0 = time.time()
        int(r2(qr, qi))
        t2 = min(t2, time.time() - t0)
        t0 = time.time()
        int(r6(qr, qi))
        t6 = min(t6, time.time() - t0)
    per = max((t6 - t2) / 4, 1e-9)
    gb = 2 * A * P * S * C * 2 / 1e9  # read + write, both planes
    print(
        f"S={S:3d} {spec:12s} [{tag}]: {per*1e3:7.2f} ms "
        f"({gb/per:6.1f} GB/s eff) [compile {comp:.0f}s]",
        flush=True,
    )


def main(argv):
    S = int(argv[0]) if argv else 128
    specs = argv[1:] or (
        "copy:128:128",
        "i8:128:128",
        "i32:64:128",
        "i8:256:64",
        "i8:64:256",
    )
    for spec in specs:
        try:
            run_variant(spec, S)
        except Exception as e:
            print(f"{spec}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
