"""Pallas pre-beamform corner turn: int8 [A, P, S, C] → [C, 2A, P·S].

The TPU replacement for the reference's dedicated reorder kernel
(``beamformer/beamforming/prebeamform_reorder.py:59-60`` +
``kernels/prebeamform_reorder_kernel.mako:53-80``): the F-engine emits
channel-minor int8 (re, im) planes, while every beamform formulation
needs antenna-contiguous tiles per channel. Leaving the turn to XLA
fusion (or an XLA transpose copy) runs at ~34 GB/s effective at the
flagship config — XLA's 8-bit transposes are scalar-ish — making the
F→B handoff the dominant cost of the fused pipeline (ROADMAP 2026-08-19:
26.6 of 49.8 ms at S=64). This kernel does the same permute with
explicit DMA tiling and Mosaic's packed 8-bit in-VMEM transpose at
~390 GB/s effective (benchmarks/ct_kernel_probe.py: 6.8 ms at S=128,
measured on v5e).

Output layout — ``[C, 2A, P·S]``:

- antennas on **sublanes**: ``2A`` rows (re block then im block, the
  rotation-block fold of complex_mult_kernel.py:126-134); for int8 the
  sublane tile is 32, so e.g. 2A=160 is five exact tiles, no padding;
- (pol, spectrum) on **lanes**: the beamform's M axis;
- the beamform contracts the sublane axis directly:
  ``beam[c, m, n] = Σ_k x[c, k, m] · w[c, k, n]`` with the
  ``[C, 2A, 2B]`` block-concat steering weights
  (:func:`~dpdk_dc_sand_tpu.ops.coeff_gen.steering_coeff_blockcat`).

In-kernel method: the ``(2, 0, 1)`` permute of an ``[A, s, c]`` tile is
a 2D ``[A·s, c]`` transpose followed by a minor-dim split reshape —
both have native Mosaic lowerings for int8 (the direct 3D permute does
not lower, measured 2026-08-19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Channel-block width (lanes of the input tile / rows of the output).
_C_BLK = 128
#: Lane chunk of the output (per-pol spectra per grid step) when the
#: spectra axis is split; the full-P·S form is used for small S.
_S_CHUNK = 128
#: VMEM cap for the full-P·S (small-S) form: in + out blocks, double
#: buffered (bytes).
_VMEM_CAP = 14 * 1024 * 1024


def corner_turn_supported(n_ants: int, n_pols: int, n_spectra: int, n_channels: int) -> bool:
    """Whether the Pallas kernel handles this geometry (else XLA turn).

    Requires the channel axis to tile by 128 (or be a single block), and
    the output's lane axis to be 128-aligned: either the spectra axis
    tiles by 128 per pol (split path) or ``n_pols·n_spectra`` is a
    multiple of 128 AND the whole block fits in VMEM (full path) —
    Mosaic's minor-dim split reshape needs a 128-multiple minor dim
    (``[c_blk, A·P·S] → [c_blk, A, P·S]`` fails to lower otherwise;
    found by tests/tpu on-chip, 2026-08-20).
    """
    if n_channels % _C_BLK and n_channels >= _C_BLK:
        return False
    if n_spectra % _S_CHUNK == 0:
        return True
    if (n_pols * n_spectra) % 128:
        return False
    c_blk = min(_C_BLK, n_channels)
    per_step = (
        2 * 2 * n_ants * n_pols * n_spectra * c_blk  # two in planes, dbuf
        + 2 * c_blk * 2 * n_ants * n_pols * n_spectra  # out, dbuf
    )
    return per_step <= _VMEM_CAP


def _kernel_split(qr_ref, qi_ref, out_ref, *, a, s_chunk, c_blk):
    """Per-(channel-block, pol, spectra-chunk) grid step."""
    xr = qr_ref[:, 0]  # [A, s_chunk, c_blk] int8
    xi = qi_ref[:, 0]

    def turn(x):
        t = x.reshape(a * s_chunk, c_blk).T
        return t.reshape(c_blk, a, s_chunk)

    out_ref[:, 0:a, :] = turn(xr)
    out_ref[:, a : 2 * a, :] = turn(xi)


def _kernel_full(qr_ref, qi_ref, out_ref, *, a, p, s, c_blk):
    """Per-channel-block grid step covering all pols and spectra."""
    xr = qr_ref[:]  # [A, P, S, c_blk] int8
    xi = qi_ref[:]

    def turn(x):
        t = x.reshape(a * p * s, c_blk).T
        return t.reshape(c_blk, a, p * s)

    out_ref[:, 0:a, :] = turn(xr)
    out_ref[:, a : 2 * a, :] = turn(xi)


#: Plane rows per native-handoff channel block (8 full-lane rows of the
#: F kernel's [out_rows, out_lanes] plane = 8·out_lanes contiguous
#: channels — Pallas block shapes need the sublane dim 8-divisible).
_NATIVE_ROWS = 8


def corner_turn_native_supported(
    n_ants: int, n_pols: int, n_spectra: int, out_rows: int, out_lanes: int
) -> bool:
    """Whether the 5-d native-handoff path takes this geometry: full
    plane rows are channel-contiguous, so blocks are 8-row slabs; the
    lane count must tile by 128 and the spectra axis by the chunk."""
    return (
        out_lanes % 128 == 0
        and n_spectra % _S_CHUNK == 0
        and out_rows % _NATIVE_ROWS == 0
        and (n_ants % 8 == 0 or n_ants < 8)
    )


def _kernel_plane_native(q_ref, out_ref, *, a_blk, s_chunk, c_blk):
    """Per-(channel-slab, ant-block, pol, spectra-chunk) step, 5-d
    native input: the channel block is an 8-row full-lane slab of the F
    kernel's [out_rows, out_lanes] plane (channel k = row·lanes + lane,
    row-major — consecutive rows are contiguous channels)."""
    x = q_ref[:, 0]  # [a_blk, s_chunk, 8, L] int8
    t = x.reshape(a_blk * s_chunk, c_blk).T
    out_ref[...] = t.reshape(c_blk, a_blk, s_chunk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def corner_turn_plane_native(
    q: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Turn ONE fused-kernel-native plane ``[A, P, S, rows, lanes]``
    (``fengine_fused(planes_native=True)``) into ``[C, A, P·S]`` int8.

    Slices the F kernel's own tiled output layout directly — the
    ``[rows, lanes] → [C]`` merge a 4-d consumer forces is a relayout
    copy of the whole int8 plane every step (the
    benchmarks/dma_bisect.py cost class). One call per (re, im) plane;
    feed the pair to
    :func:`~dpdk_dc_sand_tpu.ops.beamform.beamform_turned_split`.
    """
    a, p, s, rows, lanes = q.shape
    if not corner_turn_native_supported(a, p, s, rows, lanes):
        raise ValueError(
            f"native-handoff corner turn unsupported for {q.shape}"
        )
    c = rows * lanes
    c_blk = _NATIVE_ROWS * lanes
    a_blk = 8 if a % 8 == 0 else a
    n_sb = s // _S_CHUNK
    return pl.pallas_call(
        functools.partial(
            _kernel_plane_native, a_blk=a_blk, s_chunk=_S_CHUNK, c_blk=c_blk
        ),
        grid=(c // c_blk, a // a_blk, p, n_sb),
        in_specs=[
            pl.BlockSpec(
                (a_blk, 1, _S_CHUNK, _NATIVE_ROWS, lanes),
                lambda cb, ab, pp, sb: (ab, pp, sb, cb, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (c_blk, a_blk, _S_CHUNK),
            lambda cb, ab, pp, sb: (cb, ab, pp * n_sb + sb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, a, p * s), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        interpret=interpret,
    )(q)


@functools.partial(jax.jit, static_argnames=("interpret",))
def corner_turn_planes(
    qr: jax.Array, qi: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Turn int8 F-engine planes into the beamform operand layout.

    Parameters
    ----------
    qr, qi:
        ``[A, P, S, C]`` (re, im) sample planes, int8 — the F-engine
        output layout — or the fused kernel's NATIVE 5-d
        ``[A, P, S, out_rows, out_lanes]`` plane layout
        (``fengine_fused(planes_native=True)``, channel
        ``k = row·out_lanes + lane``). The 5-d form slices the F
        output's own tiled layout directly, skipping the
        [rows, lanes] → [C] relayout copy XLA inserts between the F
        kernel and a 4-d consumer (benchmarks/dma_bisect.py class of
        cost; both planes, multi-GB, per step).

    Returns
    -------
    ``[C, 2A, P·S]`` int8 with rows ``k = reim·A + a`` and lanes
    ``m = p·S + s`` — feed straight into
    :func:`~dpdk_dc_sand_tpu.ops.beamform.beamform_turned`.
    """
    assert qi.shape == qr.shape
    if qr.ndim == 5:
        raise ValueError(
            "5-d native planes: use corner_turn_plane_native per plane "
            "+ beamform_turned_split (the combined [C, 2A, ·] build "
            "would re-copy both planes)"
        )
    a, p, s, c = qr.shape
    c_blk = min(_C_BLK, c)
    n_cb = c // c_blk
    out_shape = jax.ShapeDtypeStruct((c, 2 * a, p * s), jnp.int8)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * (3 if s % _S_CHUNK == 0 else 1),
    )
    if s % _S_CHUNK == 0:
        n_sb = s // _S_CHUNK
        in_spec = pl.BlockSpec(
            (a, 1, _S_CHUNK, c_blk),
            lambda cb, pp, sb: (0, pp, sb, cb),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            functools.partial(
                _kernel_split, a=a, s_chunk=_S_CHUNK, c_blk=c_blk
            ),
            grid=(n_cb, p, n_sb),
            in_specs=[in_spec, in_spec],
            out_specs=pl.BlockSpec(
                (c_blk, 2 * a, _S_CHUNK),
                lambda cb, pp, sb: (cb, 0, pp * n_sb + sb),
                memory_space=pltpu.VMEM,
            ),
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(qr, qi)

    in_spec = pl.BlockSpec(
        (a, p, s, c_blk), lambda cb: (0, 0, 0, cb), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_full, a=a, p=p, s=s, c_blk=c_blk),
        grid=(n_cb,),
        in_specs=[in_spec, in_spec],
        out_specs=pl.BlockSpec(
            (c_blk, 2 * a, p * s), lambda cb: (cb, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=out_shape,
        compiler_params=params,
        interpret=interpret,
    )(qr, qi)


def corner_turn_x_supported(
    n_ants: int, n_pols: int, n_spectra: int, n_channels: int
) -> bool:
    """Whether the X-layout turn kernel handles this geometry.

    The minor-dim split reshape ``[c_blk, A·P·S] → [c_blk, A·P, S]``
    needs a 128-multiple minor dim, so the spectra axis itself must
    tile by 128 (the B-layout kernel can fold pols into the lanes; the
    X layout cannot — pols are correlator inputs, not time).
    """
    if n_channels % _C_BLK and n_channels >= _C_BLK:
        return False
    return n_spectra % _S_CHUNK == 0


def _kernel_x(qr_ref, qi_ref, out_ref, *, a, p, s_chunk, c_blk):
    """Per-(channel-block, spectra-chunk) grid step, all pols."""
    xr = qr_ref[:]  # [A, P, s_chunk, c_blk] int8
    xi = qi_ref[:]

    def turn(x):
        t = x.reshape(a * p * s_chunk, c_blk).T
        return t.reshape(c_blk, a * p, s_chunk)

    out_ref[:, 0 : a * p, :] = turn(xr)
    out_ref[:, a * p : 2 * a * p, :] = turn(xi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def corner_turn_planes_x(
    qr: jax.Array, qi: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Turn int8 F-engine planes into the CORRELATOR operand layout.

    Same Pallas turn as :func:`corner_turn_planes` but with pols kept as
    correlator input rows instead of folded into the lanes:

    Returns ``[C, 2·A·P, S]`` int8 with rows ``k = reim·A·P + a·P + p``
    (matching the ``a·P + p`` input ordering of
    :func:`~dpdk_dc_sand_tpu.ops.correlate.correlate_planes`) and
    spectra on lanes — feed straight into ``correlate_turned``. The XLA
    transpose this replaces runs at ~34 GB/s effective and dominated the
    FXB step's X marginal at the flagship config (2.17× FB, round 4).
    """
    a, p, s, c = qr.shape
    assert qi.shape == qr.shape
    c_blk = min(_C_BLK, c)
    n_cb = c // c_blk
    n_sb = s // _S_CHUNK
    out_shape = jax.ShapeDtypeStruct((c, 2 * a * p, s), jnp.int8)
    in_spec = pl.BlockSpec(
        (a, p, _S_CHUNK, c_blk),
        lambda cb, sb: (0, 0, sb, cb),
        memory_space=pltpu.VMEM,
    )
    # Windows: 2 in blocks + 1 out block, double-buffered — 20 MB at the
    # flagship geometry, over Mosaic's 16 MB default scoped-VMEM limit.
    win_bytes = 2 * (2 + 2) * a * p * _S_CHUNK * c_blk
    return pl.pallas_call(
        functools.partial(_kernel_x, a=a, p=p, s_chunk=_S_CHUNK, c_blk=c_blk),
        grid=(n_cb, n_sb),
        in_specs=[in_spec, in_spec],
        out_specs=pl.BlockSpec(
            (c_blk, 2 * a * p, _S_CHUNK),
            lambda cb, sb: (cb, 0, sb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=win_bytes + (8 << 20),
        ),
        interpret=interpret,
    )(qr, qi)
