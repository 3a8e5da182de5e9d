"""Pallas visibility kernel: per-channel gram in VMEM, one HBM write.

The XLA gram path (``correlate_turned``) materialises four ``[C, I, I]``
dot outputs in HBM and re-reads them to combine — ~5× the visibility
bytes (33 GB ≈ 42 ms at the flagship config, measured: the FXB X
marginal was HBM-combine-bound, benchmarks/fxb_flagship.py). This
kernel forms all four grams for a channel block in VMEM and writes only
the final ``(V_re, V_im)`` planes — the minimum possible visibility
traffic, the same discipline as the fused F kernel.

Exactness: int8 voltages convert exactly to bf16 (7-bit magnitudes);
each MXU product (≤ 14 bits) is exact in the f32 accumulator, and sums
of up to ``S ≤ 1024`` products stay below 2²⁴ — the kernel is bit-exact
for int8 inputs, like the int8×int8→int32 MXU path it replaces
(tests/test_correlate.py gates this against the int64 golden model).

The ASTRON tensor-core correlator intent (matrix_multiply.py:74-76) in
TPU form: visibilities on the matrix unit, one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Channels per grid step (VMEM: in block + two out blocks, double
#: buffered — ~4 MB at the flagship 160-input geometry).
_C_BLK = 8
#: Exactness bound: f32 accumulation of 14-bit products stays exact up
#: to 2^24 / 2^14 = 1024 terms.
_S_EXACT_MAX = 1024


def xcorr_supported(n_channels: int, n_spectra: int) -> bool:
    """Whether the Pallas visibility kernel applies (else XLA grams)."""
    return (
        n_channels % _C_BLK == 0
        and n_spectra % 8 == 0
        and n_spectra <= _S_EXACT_MAX
    )


def _kernel(xt_ref, vre_ref, vim_ref, *, c_blk, n_inputs, int8_mxu):
    i = n_inputs

    for c in range(c_blk):
        # ONE stacked gram per channel: [2I, S]·[2I, S]ᵀ → [2I, 2I]
        # holds all four visibility blocks. Stacking doubles M/N per
        # dot, which HALVES the MXU tile-padding waste of four separate
        # I×I grams (I = 160 pads to 256 rows; 2I = 320 pads to 384) —
        # the separate-gram form measured MXU-bound at ~39% utilisation.
        if int8_mxu:
            y = xt_ref[c]
            g = jax.lax.dot_general(
                y, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            y = xt_ref[c].astype(jnp.bfloat16)  # int8-exact
            g = jax.lax.dot_general(
                y, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        vre_ref[c] = g[:i, :i] + g[i:, i:]
        vim_ref[c] = g[i:, :i] - g[:i, i:]


@functools.partial(
    jax.jit, static_argnames=("n_inputs", "interpret", "int8_mxu")
)
def correlate_turned_fused(
    xt: jax.Array,
    n_inputs: int,
    *,
    interpret: bool = False,
    int8_mxu: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Visibilities from the X-layout turned planes, one HBM pass.

    ``xt``: ``[C, 2I, S]`` int8 from
    :func:`~dpdk_dc_sand_tpu.ops.corner_turn.corner_turn_planes_x`.
    Returns ``(V_re, V_im)`` ``[C, I, I]`` f32, bit-exact for int8
    inputs (see module docstring).
    """
    c, two_i, s = xt.shape
    assert two_i == 2 * n_inputs
    assert xcorr_supported(c, s), (c, s)
    out = jax.ShapeDtypeStruct((c, n_inputs, n_inputs), jnp.float32)
    out_spec = pl.BlockSpec(
        (_C_BLK, n_inputs, n_inputs),
        lambda cb: (cb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, c_blk=_C_BLK, n_inputs=n_inputs, int8_mxu=int8_mxu
        ),
        grid=(c // _C_BLK,),
        in_specs=[
            pl.BlockSpec(
                (_C_BLK, two_i, s), lambda cb: (cb, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(out, out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xt)


#: Channels turned per grid step of the fused kernel (the transpose
#: wants >=128 lanes); visibilities are written in sub-blocks of
#: _C_BLK channels from the persistent turned scratch.
_CT_BLK = 128


def xcorr_fused_supported(
    n_ants: int, n_pols: int, n_spectra: int, n_channels: int
) -> bool:
    """Whether the turn+gram fused kernel applies to this geometry."""
    return (
        n_channels % _CT_BLK == 0
        and n_spectra % 128 == 0
        and n_spectra <= _S_EXACT_MAX
    )


def _kernel_fused(
    qr_ref, qi_ref, vre_ref, vim_ref, scratch, *, a, p, s, n_inputs,
    int8_mxu,
):
    i = n_inputs
    sub = pl.program_id(1)

    @pl.when(sub == 0)
    def _():
        # Turn this channel block once into the persistent scratch
        # (same in-VMEM packed int8 transpose as corner_turn_planes_x);
        # the 16 visibility sub-steps then read it back channel-wise.
        def turn(x):
            t = x.reshape(a * p * s, _CT_BLK).T
            return t.reshape(_CT_BLK, a * p, s)

        scratch[:, 0 : a * p, :] = turn(qr_ref[:])
        scratch[:, a * p : 2 * a * p, :] = turn(qi_ref[:])

    for j in range(_C_BLK):
        c = sub * _C_BLK + j
        if int8_mxu:
            y = scratch[c]
            g = jax.lax.dot_general(
                y, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            y = scratch[c].astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                y, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        vre_ref[j] = g[:i, :i] + g[i:, i:]
        vim_ref[j] = g[i:, :i] - g[:i, i:]


@functools.partial(jax.jit, static_argnames=("interpret", "int8_mxu"))
def correlate_planes_fused(
    qr: jax.Array,
    qi: jax.Array,
    *,
    interpret: bool = False,
    int8_mxu: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Visibilities straight from the F-engine planes: in-VMEM turn +
    stacked gram in ONE kernel — no turned intermediate in HBM at all
    (the standalone turn+gram pair still paid its write+read, ~3.4 GB at
    the flagship config). Bit-exact for int8 inputs (module docstring).

    ``qr, qi``: ``[A, P, S, C]`` int8 F planes. Returns ``(V_re, V_im)``
    ``[C, I, I]`` f32 with ``I = A·P`` inputs ordered ``a·P + p``.
    """
    a, p, s, c = qr.shape
    i = a * p
    assert xcorr_fused_supported(a, p, s, c), (a, p, s, c)
    n_sub = _CT_BLK // _C_BLK
    in_spec = pl.BlockSpec(
        (a, p, s, _CT_BLK), lambda cb, sub: (0, 0, 0, cb),
        memory_space=pltpu.VMEM,
    )
    out = jax.ShapeDtypeStruct((c, i, i), jnp.float32)
    out_spec = pl.BlockSpec(
        (_C_BLK, i, i),
        lambda cb, sub: (cb * n_sub + sub, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # Windows: 2 in (revisited across sub steps) + 2 out sub-blocks +
    # scratch, double buffered.
    win = 2 * (2 * a * p * s * _CT_BLK + 2 * _C_BLK * i * i * 4)
    win += _CT_BLK * 2 * i * s
    return pl.pallas_call(
        functools.partial(
            _kernel_fused, a=a, p=p, s=s, n_inputs=i, int8_mxu=int8_mxu
        ),
        grid=(c // _CT_BLK, n_sub),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(out, out),
        scratch_shapes=[pltpu.VMEM((_CT_BLK, 2 * i, s), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=win + (16 << 20),
        ),
        interpret=interpret,
    )(qr, qi)
