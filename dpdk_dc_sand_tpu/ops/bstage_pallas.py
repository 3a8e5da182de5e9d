"""Fused Pallas B-stage: corner turn + multi-beam dot in ONE kernel.

The two-pass turned B-stage (ops/corner_turn.py + beamform_turned)
materialises the ``[C, 2A, P·S]`` int8 operand in HBM: one full write and
one full read (~2.7 GB at the flagship config) that exist only to hand
XLA a dot-friendly layout — measured 12.5 + 2.3 ms of the 82.7 ms step
(benchmarks/turned_stage_split.py, S=128). This kernel does the
transpose in VMEM and feeds the MXU directly, eliminating the HBM
round-trip — the TPU analog of the reference's fused
coeff-gen + beamform kernel (BeamformerKernels.cu:192-366), which staged
antenna data in shared memory for exactly the same reason.

MXU packing: one channel's dot is ``[2A, P·S]ᵀ · [2A, 2B]`` with
N = 2B = 32 — 25% lane utilisation. Four channels are folded into one
**block-diagonal** dot ``[4·2A, P·S]ᵀ · [4·2A, 4·2B=128]`` (zeros built
in VMEM, never in HBM), filling all 128 output lanes; the packed output
``[C/4, P·S, 128]`` is unpacked to beam planes by one fused XLA
transpose (the same cost the canonical-layout epilogue always pays).

**Measured (v5e, 2026-08-20, benchmarks/turned_stage_split.py bf):**
84.6 ms full step vs 82.7 for the two-pass turned path at the flagship
config — the in-VMEM block-diagonal build costs slightly more than the
HBM round-trip it saves, so ``bstage="turned"`` stays the auto default
and this kernel is an explicit option (it wins where HBM is more
contended, e.g. when the step shares the chip with correlation).

Accuracy: identical rounding points to :func:`beamform_turned` — int8
samples converted to the dot dtype, f32 accumulation; the block-diagonal
zeros contribute exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Channels per grid step (minor-axis slice width of the int8 reads;
#: Mosaic block shapes need a 128-multiple minor dim).
_C_BLK = 128
#: MXU lane width the channel fold fills.
_LANES = 128


def bstage_fused_supported(
    n_ants: int, n_pols: int, n_spectra: int, n_beams: int, n_channels: int
) -> bool:
    """Geometry gate (else fall back to the two-pass turned path)."""
    ps = n_pols * n_spectra
    if ps % 128:
        return False  # in-VMEM turn needs a 128-aligned lane axis
    if _LANES % (2 * n_beams) or 2 * n_beams > _LANES:
        return False
    pack = _LANES // (2 * n_beams)
    c_blk = min(_C_BLK, n_channels)
    if n_channels % c_blk or c_blk % pack:
        return False
    # VMEM: in blocks (x2 planes, dbuf), weights, packed out (dbuf),
    # turned temps — keep a wide margin under the raised 64 MiB cap.
    in_bytes = 2 * 2 * n_ants * n_pols * n_spectra * c_blk
    out_bytes = 2 * (c_blk // pack) * ps * _LANES * 4
    temps = 2 * c_blk * n_ants * ps
    return in_bytes + out_bytes + temps + (c_blk * 2 * n_ants * 2 * n_beams * 2) < 48 << 20


def _kernel(qr_ref, qi_ref, w_ref, out_ref, *, a, p, s, c_blk, pack, nb2, dtype):
    """One channel block: turn in VMEM, block-diagonal dot per group."""
    ps = p * s

    def turn(x_ref):
        # [A, P, S, c_blk] -> [c_blk, A, P·S]; lanes m = p·S + s (the
        # beamform_turned convention). 2D transpose + minor split both
        # have native Mosaic int8 lowerings (ops/corner_turn.py).
        t = x_ref[:].reshape(a * ps, c_blk).T
        return t.reshape(c_blk, a, ps)

    xr = turn(qr_ref)  # int8
    xi = turn(qi_ref)

    for g in range(c_blk // pack):
        xs = []
        rows = []
        for j in range(pack):
            c = g * pack + j
            # sample rows for channel c: [2A, PS] (re block then im block)
            xs.append(xr[c].astype(dtype))
            xs.append(xi[c].astype(dtype))
            # block-diagonal weight rows: [2A, pack·2B] with channel c's
            # [2A, 2B] block at column j·2B
            wj = w_ref[c].astype(dtype)  # [2A, 2B]
            pieces = []
            if j:
                pieces.append(jnp.zeros((2 * a, j * nb2), dtype))
            pieces.append(wj)
            if pack - 1 - j:
                pieces.append(jnp.zeros((2 * a, (pack - 1 - j) * nb2), dtype))
            rows.append(jnp.concatenate(pieces, axis=1))
        x4 = jnp.concatenate(xs, axis=0)  # [pack·2A, PS]
        wbd = jnp.concatenate(rows, axis=0)  # [pack·2A, pack·2B]
        # out[m, n] = Σ_k x4[k, m]·wbd[k, n] — contract sublanes (MXU
        # natural), f32 accumulate.
        out_ref[g] = jax.lax.dot_general(
            x4,
            wbd,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.jit, static_argnames=("n_pols", "precision", "interpret", "layout")
)
def beamform_turned_fused(
    qr: jax.Array,
    qi: jax.Array,
    blocks: jax.Array,
    n_pols: int = 2,
    precision: str = "bf16",
    interpret: bool = False,
    layout: str = "split",
) -> tuple[jax.Array, jax.Array] | jax.Array:
    """Corner turn + beamform in one Pallas kernel.

    Parameters
    ----------
    qr, qi:
        ``[A, P, S, C]`` int8 F-engine planes (the fused F kernel's
        output layout — no HBM reorder in between).
    blocks:
        ``[C, 2A, 2B]`` block-concat steering weights
        (:func:`~dpdk_dc_sand_tpu.ops.coeff_gen.steering_coeff_blockcat`).

    Returns
    -------
    ``layout="split"``: ``(beam_re, beam_im)`` each ``[P, C, S, B]``
    float32 — identical contract to
    :func:`~dpdk_dc_sand_tpu.ops.beamform.beamform_turned`.
    ``layout="packed"``: the kernel's own ``[C/pack, P·S, pack·2B]``
    f32 output with NO unpack epilogue — lanes hold ``pack`` adjacent
    channels' ``[re beams | im beams]`` column groups (the
    block-diagonal fold's natural wire format; egress flattens bytes
    and declares layout in heap metadata).
    """
    a, p, s, c = qr.shape
    assert qi.shape == qr.shape and p == n_pols
    nb2 = blocks.shape[-1]  # 2B
    nb = nb2 // 2
    pack = _LANES // nb2
    c_blk = min(_C_BLK, c)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    ps = p * s
    out_shape = jax.ShapeDtypeStruct((c // pack, ps, pack * nb2), jnp.float32)
    in_spec = pl.BlockSpec(
        (a, p, s, c_blk), lambda cb: (0, 0, 0, cb), memory_space=pltpu.VMEM
    )
    packed = pl.pallas_call(
        functools.partial(
            _kernel, a=a, p=p, s=s, c_blk=c_blk, pack=pack, nb2=nb2,
            dtype=dtype,
        ),
        grid=(c // c_blk,),
        in_specs=[
            in_spec,
            in_spec,
            pl.BlockSpec(
                (c_blk, 2 * a, nb2), lambda cb: (cb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (c_blk // pack, ps, pack * nb2),
            lambda cb: (cb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 << 20,
        ),
        interpret=interpret,
    )(qr, qi, blocks)

    if layout == "packed":
        return packed
    # Unpack [C/pack, P·S, pack·2B] -> beam planes [P, C, S, B]: one
    # fused XLA transpose (the canonical-layout epilogue cost).
    x = packed.reshape(c // pack, p, s, pack, 2, nb)
    x = jnp.transpose(x, (1, 0, 3, 2, 4, 5)).reshape(p, c, s, 2, nb)
    return x[..., 0, :], x[..., 1, :]
