"""Pallas TPU kernel for the polyphase FIR (the PFB hot loop).

Why a kernel: the jnp tap-sum reads every input frame up to ``n_taps``
times from HBM (overlapping slices are separate operands to the XLA
fusion). This kernel streams each frame through VMEM approximately once —
read amplification ``1 + (n_taps−1)/S_BLK`` ≈ 1.25 — and consumes int8
frames directly (upcast in VMEM), so HBM input traffic is 1 byte/sample
instead of 4. This is the TPU replacement for the reference F-engine's
CUDA FIR (katfgpu; contract per SURVEY.md §5.7/§7).

Structure: grid over (batch, spectra-blocks, lane-blocks); the full frame
array stays in HBM (``memory_space=ANY``) and the kernel issues manually
double-buffered async DMAs of ``[S_BLK + n_taps − 1, F_BLK]`` tiles into
VMEM scratch, overlapping the next tile's DMA with the current tile's
multiply-accumulate (pallas_guide.md "Double Buffering" pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Output spectra rows computed per grid step.
_S_BLK_MAX = 128
#: Lanes processed per grid step.
_F_BLK_MAX = 512
#: Sublane alignment required of manual DMA slices (Mosaic tiled memrefs).
_ROW_ALIGN = 8


def _pick_block(n: int, cap: int) -> int:
    blk = cap
    while blk > 1 and n % blk:
        blk //= 2
    return blk


def fir_supported(frames_shape: tuple[int, ...], n_taps: int) -> bool:
    """Whether the pallas path handles this shape (else jnp fallback)."""
    *_, n_frames, fft_size = frames_shape
    n_spectra = n_frames - n_taps + 1
    if n_spectra < 1 or fft_size % 128:
        return False
    # DMA slice starts (s·s_blk) must be 8-aligned sublane offsets.
    return _pick_block(n_spectra, _S_BLK_MAX) % _ROW_ALIGN == 0


def _fir_kernel(
    frames_hbm,  # [B, n_frames, F] in HBM/ANY
    window_ref,  # [n_taps, F_BLK] VMEM (per lane-block)
    out_ref,  # [1, S_BLK, F_BLK] VMEM
    scratch,  # [2, S_BLK + n_taps - 1, F_BLK] VMEM
    sems,  # DMA semaphores [2]
    *,
    s_blk: int,
    f_blk: int,
    n_taps: int,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    f = pl.program_id(2)
    n_s = pl.num_programs(1)
    n_f = pl.num_programs(2)
    rows = -(-(s_blk + n_taps - 1) // _ROW_ALIGN) * _ROW_ALIGN

    def dma(slot, bi, si, fi):
        return pltpu.make_async_copy(
            frames_hbm.at[bi, pl.ds(si * s_blk, rows), pl.ds(fi * f_blk, f_blk)],
            scratch.at[slot],
            sems.at[slot],
        )

    step = (b * n_s + s) * n_f + f
    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)

    # Warm-up: the very first grid step starts its own DMA.
    @pl.when(step == 0)
    def _():
        dma(slot, b, s, f).start()

    # Prefetch the next step's tile while this one computes.
    nf = jax.lax.rem(f + 1, n_f)
    carry_s = f + 1 == n_f
    ns_ = jax.lax.rem(s + jnp.where(carry_s, 1, 0), n_s)
    carry_b = jnp.logical_and(carry_s, s + 1 == n_s)
    nb = b + jnp.where(carry_b, 1, 0)
    is_last = step + 1 == pl.num_programs(0) * n_s * n_f

    @pl.when(jnp.logical_not(is_last))
    def _():
        dma(next_slot, nb, ns_, nf).start()

    dma(slot, b, s, f).wait()

    tile = scratch[slot].astype(jnp.float32)  # [rows, F_BLK]
    acc = tile[0:s_blk] * window_ref[0]
    for tap in range(1, n_taps):
        acc = acc + tile[tap : tap + s_blk] * window_ref[tap]
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n_spectra",))
def fir_pallas(frames: jax.Array, window: jax.Array, n_spectra: int) -> jax.Array:
    """Polyphase FIR via the streaming kernel.

    ``frames``: ``[..., n_frames, fft_size]`` (int8/float32);
    ``window``: ``[n_taps, fft_size]`` f32. Returns
    ``[..., n_spectra, fft_size]`` f32.
    """
    n_taps, fft_size = window.shape
    *lead, n_frames, f = frames.shape
    assert f == fft_size
    batch = 1
    for d in lead:
        batch *= d
    fr = frames.reshape(batch, n_frames, fft_size)

    s_blk = _pick_block(n_spectra, _S_BLK_MAX)
    f_blk = _pick_block(fft_size, _F_BLK_MAX)
    # Mosaic requires manual-DMA slices on the sublane (second-minor) dim to
    # be 8-aligned in both offset and size, so the per-step window is padded
    # up and the frame array grown with unused zero rows to keep the final
    # step in bounds.
    rows = -(-(s_blk + n_taps - 1) // _ROW_ALIGN) * _ROW_ALIGN
    n_s_blocks = n_spectra // s_blk
    required = (n_s_blocks - 1) * s_blk + rows
    if n_frames < required:
        pad = required - n_frames
        fr = jnp.pad(fr, ((0, 0), (0, pad), (0, 0)))
    grid = (batch, n_s_blocks, fft_size // f_blk)

    out = pl.pallas_call(
        functools.partial(
            _fir_kernel, s_blk=s_blk, f_blk=f_blk, n_taps=n_taps
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (n_taps, f_blk),
                lambda b, s, f: (0, f),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s_blk, f_blk),
            lambda b, s, f: (b, s, f),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, n_spectra, fft_size), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, f_blk), frames.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(fr, window)
    return out.reshape(*lead, n_spectra, fft_size)
