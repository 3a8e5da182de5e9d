"""Fused F-engine Pallas kernel: FIR + rFFT + fine delay + requantise.

One kernel performs the whole F chain in VMEM — int8 frames in, int8
(re, im) channelised planes out, ~0.85 GB of HBM per flagship step
instead of ~4.5 GB of materialised f32/complex64 intermediates.

**Measured outcome (v5e, 2026-08-20, benchmarks/f_diag.py —
chained-ADC streaming methodology; earlier numbers from the
loop-hoisted bench were wrong in both directions):** this kernel IS the
fast path. The honest composed (XLA) path runs ~92 ms/step ≈ 3.7 Gs/s
at the flagship config — XLA's TPU rFFT lowers to a four-step 256×256
matmul-FFT that materialises five ~1.25 GB f32 stage temps per step —
while this kernel keeps everything in VMEM. F-stage at S=128 with the
batch-A schedule: 63.0 ms with an XLA coarse-delay pass, 58.8 ms with
the coarse delay folded into the kernel DMA (``coarse_delays=``), and
54.4 ms ≈ 24.7 Gs/s with the rolling bf16 FIR-history ring on top
(``rolling=True`` — both defaults via ``FBEngine``). The two-stage
matmul-FFT spends more MXU MACs than a split-radix FFT would, but MACs
are not the limiter — HBM traffic is, and this form eliminates it.

It is the TPU-native replacement for the reference F-engine's CUDA
FIR+cuFFT chain (katfgpu, merge_gpu_repositories/do_merge.sh:4-10) with
the channelisation contract of
``bdd_experiment/test/features/channelisation.feature:5-9``.

Structure (per grid step = one (antenna·pol) batch × one spectra block):

1. **Streaming FIR** — the input in HBM is *viewed* as
   ``[B, n_frames·N1, 2·N2]`` (a free row-major reshape of
   ``[B, n_frames, fft_size]``), so the manually double-buffered DMA tile
   arrives in VMEM already shaped for the DFT stages; the tap
   multiply-accumulate runs on whole ``[N1, 2N2]`` slabs (VPU, f32
   window — bf16 window rounding would lift the filterbank leakage floor
   above the −62 dB spec).
2. **Real FFT on the MXU, decimation-in-time** — the even/odd sample
   streams (``e[m] = x[2m]``, ``o[m] = x[2m+1]``, a minor-axis view, no
   shuffle) each get a length-``N`` DFT via a two-stage Cooley–Tukey
   factorisation ``N = N1·N2`` (12 ``[N1,N1]@[N1,N2]``-class matmuls per
   spectrum — stage A is cheap because the inputs are real) with rounded
   (bf16-default) DFT operands and **float32 accumulation**, twiddles
   applied on the VPU between stages. Stage B contracts against the
   shared axis directly so its output lands transposed — ``[k2, k1]``
   with channel index ``k = k2·N1 + k1`` — which makes the final HBM
   write layout-natural (the caller's flatten is a bitcast).
3. **DIT combine** — ``X[k] = E[k] + W_{2N}^k · O[k]`` for the kept bins
   ``k < N`` with precomputed ``e^{−iπk/N}`` grids. (The classic packed-
   complex-FFT + Hermitian-untangle alternative needs an index reversal,
   which Mosaic has no primitive for; the DIT form is reversal-free and
   only ~33% more MXU work — far off the critical path.)
4. **Fine delay + requant** — the per-antenna phase ramp
   (ops/delay.py convention, coeff_generator.py:55-65) and round-half-
   even int8 saturation (golden/requant.py) applied in-register before
   the only HBM write.

Accuracy: DFT operand rounding is *non-accumulating* (f32 accumulate), so
per-bin relative error ≈ bf16 eps ≈ 4e-3 — under half an int8 code at the
standard requant gain — and tone leakage lands at ≈ −90 dB, well inside
the −62 dB acceptance spec (leakage scales as eps/√N because rounding
noise adds incoherently while the tone peak adds coherently over N).
``dft_dtype="float32"`` keeps exact f32 MACs for qualification runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Spectra computed per grid step (bounds VMEM: FIR slab + temporaries).
#: 16 measured ~6% faster than 8 at the flagship config (fewer grid
#: steps, better stage-A batching; benchmarks/fused_tune.py).
_S_BLK_MAX = 16
#: Sublane alignment required of manual DMA slices (Mosaic tiled memrefs).
_ROW_ALIGN = 8


def _split_pow2(n: int) -> tuple[int, int]:
    """n = n1 * n2, powers of two, near-balanced with n2 >= 64.

    The HBM frame view has ``2·n2`` lanes and Mosaic DMA slices require
    128-lane alignment, so n2 is floored at 64.
    """
    l = n.bit_length() - 1
    n1 = 1 << ((l + 1) // 2)
    n2 = n // n1
    if n2 < 64:
        n2 = min(64, n // 8)
        n1 = n // n2
    return n1, n2


def _split_ct(fft_size: int) -> tuple[int, int] | None:
    """fft_size = N1 * N2 for the direct-CT kernel, or None if unviable.

    Constraints: the HBM frame view is ``[n_frames·N1, N2]`` int8, so N2
    (the lane axis) wants >= 128 and N1 (the DMA row unit) must be
    8-aligned.
    """
    l = fft_size.bit_length() - 1
    n1 = 1 << ((l + 1) // 2)
    n2 = fft_size // n1
    if n2 < 128 and fft_size >= 8 * 128:
        n2 = 128
        n1 = fft_size // n2
    if n1 % _ROW_ALIGN or n2 < 128 or n2 % 2:
        return None
    return n1, n2


def _deint_mode(n: int, deint: str = "auto") -> tuple[str, int, int]:
    """Pick the kernel variant and its N1·N2 split.

    ``ct`` (the default where viable): **direct two-stage Cooley–Tukey
    on the full frame** with half-output. The row-major frame view
    ``[N1, N2]`` (fft_size = N1·N2) IS the decimation, stage A contracts
    the row axis with real input (2 dots), and keeping only
    ``k2 < N2/2`` of stage B's output yields exactly the rfft bins
    ``k = k2·N1 + k1 < fft/2`` — no even/odd deinterleave matmul (−20%
    MXU MACs) and no DIT-combine epilogue. The even/odd modes below
    date from rfft-on-half-length thinking; the direct half-output form
    dominates them on TPU.

    ``matmul``: even/odd DIT via a [2N2, 2N2] selection permutation on
    the MXU (n here is fft_size/2). Fallback for shapes ct can't take;
    measured 2.7x faster than ``bitcast`` at the flagship config
    (benchmarks/fused_tune.py, 2026-08: 14.5 vs 38.8 ms at S=32).

    ``bitcast``: the wrapper bitcasts int8 sample pairs to int16 (a
    layout no-op — little-endian low byte = even sample) and the kernel
    extracts the two streams with int32 shifts on the VPU. Needs
    ``n2 >= 128`` (int16 lane alignment) and ``n1 % 8 == 0``. Kept for
    the measured record.
    """
    if deint in ("auto", "ct"):
        ct = _split_ct(2 * n)
        if ct is not None:
            return ("ct", *ct)
        if deint == "ct":
            raise ValueError(f"fft_size {2 * n} unsupported by the ct kernel")
    if deint == "bitcast":
        n1b, n2b = _split_pow2(n)
        if n2b < 128 and n >= 8 * 128:
            n1b, n2b = n // 128, 128
        if n2b >= 128 and n1b % _ROW_ALIGN == 0:
            return "bitcast", n1b, n2b
    return ("matmul", *_split_pow2(n))


def _pick_s_blk(n_spectra: int, cap: int = _S_BLK_MAX) -> int:
    blk = cap
    while blk > 1 and n_spectra % blk:
        blk //= 2
    return blk


def coarse_margin_samples(
    fft_size: int,
    n_taps: int,
    n_spectra: int,
    ct_batch_a: bool = False,
    s_blk: int | None = None,
) -> int | None:
    """Trailing ADC margin (samples) the in-kernel coarse delay needs
    BEYOND the largest coarse delay (DMA padding slack).

    The caller must supply ``out_len + coarse_margin_samples(...) +
    max_delay`` samples — exactly as the XLA alignment path needs
    ``out_len + max_delay``, plus this constant slack. ``None`` when the
    geometry can't take the direct-CT kernel (the only form with the
    manual-DMA structure the fold needs).
    """
    n = fft_size // 2
    mode, n1, n2 = _deint_mode(n)
    if mode != "ct":
        return None
    s_blk = _pick_s_blk(n_spectra, s_blk or (8 if ct_batch_a else _S_BLK_MAX))
    pad = _coarse_pad_rows((s_blk + n_taps - 1) * n1)
    fresh = _coarse_pad_rows(s_blk * n1)
    return max(pad, fresh) * n2


def ingest_alignment(fft_size: int) -> int | None:
    """Sample alignment the in-kernel coarse path wants of the ADC length.

    The wrapper views the raw stream as ``[B, n_rows, N2]``; when the
    stream length is not a multiple of N2 it must slice off the partial
    trailing row first, and XLA materialises that slice as a COPY of the
    whole multi-GB stream every step — silently erasing the in-kernel
    coarse-delay win (found round 3: the full-step bench provisioned
    ``slack + 16`` and lost ~10 ms/step to exactly this copy while the
    F-only diagnostic used an aligned margin and showed the win).
    Provision ``margin`` so ``samples_in + margin`` is a multiple of this
    value. ``None`` when the direct-CT kernel doesn't apply.
    """
    mode, _, n2 = _deint_mode(fft_size // 2)
    return n2 if mode == "ct" else None


def pipeline_supported(n_spectra: int, n_channels: int) -> bool:
    """Whether the software-pipelined batch-A schedule applies here
    (direct-CT form with an even default s_blk >= 4)."""
    return pipeline_auto_k(n_spectra, n_channels) >= 2


def pipeline_auto_k(n_spectra: int, n_channels: int) -> int:
    """Measured-best sub-block count for the pipelined schedule (0 = not
    supported). 4-way beats 2-way at the flagship config (49.1 vs
    50.8 ms F-only, f_diag.py pipe4rollck/piperollck 2026-08-21)."""
    if _deint_mode(n_channels)[0] != "ct":
        return 0
    s_blk = _pick_s_blk(n_spectra, 8)
    for k in (4, 2):
        if s_blk >= 2 * k and s_blk % k == 0:
            return k
    return 0


def flat_out_auto(
    n_channels: int,
    n_spectra: int,
    s_blk: int | None,
    ct_batch_a: bool,
) -> bool:
    """Shared engine-side resolution for ``fengine_flat_out="auto"``:
    True iff the quantised direct-CT kernel would run with an
    8-divisible spectra block on a full-lane geometry. One owner for
    the s_blk-default coupling with the kernel (``default_blk``) so the
    three engines cannot drift from the kernel's gate."""
    blk = _pick_s_blk(n_spectra, s_blk or (8 if ct_batch_a else _S_BLK_MAX))
    return flat_out_supported(n_channels) and blk % 8 == 0


def flat_out_supported(n_channels: int) -> bool:
    """Whether the in-kernel consumer-layout emission applies here.

    The per-spectrum ``[rows, lanes] → [C]`` flatten is a Mosaic
    sublane→lane shape cast, which only lowers for full-lane planes
    (``lanes % 128 == 0``) — narrow-lane geometries fail with
    "infer-vector-layout: unsupported shape cast" (found by the on-chip
    suite at C=512, lanes=8)."""
    mode, n1, _ = _deint_mode(n_channels)
    return mode == "ct" and n1 % 128 == 0


def rolling_supported(n_channels: int) -> bool:
    """Whether the rolling bf16 FIR-history ring applies here.

    The ring persists aligned frame groups across grid steps, which
    needs the direct-CT kernel's manual-DMA structure (the DIT
    selection/bitcast variants re-derive their operands per step).
    """
    return _deint_mode(n_channels)[0] == "ct"


def fused_supported(frames_shape: tuple[int, ...], n_taps: int, n_channels: int) -> bool:
    """Whether the fused kernel handles this shape (else composed ops)."""
    *_, n_frames, fft_size = frames_shape
    if fft_size & (fft_size - 1) or fft_size < 128:
        return False
    if n_channels != fft_size // 2:
        return False
    n_spectra = n_frames - n_taps + 1
    if n_spectra < 1:
        return False
    _, n1, n2 = _deint_mode(fft_size // 2)
    # Manual DMA row slices must be 8-aligned (rows move in units of N1)
    # and the frame view needs >=128 int8 lanes (2*n2).
    return n1 % _ROW_ALIGN == 0 and n2 >= 64


def _fengine_kernel(
    frames_hbm,  # matmul: [B, n_frames*N1, 2*N2] int8; bitcast: […, N2] i16
    wina_ref,  # matmul: PFB window [n_taps*N1, 2*N2] f32; bitcast: even half
    winb_ref,  # matmul: [2*N2, 2*N2] even/odd selection; bitcast: odd window
    dft1c_ref,  # [N1, N1] stage-A DFT cos
    dft1s_ref,  # [N1, N1] stage-A DFT −sin
    dft2c_ref,  # [N2, N2] stage-B DFT cos
    dft2s_ref,  # [N2, N2] stage-B DFT −sin
    twc_ref,  # [N1, s_blk*N2] inter-stage twiddle cos (block-tiled)
    tws_ref,  # [N1, s_blk*N2] inter-stage twiddle −sin
    untc_ref,  # [N2, N1] DIT-combine cos(πk/N)
    unts_ref,  # [N2, N1] DIT-combine −sin(πk/N)
    rotc_ref,  # [1, N2, N1] f32: per-batch fine-delay rotation cos
    rots_ref,  # [1, N2, N1] f32: per-batch fine-delay rotation sin
    outr_ref,  # [1, s_blk, N2, N1] int8
    outi_ref,  # [1, s_blk, N2, N1] int8
    scratch,  # [2, (s_blk+taps-1)*N1, lanes] input-dtype VMEM
    ev_ref,  # [N1, s_blk*N2] even-stream staging (dft dtype)
    od_ref,  # [N1, s_blk*N2] odd-stream staging
    sems,  # DMA semaphores [2]
    *,
    s_blk: int,
    n_taps: int,
    n1: int,
    n2: int,
    dft_dtype,
    deint: str,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    rows = (s_blk + n_taps - 1) * n1

    def dma(slot, bi, si):
        return pltpu.make_async_copy(
            frames_hbm.at[bi, pl.ds(si * s_blk * n1, rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    step = b * n_s + s
    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        dma(slot, b, s).start()

    ns_ = jax.lax.rem(s + 1, n_s)
    nb = b + jnp.where(s + 1 == n_s, 1, 0)
    is_last = step + 1 == pl.num_programs(0) * n_s

    @pl.when(jnp.logical_not(is_last))
    def _():
        dma(next_slot, nb, ns_).start()

    dma(slot, b, s).wait()

    # Per-channel fine-delay rotation for this batch: precomputed by XLA
    # and DMA'd in. (Computing the cos/sin grids in-kernel was HALF the
    # kernel's runtime — 6.4 ms of 13.3 at the flagship config — Mosaic's
    # transcendental lowering is far slower than two [N2, N1] plane
    # reads; benchmarks/fused_ablate.py, 2026-08.)
    rot_c, rot_s = rotc_ref[0], rots_ref[0]

    d1c, d1s = dft1c_ref[:].astype(dft_dtype), dft1s_ref[:].astype(dft_dtype)
    d2c, d2s = dft2c_ref[:].astype(dft_dtype), dft2s_ref[:].astype(dft_dtype)

    # Mosaic's default matmul precision is bf16 passes; the float32 DFT
    # mode must request true f32 MACs explicitly.
    prec = (
        jax.lax.Precision.HIGHEST
        if dft_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dot(a, w):
        return jnp.dot(
            a, w, preferred_element_type=jnp.float32, precision=prec
        )

    def dot_t(w, a):
        # X[i, j] = sum_c w[i, c] * a[j, c]  (rhs contracted on its minor
        # axis — the MXU-natural layout; output lands transposed).
        return jax.lax.dot_general(
            w,
            a,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # ---- FIR + deinterleave, staged per spectrum into [N1, s_blk·N2]
    # scratches so stage A runs as s_blk-batched matmuls (small per-
    # spectrum matmuls serialise the MXU; batching spectra onto the
    # column axis keeps it fed).
    if deint == "bitcast":
        # Even/odd sample streams by byte extraction: the wrapper
        # bitcast the int8 pairs to int16 (low byte = even sample), so
        # two VPU shifts replace the [2N2, 2N2] selection matmul (~20%
        # of the kernel's MXU MACs). The FIR (elementwise in the
        # in-frame index) commutes with the deinterleave, so it runs on
        # the split planes with split windows. One conversion of the
        # whole tile (the sliding FIR reads every row up to n_taps
        # times; per-slab astype would reconvert each row n_taps times).
        # Shifts run at int32 — Mosaic has no 16-bit shift lowering.
        v = scratch[slot].astype(jnp.int32)
        tile_e = ((v << 24) >> 24).astype(jnp.bfloat16)
        tile_o = (v >> 8).astype(jnp.bfloat16)
        for si in range(s_blk):
            acc_e = tile_e[si * n1 : (si + 1) * n1] * wina_ref[0:n1]
            acc_o = tile_o[si * n1 : (si + 1) * n1] * winb_ref[0:n1]
            for tap in range(1, n_taps):
                rows_t = slice((si + tap) * n1, (si + tap + 1) * n1)
                wrows = slice(tap * n1, (tap + 1) * n1)
                acc_e = acc_e + tile_e[rows_t] * wina_ref[wrows]
                acc_o = acc_o + tile_o[rows_t] * winb_ref[wrows]
            cols = slice(si * n2, (si + 1) * n2)
            ev_ref[:, cols] = acc_e.astype(ev_ref.dtype)
            od_ref[:, cols] = acc_o.astype(od_ref.dtype)
    else:
        # One int8→bf16 conversion of the whole tile (int8 is exact in
        # bf16); the multiply-accumulate stays f32.
        tile = scratch[slot].astype(jnp.bfloat16)
        for si in range(s_blk):
            # FIR: one [N1, 2N2] slab per tap, f32 accumulate (VPU)
            acc = tile[si * n1 : (si + 1) * n1] * wina_ref[0:n1]
            for tap in range(1, n_taps):
                acc = acc + (
                    tile[(si + tap) * n1 : (si + tap + 1) * n1]
                    * wina_ref[tap * n1 : (tap + 1) * n1]
                )
            # even/odd sample streams via a selection matmul: Mosaic has
            # no strided-lane slice / trailing-2 shape cast; a
            # permutation matmul on the MXU is exact (one unit term per
            # output).
            deintr = dot(acc.astype(dft_dtype), winb_ref[:].astype(dft_dtype))
            ev_ref[:, si * n2 : (si + 1) * n2] = deintr[:, :n2].astype(
                ev_ref.dtype
            )
            od_ref[:, si * n2 : (si + 1) * n2] = deintr[:, n2:].astype(
                od_ref.dtype
            )

    # ---- stage A, batched over the spectra block (4 matmuls of
    # [N1, N1] @ [N1, s_blk·N2]) + twiddle on pre-tiled grids ----
    def stage_a(x_ref):
        x = x_ref[:]
        ar, ai = dot(d1c, x), dot(d1s, x)
        tr = ar * twc_ref[:] - ai * tws_ref[:]
        ti = ar * tws_ref[:] + ai * twc_ref[:]
        return tr.astype(dft_dtype), ti.astype(dft_dtype)

    etr, eti = stage_a(ev_ref)
    otr, oti = stage_a(od_ref)

    for si in range(s_blk):
        sl = slice(si * n2, (si + 1) * n2)

        def stage_b(tr, ti):
            # transposed out: X[k2, k1] = Σ_c F2[k2,c]·T[k1,c]
            re = dot_t(d2c, tr[:, sl]) - dot_t(d2s, ti[:, sl])
            im = dot_t(d2c, ti[:, sl]) + dot_t(d2s, tr[:, sl])
            return re, im

        er, ei = stage_b(etr, eti)
        orr, oi = stage_b(otr, oti)

        # ---- DIT combine: X[k] = E[k] + W_{2N}^k · O[k] ----
        xr = er + untc_ref[:] * orr - unts_ref[:] * oi
        xi = ei + untc_ref[:] * oi + unts_ref[:] * orr

        # ---- fine delay rotation + round-half-even int8 requant (the
        # requant gain is pre-folded into rot_c/rot_s by the wrapper) ----
        outr = xr * rot_c - xi * rot_s
        outi = xr * rot_s + xi * rot_c
        qr = jnp.clip(jnp.rint(outr), -127.0, 127.0)
        qi = jnp.clip(jnp.rint(outi), -127.0, 127.0)
        outr_ref[0, si] = qr.astype(jnp.int8)
        outi_ref[0, si] = qi.astype(jnp.int8)


def _coarse_pad_rows(rows: int) -> int:
    """Extra DMA rows for in-kernel coarse delay: 8 for the sub-8 row
    residual + 1 for the lane carry, rounded so the padded tile stays
    32-row aligned (the u32 bitcast view needs 8-aligned word-rows)."""
    return ((rows + 9 + 31) // 32) * 32 - rows


def _align_tile(u8, qr, r):
    """Advance an int8 ``[R, N2]`` tile by ``qr·N2 + r`` samples in VMEM.

    The in-kernel coarse delay: Mosaic's dynamic rotate is 32-bit-only,
    so the int8 tile is bitcast to a u32 view (4 consecutive rows pack
    little-endian into each word-row — verified on hardware), where

    - a shift by k int8 rows is ``(u >> 8k) | (next_word_row << 32−8k)``
      (static byte shifts + one static sublane roll);
    - a shift by r lanes is one dynamic lane rotate, with the wrapped
      lanes patched from the next-int8-row view.

    ``R % 32 == 0`` required (u32 sublane alignment). The caller's DMA
    supplies ``_COARSE_EXTRA_ROWS`` rows beyond the nominal tile so the
    shifted window stays in bounds; rows past the nominal count hold
    shifted-in garbage and must not be read.
    """
    rw = u8.shape[0] // 4
    n2 = u8.shape[1]
    u = pltpu.bitcast(u8, jnp.uint32)  # [rw, n2]
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)

    # Row shift qr in 0..7 = word-row roll (qw in {0,1}) + a uniform
    # dynamic byte shift (qb in 0..3; `qb+4` when qw folds in would
    # exceed the 32-bit shift range, hence the separate roll).
    qw, qb = qr // 4, qr % 4
    sh = (8 * qb).astype(jnp.uint32)  # keep shifts unsigned (logical)
    shc = jnp.uint32(32) - sh
    down = pltpu.roll(u, rw - 1, 0)
    vw = jnp.where(qw == 1, down, u)
    vw_dn = jnp.where(qw == 1, pltpu.roll(u, rw - 2, 0), down)
    v = jnp.where(qb == 0, vw, (vw >> sh) | (vw_dn << shc))
    # Lane shift r with next-int8-row carry on the wrapped lanes.
    nxt = (v >> 8) | (pltpu.roll(v, rw - 1, 0) << 24)
    rolled = pltpu.roll(v, (n2 - r) % n2, 1)
    rolled_n = pltpu.roll(nxt, (n2 - r) % n2, 1)
    aligned = jnp.where(lane >= n2 - r, rolled_n, rolled)
    return pltpu.bitcast(aligned, jnp.int8)


def _fengine_kernel_ct(
    frames_hbm,  # [B, n_frames*N1, N2] int8 (fft_size = N1*N2, row-major)
    wina_ref,  # PFB window [n_taps*N1, N2] f32
    dft1c_ref,  # [N1, N1] stage-A DFT cos
    dft1s_ref,  # [N1, N1] stage-A DFT −sin
    dft2_ref,  # [N2, N2] stage-B half-output DFT [cos; −sin] row-stacked
    twc_ref,  # [N1, N2] inter-stage twiddle cos(2π·k1·n2/fft)
    tws_ref,  # [N1, N2] −sin
    rotc_ref,  # [1, N2/2, N1] f32 per-batch rotation cos · quant_scale
    rots_ref,  # [1, N2/2, N1] f32 sin · quant_scale
    outr_ref,  # [1, s_blk, N2/2, N1] int8
    outi_ref,  # [1, s_blk, N2/2, N1] int8
    scratch,  # [2, (s_blk+taps-1)*N1, N2] int8 VMEM
    *rest,  # [accb_ref  [N1, s_blk*N2] staging (batch_a only)], sems
    s_blk: int,
    n_taps: int,
    n1: int,
    n2: int,
    dft_dtype,
    batch_a: bool = False,
    sref=None,  # [B, 3] i32 SMEM (q8 rows, row residual, lane shift)
    coarse_pad: int = 0,
    rolling: bool = False,
    fresh_pad: int = 0,
    pipeline: bool = False,
    xpipe: bool = False,
    quantise: bool = True,
    ring_dtype=jnp.bfloat16,
    tap_outer: bool = False,
    slab: bool = False,
    b_fuse: bool | str = False,
    skew: bool | str = False,
    ablate: str | None = None,
    flat_out: bool = False,
):
    """Direct-CT F-engine: FIR + half-output 2-stage DFT + delay + requant.

    Per spectrum: ``X[k2·N1 + k1] = Σ_{n2} d2[k2,n2] · tw[k1,n2] ·
    Σ_{n1} x[n1·N2+n2] · d1[k1,n1]`` for ``k2 < N2/2`` — the rfft bins
    ``k < fft/2`` land on the ``[N2/2, N1]`` output plane row-major, the
    same layout contract as the DIT kernel. Two schedules:

    - per-si (default): each unrolled spectrum runs FIR→A→B→requant; the
      spectra are independent, so Mosaic overlaps si's MXU stages with
      si+1's VPU FIR.
    - ``batch_a``: FIR outputs staged into a ``[N1, s_blk·N2]`` buffer so
      stage A runs as 2 block-wide matmuls (``[N1,N1] @ [N1, s_blk·N2]``)
      with pre-tiled twiddles; stage B and the epilogue stay per-si on
      column slices. Same math, same rounding points (the staging write
      is the ``accd`` cast).
    """
    kway = (2 if pipeline is True else int(pipeline)) if pipeline else 0
    accbs = ()
    if rolling:
        if batch_a and kway:
            ring_ref, *accbs, sems = rest
        elif batch_a:
            ring_ref, accb_ref, sems = rest
        else:
            ring_ref, sems = rest
    elif batch_a and kway:
        *accbs, sems = rest
    elif batch_a:
        accb_ref, sems = rest
    else:
        (sems,) = rest
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    n_groups = s_blk + n_taps - 1  # ring slots (frame groups)
    rows = n_groups * n1
    rows_dma = rows + (coarse_pad if sref is not None else 0)
    fresh_rows = s_blk * n1
    fresh_dma = fresh_rows + (fresh_pad if sref is not None else 0)

    def q8_of(bi):
        # Per-batch coarse-delay row offset (8-aligned by construction;
        # the sub-row residual is shifted in VMEM).
        return pl.multiple_of(sref[bi, 0], 8) if sref is not None else 0

    def dma_full(slot, bi, si):
        return pltpu.make_async_copy(
            frames_hbm.at[bi, pl.ds(si * s_blk * n1 + q8_of(bi), rows_dma), :],
            scratch.at[slot] if not rolling else scratch.at[slot, 0:rows_dma],
            sems.at[slot],
        )

    def dma_fresh(slot, bi, si):
        # Rolling mode, si > 0: only the s_blk NEW frame groups; the
        # FIR history lives in the bf16 ring from previous steps.
        start = (si * s_blk + n_taps - 1) * n1 + q8_of(bi)
        return pltpu.make_async_copy(
            frames_hbm.at[bi, pl.ds(start, fresh_dma), :],
            scratch.at[slot, 0:fresh_dma],
            sems.at[slot],
        )

    def dma_start(slot, bi, si):
        if not rolling:
            dma_full(slot, bi, si).start()
            return

        @pl.when(si == 0)
        def _():
            dma_full(slot, bi, si).start()

        @pl.when(si != 0)
        def _():
            dma_fresh(slot, bi, si).start()

    def dma_wait(slot, bi, si):
        if not rolling:
            dma_full(slot, bi, si).wait()
            return

        @pl.when(si == 0)
        def _():
            dma_full(slot, bi, si).wait()

        @pl.when(si != 0)
        def _():
            dma_fresh(slot, bi, si).wait()

    step = b * n_s + s
    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        dma_start(slot, b, s)

    ns_ = jax.lax.rem(s + 1, n_s)
    nb = b + jnp.where(s + 1 == n_s, 1, 0)
    is_last = step + 1 == pl.num_programs(0) * n_s

    @pl.when(jnp.logical_not(is_last))
    def _():
        dma_start(next_slot, nb, ns_)

    dma_wait(slot, b, s)

    if ablate == "dma":
        # Diagnostic stop (bench-only, via ``fengine_fused(_ablate=)``):
        # input DMA + output writes only — the stream floor.
        probe = scratch[slot][0 : n2 // 2, 0:n1].astype(outr_ref.dtype)
        for si in range(s_blk):
            outr_ref[0, si] = probe
            outi_ref[0, si] = probe
        return

    rot_c, rot_s = rotc_ref[0], rots_ref[0]
    d1c, d1s = dft1c_ref[:].astype(dft_dtype), dft1s_ref[:].astype(dft_dtype)
    # Row-stacked [cos; −sin] stage-B matrix: both halves of the complex
    # product come from ONE full-M dot per operand (2 dots of M=N2
    # instead of 4 of M=N2/2 — fewer MXU dispatches, full M tiles).
    d2 = dft2_ref[:].astype(dft_dtype)
    h = n2 // 2

    prec = (
        jax.lax.Precision.HIGHEST
        if dft_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dot(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32, precision=prec)

    def dot_t(w, a):
        # out[i, j] = Σ_c w[i, c] · a[j, c] — both contracted on the
        # minor axis (MXU-natural; output lands transposed).
        return jax.lax.dot_general(
            w,
            a,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # One int8→bf16 conversion per FRESH sample (int8 is exact in bf16).
    if rolling:
        # Rolling FIR history: aligned, converted frame groups persist
        # in the bf16 ring across grid steps — the sliding window's
        # ~(taps-1)/s_blk re-DMA/re-convert/re-align amplification
        # disappears; only the new groups are processed each step.
        @pl.when(s == 0)
        def _():
            raw = scratch[slot][0:rows_dma]
            if sref is not None:
                raw = _align_tile(raw, sref[b, 1], sref[b, 2])
            conv_full = (
                raw[0:rows].reshape(n_groups, n1, n2).astype(ring_dtype)
            )
            if slab:
                # Slab-major ring: slots stored transposed [N2, N1] so
                # the tap-outer chunk accumulator [per, N2, N1] reshapes
                # contiguously into the [per·N2, N1] stage-A operand —
                # no relayout copy (the copy that made plain tap_outer
                # measure neutral, ROADMAP round 4).
                conv_full = jnp.swapaxes(conv_full, 1, 2)
            if tap_outer:
                # Double-written ring: slot f also lives at f + G, so
                # any wrapped window of consecutive slabs is one
                # contiguous slice (the tap-outer FIR reads per-tap
                # [per] slab slices instead of per-si slabs).
                ring_ref[0:n_groups] = conv_full
                ring_ref[n_groups : 2 * n_groups] = conv_full
            else:
                ring_ref[...] = conv_full

        @pl.when(s != 0)
        def _():
            raw = scratch[slot][0:fresh_dma]
            if sref is not None:
                raw = _align_tile(raw, sref[b, 1], sref[b, 2])
            conv = (
                raw[0:fresh_rows]
                .reshape(s_blk, n1, n2)
                .astype(ring_dtype)
            )
            if slab:
                conv = jnp.swapaxes(conv, 1, 2)
            for j in range(s_blk):
                f = s * s_blk + (n_taps - 1) + j
                ring_ref[jax.lax.rem(f, n_groups)] = conv[j]
                if tap_outer:
                    ring_ref[jax.lax.rem(f, n_groups) + n_groups] = conv[j]

        def fir(si):
            f0 = s * s_blk + si
            acc = ring_ref[jax.lax.rem(f0, n_groups)] * wina_ref[0:n1]
            for tap in range(1, n_taps):
                acc = acc + (
                    ring_ref[jax.lax.rem(f0 + tap, n_groups)]
                    * wina_ref[tap * n1 : (tap + 1) * n1]
                )
            return acc

        def fir_chunk_to(buf, lo, hi):
            # Tap-outer FIR over a whole sub-block: one window slab
            # applied to ALL the chunk's spectra per tap (a broadcast
            # FMA), instead of re-streaming 16 window slabs per
            # spectrum — the window was the dominant VMEM traffic
            # (benchmarks/fir_probe.py: +33% FMA rate). Same f32
            # accumulation order per spectrum -> bit-exact vs fir().
            per_ = hi - lo
            f0 = s * s_blk + lo
            acc = None
            for tap in range(n_taps):
                q = jax.lax.rem(f0 + tap, n_groups)
                # [per, n1, n2] slabs; slab-major ring: [per, n2, n1].
                sl = ring_ref[pl.ds(q, per_)]
                if slab:
                    term = sl * wina_ref[tap * n2 : (tap + 1) * n2][None]
                else:
                    term = sl * wina_ref[tap * n1 : (tap + 1) * n1][None]
                acc = term if acc is None else acc + term
            if slab:
                # The collapse [per, N2, N1] → [per·N2, N1] is a free
                # (contiguous) reshape: the accumulator IS the stage-A
                # operand, slab-major.
                buf[:] = acc.reshape(per_ * n2, n1).astype(buf.dtype)
            else:
                for j in range(per_):
                    buf[:, j * n2 : (j + 1) * n2] = acc[j].astype(buf.dtype)

    else:
        raw = scratch[slot]
        if sref is not None:
            # In-kernel coarse delay: shift the tile by the sub-DMA
            # residual (row residual + lane shift); rows past `rows`
            # hold shifted-in garbage and are never read below.
            raw = _align_tile(raw, sref[b, 1], sref[b, 2])
        tile = raw.astype(jnp.bfloat16)

        def fir(si):
            # FIR: one [N1, N2] slab per tap, f32 accumulate (VPU).
            acc = tile[si * n1 : (si + 1) * n1] * wina_ref[0:n1]
            for tap in range(1, n_taps):
                acc = acc + (
                    tile[(si + tap) * n1 : (si + tap + 1) * n1]
                    * wina_ref[tap * n1 : (tap + 1) * n1]
                )
            return acc

    def epilogue(si, re, im):
        # Fine delay rotation + round-half-even int8 requant (the
        # requant gain is pre-folded into rot_c/rot_s by the wrapper).
        # ``quantise=False`` ships the rotated f32 planes — the
        # qualification path, where the int8 floor would mask the
        # filterbank's own leakage.
        if ablate == "stageb":
            # Diagnostic stop: skip the rotation/requant VPU epilogue.
            outr_ref[0, si] = re.astype(outr_ref.dtype)
            outi_ref[0, si] = im.astype(outi_ref.dtype)
            return
        outr = re * rot_c - im * rot_s
        outi = re * rot_s + im * rot_c
        if not quantise:
            outr_ref[0, si] = outr
            outi_ref[0, si] = outi
            return
        qr = jnp.clip(jnp.rint(outr), -127.0, 127.0)
        qi = jnp.clip(jnp.rint(outi), -127.0, 127.0)
        if flat_out:
            # Emit the spectrum as ONE [C] lane row: the in-VMEM
            # [rows, lanes] -> [C] flatten (row-major = channel order)
            # makes the kernel's HBM output the consumers' own
            # [batch, S, C] layout — no XLA relayout between the F
            # kernel and the B/X stages.
            flat = (n2 // 2) * n1
            outr_ref[0, si] = qr.astype(jnp.int8).reshape(flat)
            outi_ref[0, si] = qi.astype(jnp.int8).reshape(flat)
            return
        outr_ref[0, si] = qr.astype(jnp.int8)
        outi_ref[0, si] = qi.astype(jnp.int8)

    def stage_b(trd, tid):
        # Stacked stage B: yr rows [cos·tr; −sin·tr], yi likewise; the
        # complex combine is two row-half adds. Keeps k2 < N2/2.
        if b_fuse:
            # One double-width dot per spectrum ([N2,N2] against the
            # sublane-concat [2N1, N2]): halves the stage-B MXU
            # dispatch count and d2 weight re-streams. Identical
            # contraction per output element -> bit-exact.
            y = dot_t(d2, jnp.concatenate([trd, tid], axis=0))
            yr, yi = y[:, :n1], y[:, n1:]
        else:
            yr = dot_t(d2, trd)  # [N2, N1]
            yi = dot_t(d2, tid)
        return yr[:h] - yi[h:], yi[:h] + yr[h:]

    def stage_b_chunk(trd, tid, lo, hi, out_base=None):
        # ``ct_bfuse="chunk"``: ONE stage-B dot for the whole sub-block —
        # every spectrum's (tr, ti) pair row-stacked into a
        # [2·per·N1, N2] operand so the MXU sees a single
        # [N2,N2]x[2·per·N1,N2]^T dot instead of ``per`` serialised
        # per-si dots (the per-si stage-B -> epilogue alternation is the
        # measured non-FIR dependency floor, ROADMAP round 4). Identical
        # contraction per output element -> bit-exact vs stage_b().
        parts = []
        for si in range(lo, hi):
            s2 = slice((si - lo) * n2, (si - lo + 1) * n2)
            parts += [trd[:, s2], tid[:, s2]]
        y = dot_t(d2, jnp.concatenate(parts, axis=0))  # [N2, 2·per·N1]
        for si in range(lo, hi):
            q = 2 * (si - lo)
            yr = y[:, q * n1 : (q + 1) * n1]
            yi = y[:, (q + 1) * n1 : (q + 2) * n1]
            idx = si if out_base is None else out_base + si
            epilogue(idx, yr[:h] - yi[h:], yi[:h] + yr[h:])

    if batch_a:
        if kway and s_blk >= 2 * kway and s_blk % kway == 0:
            # Software-pipelined halves: issue half 0's stage-A dots
            # before half 1's FIR staging, so Mosaic can overlap the
            # long VPU FIR phase with the MXU stages of the other half
            # (the plain schedule serialises them — ROADMAP lever 3).
            # Same ops at the same rounding points, just reordered.
            # Each half stages into ITS OWN buffer: with one shared
            # buffer the interleaved half-slices force the scheduler to
            # reason about slice disjointness across the whole region
            # and the Mosaic compile detonates (~1030 s, round-2
            # ROADMAP); two disjoint refs compile like the plain
            # schedule.
            per = s_blk // kway

            def fir_chunk(buf, lo, hi):
                if tap_outer:
                    fir_chunk_to(buf, lo, hi)
                    return
                for si in range(lo, hi):
                    buf[:, (si - lo) * n2 : (si - lo + 1) * n2] = fir(
                        si
                    ).astype(buf.dtype)

            def head_chunk(buf, lo, hi):
                # Stage A dots + twiddle for the sub-block [lo, hi);
                # returns the stage-B operands (non-slab layout).
                sl = slice(lo * n2, hi * n2)
                accd = buf[:]
                ar, ai = dot(d1c, accd), dot(d1s, accd)
                tr = ar * twc_ref[:, sl] - ai * tws_ref[:, sl]
                ti = ar * tws_ref[:, sl] + ai * twc_ref[:, sl]
                return tr.astype(dft_dtype), ti.astype(dft_dtype)

            def btail_chunk(trd, tid, lo, hi, out_base=None):
                # Stage B + epilogue for the sub-block [lo, hi).
                if b_fuse == "chunk":
                    stage_b_chunk(trd, tid, lo, hi, out_base)
                    return
                for si in range(lo, hi):
                    s2 = slice((si - lo) * n2, (si - lo + 1) * n2)
                    re, im = stage_b(trd[:, s2], tid[:, s2])
                    idx = si if out_base is None else out_base + si
                    epilogue(idx, re, im)

            def tail_chunk(buf, lo, hi, out_base=None):
                # stage A dots + twiddle + per-si stage B/epilogue for
                # the sub-block [lo, hi). ``out_base`` offsets the
                # output spectra index (cross-block carry mode, where
                # the out window spans the whole batch).
                if ablate == "fir":
                    # Diagnostic stop: FIR staging only (needs n1 == n2).
                    for si in range(lo, hi):
                        s2 = slice((si - lo) * n2, (si - lo + 1) * n2)
                        v = buf[:, s2][0 : n2 // 2, 0:n1].astype(
                            outr_ref.dtype
                        )
                        outr_ref[0, si] = v
                        outi_ref[0, si] = v
                    return
                if slab:
                    # Slab-major: stage A contracts N1 on the MINOR axis
                    # of both operands ([per·N2, N1]·[N1out, N1] — the
                    # MXU-natural NT form, same as stage B's dot_t);
                    # twiddles arrive pre-transposed/tiled [per·N2, N1]
                    # and per-si stage B reads contiguous ROW slices.
                    accd = buf[:]  # [per·N2, N1]
                    ar, ai = dot_t(accd, d1c), dot_t(accd, d1s)
                    tr = ar * twc_ref[:] - ai * tws_ref[:]
                    ti = ar * tws_ref[:] + ai * twc_ref[:]
                    trd = tr.astype(dft_dtype)
                    tid = ti.astype(dft_dtype)
                    for si in range(lo, hi):
                        s2 = slice((si - lo) * n2, (si - lo + 1) * n2)
                        yr = dot(d2, trd[s2])  # [N2, N1]
                        yi = dot(d2, tid[s2])
                        re, im = yr[:h] - yi[h:], yi[:h] + yr[h:]
                        idx = si if out_base is None else out_base + si
                        epilogue(idx, re, im)
                    return
                trd, tid = head_chunk(buf, lo, hi)
                if ablate == "stagea":
                    # Diagnostic stop: skip stage B (needs n1 == n2).
                    for si in range(lo, hi):
                        s2 = slice((si - lo) * n2, (si - lo + 1) * n2)
                        outr_ref[0, si] = trd[:, s2][0 : n2 // 2, 0:n1].astype(
                            outr_ref.dtype
                        )
                        outi_ref[0, si] = tid[:, s2][0 : n2 // 2, 0:n1].astype(
                            outi_ref.dtype
                        )
                    return
                btail_chunk(trd, tid, lo, hi, out_base)

            if xpipe == "win":
                # Diagnostic variant: whole-batch window + base-indexed
                # stores with the ORIGINAL rotated schedule — isolates
                # the window/dynamic-store cost from the carry schedule.
                base = s * s_blk
                for j in range(kway):
                    fir_chunk(accbs[j], j * per, (j + 1) * per)
                    tail_chunk(accbs[j], j * per, (j + 1) * per, base)
                return

            if xpipe:
                # Cross-block carry: the LAST chunk's tail is deferred
                # into the next grid step, so every in-step tail has a
                # FIR chunk to overlap with AND the first FIR chunk of
                # each step overlaps the carried tail — the rotated
                # schedule below always leaves chunk k−1's tail exposed
                # at the end of every step (~1 tail-chunk/step of MXU
                # serialisation). The carry buffer is accbs[k−1], which
                # persists across grid steps like all Pallas scratch;
                # the carry never crosses a batch (the batch's last
                # block drains in-step), so the rotation planes and DMA
                # schedule are untouched. Requires the whole-batch
                # output window (out index map (b, s) → (b, 0)): the
                # carried tail writes spectra of block s−1.
                base = s * s_blk

                # Carried tail from the previous block, overlapping
                # this step's first FIR chunk (disjoint buffers). It
                # runs UNCONDITIONALLY: a pl.when region is a scheduling
                # barrier (Mosaic does not interleave across the branch),
                # which was measured to serialise the carried MXU work
                # against the FIR and cost ~10 ms/step at the flagship
                # config. At s == 0 the buffer holds stale data (or the
                # previous batch's drained block); its output goes to
                # the clamped index — block 0's chunk-(k−1) rows — and
                # is overwritten with the correct values one step later,
                # before the batch window ever flushes.
                carry_base = jnp.maximum(base - s_blk, 0)
                fir_chunk(accbs[0], 0, per)
                tail_chunk(
                    accbs[kway - 1], (kway - 1) * per, s_blk, carry_base
                )

                for j in range(1, kway):
                    fir_chunk(accbs[j], j * per, (j + 1) * per)
                    tail_chunk(accbs[j - 1], (j - 1) * per, j * per, base)

                # Batch's last block: drain the carry in-step (the one
                # remaining predicated region, 1/n_s of steps).
                @pl.when(s == n_s - 1)
                def _():
                    tail_chunk(
                        accbs[kway - 1], (kway - 1) * per, s_blk, base
                    )

                return

            if skew == "fine":
                # Fine interleave: chunk j+1's per-spectrum FIR slabs
                # (VPU) are issued BETWEEN chunk j's per-spectrum
                # stage-B dots (MXU), one si at a time — co-issue
                # material for an in-order scheduler whose window is
                # too small for the whole-chunk rotation. Same ops at
                # the same rounding points — bit-exact.
                fir_chunk(accbs[0], 0, per)
                for j in range(kway):
                    trd, tid = head_chunk(accbs[j], j * per, (j + 1) * per)
                    if j + 1 < kway:
                        nxt = accbs[j + 1]
                        for m in range(per):
                            nxt[:, m * n2 : (m + 1) * n2] = fir(
                                (j + 1) * per + m
                            ).astype(nxt.dtype)
                            s2 = slice(m * n2, (m + 1) * n2)
                            re, im = stage_b(trd[:, s2], tid[:, s2])
                            epilogue(j * per + m, re, im)
                    else:
                        btail_chunk(trd, tid, j * per, (j + 1) * per)
                return

            if skew:
                # Skewed schedule: chunk j's stage-B/epilogue is issued
                # AFTER chunk j+1's stage-A dots, so the MXU sees
                # A(j+1) then B(j) back-to-back (independent — no
                # dependency stall between them) and the VPU epilogue
                # of chunk j overlaps the MXU work of chunk j+1. Same
                # ops at the same rounding points, just reordered —
                # bit-exact vs the rotated schedule.
                pend = None
                for j in range(kway):
                    fir_chunk(accbs[j], j * per, (j + 1) * per)
                    trd, tid = head_chunk(accbs[j], j * per, (j + 1) * per)
                    if pend is not None:
                        btail_chunk(*pend)
                    pend = (trd, tid, j * per, (j + 1) * per)
                btail_chunk(*pend)
                return

            # Rotated k-way schedule: chunk j's MXU-heavy tail overlaps
            # chunk j+1's VPU-heavy FIR staging in hardware issue order.
            for j in range(kway):
                fir_chunk(accbs[j], j * per, (j + 1) * per)
                tail_chunk(accbs[j], j * per, (j + 1) * per)
            return
        if tap_outer:
            fir_chunk_to(accb_ref, 0, s_blk)
        else:
            for si in range(s_blk):
                accb_ref[:, si * n2 : (si + 1) * n2] = fir(si).astype(
                    accb_ref.dtype
                )
        # Stage A over the whole spectra block: 2 matmuls of
        # [N1, N1] @ [N1, s_blk·N2]; twiddles arrive pre-tiled.
        accd = accb_ref[:]
        ar, ai = dot(d1c, accd), dot(d1s, accd)  # [N1, s_blk·N2] f32
        tr = ar * twc_ref[:] - ai * tws_ref[:]
        ti = ar * tws_ref[:] + ai * twc_ref[:]
        trd, tid = tr.astype(dft_dtype), ti.astype(dft_dtype)
        for si in range(s_blk):
            sl = slice(si * n2, (si + 1) * n2)
            re, im = stage_b(trd[:, sl], tid[:, sl])
            epilogue(si, re, im)
        return

    for si in range(s_blk):
        accd = fir(si).astype(dft_dtype)

        # Stage A: contract the n1 (row) axis; real input, 2 dots.
        ar, ai = dot(d1c, accd), dot(d1s, accd)  # [N1, N2] f32

        # Inter-stage twiddle (tws holds −sin).
        tr = ar * twc_ref[:] - ai * tws_ref[:]
        ti = ar * tws_ref[:] + ai * twc_ref[:]
        trd, tid = tr.astype(dft_dtype), ti.astype(dft_dtype)

        # Stage B: contract n2, keep k2 < N2/2 → [N2/2, N1] plane.
        re, im = stage_b(trd, tid)
        epilogue(si, re, im)


def _rotation_planes(
    frac_delay,
    phase,
    lead,
    out_rows,
    out_lanes,
    *,
    n_channels,
    quant_scale,
    channel_offset,
    n_channels_total,
):
    """Fine-delay rotation planes ``(cos, sin)·quant_scale``, shape
    ``[*lead, out_rows, out_lanes]`` (ops/delay.py convention,
    coeff_generator.py:55-65)."""
    fd = jnp.broadcast_to(
        jnp.asarray(frac_delay, jnp.float32), tuple(lead)
    ).reshape(*lead, 1, 1)
    ph = jnp.broadcast_to(
        jnp.asarray(phase, jnp.float32), tuple(lead)
    ).reshape(*lead, 1, 1)
    k = (
        jnp.arange(n_channels, dtype=jnp.float32).reshape(out_rows, out_lanes)
        + channel_offset
    )
    rot = -jnp.pi * fd * (k - n_channels_total / 2.0) / n_channels_total + ph
    # Requant gain folded into the rotation planes: two fewer VPU
    # multiplies per output sample in the kernel epilogues.
    return jnp.cos(rot) * quant_scale, jnp.sin(rot) * quant_scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_channels",
        "quant_scale",
        "channel_offset",
        "n_channels_total",
    ),
)
def fine_rotation_planes(
    frac_delay: jax.Array,
    phase: jax.Array,
    *,
    n_channels: int,
    quant_scale: float,
    channel_offset: int = 0,
    n_channels_total: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Precompute the fused kernel's fine-delay rotation planes.

    Returns ``(rotc, rots)`` f32 ``[*lead, C/2-rows, lanes]`` planes for
    :func:`fengine_fused`'s ``rot_planes=`` input. Production engines
    call this on the delay-update path (the 256-accumulation cadence,
    BeamformerParameters.h:17) and feed the cached planes to every
    step. Measured NEUTRAL at the flagship config (XLA hoists the
    per-step recompute; f_diag nofd_* rows 2026-08-21) — kept because
    hoisting is production-correct and free. Bit-identical to the
    inline computation (same function).

    Only valid for geometries the direct-CT kernel takes (the production
    fast path); raises otherwise.
    """
    mode, n1, n2 = _deint_mode(n_channels)
    if mode != "ct":
        raise ValueError(
            "fine_rotation_planes covers the direct-CT kernel form only"
        )
    if n_channels_total is None:
        n_channels_total = n_channels
    lead = tuple(jnp.shape(frac_delay))
    return _rotation_planes(
        frac_delay, phase, lead, n2 // 2, n1,
        n_channels=n_channels, quant_scale=quant_scale,
        channel_offset=channel_offset, n_channels_total=n_channels_total,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_channels",
        "quant_scale",
        "channel_offset",
        "n_channels_total",
        "dft_dtype",
        "interpret",
        "s_blk",
        "deint",
        "ct_batch_a",
        "vmem_limit_mb",
        "n_spectra",
        "rolling",
        "ct_pipeline",
        "ct_xpipe",
        "quantise",
        "rolling_dtype",
        "fir_tapouter",
        "ct_bfuse",
        "ct_skew",
        "_ablate",
        "rowed",
        "planes_native",
        "flat_out",
    ),
)
def fengine_fused(
    frames: jax.Array,
    window: jax.Array,
    frac_delay: jax.Array,
    phase: jax.Array,
    *,
    n_channels: int,
    quant_scale: float,
    channel_offset: int = 0,
    n_channels_total: int | None = None,
    dft_dtype: str = "bfloat16",
    interpret: bool = False,
    s_blk: int | None = None,
    deint: str = "auto",
    ct_batch_a: bool = False,
    vmem_limit_mb: int | None = None,
    coarse_delays: jax.Array | None = None,
    n_spectra: int | None = None,
    rolling: bool = False,
    ct_pipeline: bool = False,
    ct_xpipe: bool = False,
    quantise: bool = True,
    rolling_dtype: str = "bfloat16",
    fir_tapouter: bool | str = False,
    ct_bfuse: bool | str = False,
    ct_skew: bool | str = False,
    _ablate: str | None = None,
    rot_planes: tuple[jax.Array, jax.Array] | None = None,
    rowed: bool = False,
    planes_native: bool = False,
    flat_out: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """FIR + rFFT + fine delay + int8 requant in one kernel.

    Parameters
    ----------
    frames:
        ``[..., n_frames, fft_size]`` int8 ADC frames (coarse-delay
        aligned; first ``n_taps − 1`` frames are FIR history).
    window:
        ``[n_taps, fft_size]`` float32 PFB prototype.
    frac_delay, phase:
        Per-batch fine-delay solution, shape = leading dims of ``frames``
        (e.g. ``[n_ants, n_pols]``).
    n_channels:
        Must equal ``fft_size // 2`` (the rfft keep-count).
    quant_scale:
        Requantisation gain (static).
    channel_offset / n_channels_total:
        Absolute-channel bookkeeping for channel-sharded engines
        (coeff_generator.py:49-53 convention); defaults single-engine.

    Returns
    -------
    ``(qr, qi)`` int8 ``[..., n_spectra, n_channels]`` planes.
    """
    n_taps, fft_size = window.shape
    assert n_channels == fft_size // 2
    n = fft_size // 2
    deint, n1, n2 = _deint_mode(n, deint)
    if rowed:
        # Wire-rowed input: the stream arrives ALREADY shaped
        # [..., rows, N2] — the kernel's own HBM view. The flat/4-d
        # forms below are logically equivalent but physically tiled
        # differently on TPU, so their in-step reshape materialises a
        # relayout COPY of the whole multi-GB stream every step
        # (measured +15.1 ms at the flagship config,
        # benchmarks/dma_bisect.py 2026-08-21: born-rowed 7.75 ms DMA
        # row vs 22.8/23.2 for 4-d/flat-born). Ingest paths upload
        # host bytes straight into this shape for free.
        if deint != "ct":
            raise ValueError("rowed input needs the direct-CT form")
        *lead, rows_in, n2f = frames.shape
        if n2f != n2:
            raise ValueError(
                f"rowed input minor dim must be N2={n2}, got {n2f}"
            )
        if coarse_delays is None:
            if rows_in % n1:
                raise ValueError("rowed input rows must be a multiple of N1")
            n_frames = rows_in // n1
            n_spectra = n_frames - n_taps + 1
            n_in = None
        else:
            if n_spectra is None:
                raise ValueError("coarse_delays requires n_spectra")
            n_in = rows_in * n2
            n_frames = n_spectra + n_taps - 1
    elif coarse_delays is None:
        *lead, n_frames, f = frames.shape
        assert f == fft_size
        n_spectra = n_frames - n_taps + 1
        n_in = None
    else:
        # In-kernel coarse delay: `frames` is the RAW per-batch sample
        # stream [..., n_in] with delay margin; the per-batch row offset
        # is applied at DMA time and the sub-row residual in VMEM
        # (_align_tile) — no XLA alignment pass, no aligned copy in HBM.
        if n_spectra is None:
            raise ValueError("coarse_delays requires n_spectra")
        *lead, n_in = frames.shape
        n_frames = n_spectra + n_taps - 1
    if n_channels_total is None:
        n_channels_total = n_channels
    if coarse_delays is not None and deint != "ct":
        raise ValueError("in-kernel coarse delay needs the direct-CT form")
    if rolling and deint != "ct":
        raise ValueError("the rolling FIR history needs the direct-CT form")
    # batch_a stages [N1, s_blk·N2] + stage-A temps in VMEM; s_blk=16
    # exceeds the 16 MB scoped-VMEM limit at 256×256 (measured), 8 fits
    # and beats the per-si schedule (+7% F-only, ROADMAP 2026-08-19).
    default_blk = 8 if ct_batch_a else _S_BLK_MAX
    s_blk = _pick_s_blk(n_spectra, s_blk or default_blk)
    pipe_k = (2 if ct_pipeline is True else int(ct_pipeline)) if ct_pipeline else 0
    if pipe_k and not (
        deint == "ct"
        and ct_batch_a
        and s_blk >= 2 * pipe_k
        and s_blk % pipe_k == 0
    ):
        # Loud, like the rolling/coarse gates: a caller flipping the
        # flag must not silently get the plain schedule.
        raise ValueError(
            "ct_pipeline needs the direct-CT form with ct_batch_a=True "
            f"and s_blk a multiple of k={pipe_k} with >= 2 spectra per "
            f"chunk (got deint={deint!r}, ct_batch_a={ct_batch_a}, "
            f"s_blk={s_blk})"
        )
    if ct_xpipe and pipe_k < 2:
        raise ValueError(
            "ct_xpipe (cross-block carry) extends the pipelined "
            "schedule; pass ct_pipeline with k >= 2 as well"
        )
    if not quantise and deint != "ct":
        raise ValueError(
            "quantise=False (f32 qualification output) needs the "
            "direct-CT kernel form"
        )
    if fir_tapouter and not (rolling and ct_batch_a and deint == "ct"):
        raise ValueError(
            "fir_tapouter needs the rolling batch-A direct-CT form"
        )
    slab = fir_tapouter == "slab"
    if slab and not pipe_k:
        raise ValueError(
            "fir_tapouter='slab' (slab-major stage A) needs the chunked "
            "ct_pipeline schedule"
        )
    if slab and ct_xpipe:
        raise ValueError("fir_tapouter='slab' does not compose with ct_xpipe")
    # Loud gates (repo convention: a caller flipping a knob must not
    # silently get the plain schedule).
    if ct_bfuse and deint != "ct":
        raise ValueError("ct_bfuse needs the direct-CT kernel form")
    if ct_bfuse and slab:
        raise ValueError(
            "ct_bfuse does not compose with fir_tapouter='slab' (the "
            "slab stage-B loop uses the plain dot)"
        )
    if ct_bfuse == "chunk" and pipe_k < 2:
        raise ValueError(
            "ct_bfuse='chunk' (whole-chunk stage-B dot) needs the "
            "chunked ct_pipeline schedule with k >= 2"
        )
    if ct_skew:
        if pipe_k < 2 or slab or ct_xpipe:
            raise ValueError(
                "ct_skew needs the chunked ct_pipeline schedule "
                "(k >= 2) and composes with neither fir_tapouter="
                "'slab' nor ct_xpipe"
            )
        if ct_skew == "fine" and (fir_tapouter or ct_bfuse == "chunk"):
            raise ValueError(
                "ct_skew='fine' (per-spectrum interleave) composes "
                "with neither fir_tapouter nor ct_bfuse='chunk'"
            )
    if rot_planes is not None and deint != "ct":
        raise ValueError(
            "rot_planes (cached fine-rotation planes) cover the "
            "direct-CT kernel form only"
        )
    if planes_native and deint != "ct":
        raise ValueError(
            "planes_native output covers the direct-CT kernel form only"
        )
    if flat_out:
        if deint != "ct" or not quantise or planes_native or ct_xpipe:
            raise ValueError(
                "flat_out (in-kernel [batch, S, C] emission) needs the "
                "quantised direct-CT form and composes with neither "
                "planes_native nor ct_xpipe"
            )
        if _ablate is not None:
            raise ValueError("flat_out does not compose with _ablate")
        if s_blk % 8:
            raise ValueError("flat_out needs s_blk % 8 == 0 (out tiling)")
        if n1 % 128:
            raise ValueError(
                "flat_out needs full-lane planes (out_lanes % 128 == 0; "
                "see flat_out_supported) — Mosaic's sublane->lane shape "
                "cast does not lower for narrow-lane geometries"
            )
    if _ablate is not None:
        # Bench-only diagnostic stops (benchmarks/f_diag.py): truncate
        # the kernel after a named stage so its marginal cost can be
        # measured AT the production schedule. Output values are
        # meaningless in these modes.
        if _ablate not in ("dma", "fir", "stagea", "stageb"):
            raise ValueError(f"unknown _ablate stage {_ablate!r}")
        if _ablate != "dma" and not (
            deint == "ct" and pipe_k >= 2 and ct_batch_a
            and not slab and not ct_skew and not ct_xpipe and n1 == n2
        ):
            raise ValueError(
                "_ablate stage stops need the plain chunked-pipeline "
                "direct-CT schedule with n1 == n2"
            )

    batch = 1
    for d in lead:
        batch *= d
    winf = window.astype(jnp.float32)

    # Per-batch fine-delay rotation planes, precomputed by XLA (cheap
    # elementwise; in-kernel cos/sin was half the kernel's runtime).
    # Output plane layout: k = k2·(lane count) + k1, i.e. a row-major
    # arange over [out_rows, out_lanes].
    out_rows, out_lanes = (n2 // 2, n1) if deint == "ct" else (n2, n1)
    if rot_planes is not None:
        # Caller-cached planes (fine_rotation_planes): delays change at
        # the 256-accumulation cadence, so production engines hoist the
        # plane computation to the delay-update path. Measured NEUTRAL
        # at the flagship config (f_diag nofd_* rows, 2026-08-21 — XLA
        # hoists/overlaps the recompute); kept because it is
        # production-correct and free.
        rotc, rots = rot_planes
        rotc = jnp.asarray(rotc, jnp.float32).reshape(
            batch, out_rows, out_lanes
        )
        rots = jnp.asarray(rots, jnp.float32).reshape(
            batch, out_rows, out_lanes
        )
    else:
        rotc, rots = _rotation_planes(
            frac_delay, phase, lead, out_rows, out_lanes,
            n_channels=n_channels, quant_scale=quant_scale,
            channel_offset=channel_offset,
            n_channels_total=n_channels_total,
        )
        rotc = rotc.reshape(batch, out_rows, out_lanes)
        rots = rots.reshape(batch, out_rows, out_lanes)
    rot_spec = pl.BlockSpec(
        (1, out_rows, out_lanes), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
    )

    rows = (s_blk + n_taps - 1) * n1
    grid = (batch, n_spectra // s_blk)
    if ct_xpipe and vmem_limit_mb is None:
        # The whole-batch output window (2 int8 planes, double-buffered
        # by the pipeline) exceeds Mosaic's default 16 MB scoped-VMEM
        # limit; size the limit to the windows plus a generous constant
        # for the DFT/twiddle constants, scratch and staging (~29 MB
        # measured at the flagship S=128 config).
        win_mb = (4 * n_spectra * out_rows * out_lanes) >> 20
        vmem_limit_mb = min(112, 48 + win_mb)
    out_specs = (
        pl.BlockSpec(
            (1, s_blk, out_rows, out_lanes),
            lambda b, s: (b, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ) * 2
    out_shape = (
        jax.ShapeDtypeStruct(
            (batch, n_spectra, out_rows, out_lanes),
            jnp.int8 if quantise else jnp.float32,
        ),
    ) * 2
    if flat_out:
        # Consumer-layout emission: [batch, S, C] int8, flattened in
        # VMEM per spectrum (see epilogue).
        out_specs = (
            pl.BlockSpec(
                (1, s_blk, n_channels),
                lambda b, s: (b, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ) * 2
        out_shape = (
            jax.ShapeDtypeStruct((batch, n_spectra, n_channels), jnp.int8),
        ) * 2
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=(
            vmem_limit_mb << 20 if vmem_limit_mb is not None else None
        ),
    )

    if deint == "ct":
        # Direct-CT constants: fft = n1·n2; d1 [N1,N1] over rows,
        # half-output d2 [N2/2, N2], twiddle [N1, N2] (trace-time numpy).
        scal = None
        pad = _coarse_pad_rows((s_blk + n_taps - 1) * n1)
        fresh_pad = _coarse_pad_rows(s_blk * n1)
        if coarse_delays is None:
            fr = frames.reshape(batch, n_frames * n1, n2)
        else:
            n_rows_total = n_in // n2
            need = n_frames * n1 + max(pad, fresh_pad)
            if n_rows_total < need:
                raise ValueError(
                    f"in-kernel coarse delay needs >= {need * n2} samples "
                    f"({(need - n_frames * n1) * n2} margin), got {n_in}"
                )
            if rowed:
                fr = frames.reshape(batch, n_rows_total, n2)
            else:
                if n_in % n2:
                    # The partial trailing row must be sliced off, and
                    # XLA materialises the slice as a copy of the WHOLE
                    # stream every step (~1.5 GB ≈ 4 ms at the flagship
                    # config) — see ingest_alignment(). Loud, because
                    # the copy is invisible in kernel-only profiles.
                    import warnings

                    warnings.warn(
                        f"ADC stream length {n_in} is not a multiple of "
                        f"N2={n2}; the pre-kernel slice copies the whole "
                        "stream each step. Provision margins per "
                        "ingest_alignment() to make this free.",
                        stacklevel=2,
                    )
                # Layout note: this reshape of a FLAT-born stream is a
                # whole-stream relayout copy on TPU (+15 ms flagship,
                # benchmarks/dma_bisect.py); pass rowed=True with a
                # born-[rows, N2] stream to make it free.
                fr = frames[..., : n_rows_total * n2].reshape(
                    batch, n_rows_total, n2
                )
            cd = jnp.broadcast_to(
                jnp.asarray(coarse_delays, jnp.int32), tuple(lead)
            ).reshape(batch)
            q_rows = cd // n2
            q8 = jnp.clip((q_rows // 8) * 8, 0, n_rows_total - need)
            scal = jnp.stack(
                [q8, jnp.clip(q_rows - q8, 0, 7), cd % n2], axis=1
            ).astype(jnp.int32)
        if slab:
            # Slab-major: window and twiddles pre-transposed so every
            # kernel-side operand is [·N2, N1]-shaped (see the slab
            # branches in _fengine_kernel_ct).
            wina = (
                winf.reshape(n_taps, n1, n2)
                .swapaxes(1, 2)
                .reshape(n_taps * n2, n1)
            )
        else:
            wina = winf.reshape(n_taps * n1, n2)
        k1 = np.arange(n1)
        k2h = np.arange(n2 // 2)
        nn2 = np.arange(n2)
        a1 = 2 * np.pi * np.outer(k1, k1) / n1
        a2 = 2 * np.pi * np.outer(k2h, nn2) / n2
        atw = 2 * np.pi * np.outer(k1, nn2) / fft_size
        twc, tws = np.cos(atw), -np.sin(atw)
        if slab:
            per_chunk = s_blk // pipe_k
            twc = np.tile(twc.T, (per_chunk, 1))  # [per·N2, N1]
            tws = np.tile(tws.T, (per_chunk, 1))
        elif ct_batch_a:
            # Stage A runs block-wide; tile the twiddles across s_blk.
            twc, tws = np.tile(twc, (1, s_blk)), np.tile(tws, (1, s_blk))
        # Stage-B [cos; −sin] row-stack: one full-M dot per operand.
        d2stack = np.concatenate([np.cos(a2), -np.sin(a2)], axis=0)
        consts = [
            jnp.asarray(c, jnp.float32)
            for c in (np.cos(a1), -np.sin(a1), d2stack, twc, tws)
        ]
        kernel = functools.partial(
            _fengine_kernel_ct,
            s_blk=s_blk,
            n_taps=n_taps,
            n1=n1,
            n2=n2,
            dft_dtype=jnp.dtype(dft_dtype),
            batch_a=ct_batch_a,
            coarse_pad=pad,
            rolling=rolling,
            fresh_pad=fresh_pad,
            pipeline=ct_pipeline,
            xpipe=ct_xpipe,
            quantise=quantise,
            ring_dtype=jnp.dtype(rolling_dtype),
            tap_outer=bool(fir_tapouter),
            slab=slab,
            b_fuse=ct_bfuse,
            skew=ct_skew,
            ablate=_ablate,
            flat_out=flat_out,
        )
        if ct_xpipe:
            # Whole-batch output window: the cross-block carried tail
            # writes spectra of block s−1, so the out block spans all
            # n_spectra of the batch (consecutive revisits over s; one
            # flush per batch — the same HBM bytes, batched).
            out_specs = (
                pl.BlockSpec(
                    (1, n_spectra, out_rows, out_lanes),
                    lambda b, s: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ) * 2
        scratch_rows = rows + (pad if scal is not None else 0)
        scratch_shapes = [pltpu.VMEM((2, scratch_rows, n2), jnp.int8)]
        if rolling:
            # f32 ring: conversion paid once per fresh sample instead of
            # on every tap read (the FIR reads each slot up to n_taps
            # times across grid steps); costs 2x the ring VMEM.
            # Tap-outer FIR doubles the ring (slot f also at f+G) so
            # wrapped windows are contiguous slices.
            ring_groups = (2 if fir_tapouter else 1) * (s_blk + n_taps - 1)
            ring_slab = (n2, n1) if slab else (n1, n2)
            scratch_shapes.append(
                pltpu.VMEM(
                    (ring_groups, *ring_slab), jnp.dtype(rolling_dtype)
                )
            )
        if ct_batch_a:
            if pipe_k:
                # k disjoint sub-block staging buffers (see the pipeline
                # branch in _fengine_kernel_ct; disjoint refs keep the
                # Mosaic schedule sane).
                for _ in range(pipe_k):
                    chunk = s_blk // pipe_k
                    scratch_shapes.append(
                        pltpu.VMEM(
                            (chunk * n2, n1) if slab else (n1, chunk * n2),
                            jnp.dtype(dft_dtype),
                        )
                    )
            else:
                scratch_shapes.append(
                    pltpu.VMEM((n1, s_blk * n2), jnp.dtype(dft_dtype))
                )
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
        if scal is None:
            const_specs = [
                pl.BlockSpec(
                    c.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM
                )
                for c in consts
            ]
            qr, qi = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        wina.shape,
                        lambda b, s: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    *const_specs,
                    rot_spec,
                    rot_spec,
                ],
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                compiler_params=compiler_params,
                interpret=interpret,
            )(fr, wina, *consts, rotc, rots)
        else:
            # Scalar-prefetched per-batch coarse offsets; index maps gain
            # the trailing scalar-ref argument.
            def kernel_coarse(sref, *args):
                kernel(*args, sref=sref)

            rot_spec3 = pl.BlockSpec(
                (1, out_rows, out_lanes),
                lambda b, s, sr: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(
                        wina.shape,
                        lambda b, s, sr: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    *[
                        pl.BlockSpec(
                            c.shape,
                            lambda b, s, sr: (0, 0),
                            memory_space=pltpu.VMEM,
                        )
                        for c in consts
                    ],
                    rot_spec3,
                    rot_spec3,
                ],
                out_specs=(
                    (
                        pl.BlockSpec(
                            (1, n_spectra, out_rows, out_lanes),
                            lambda b, s, sr: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ) * 2
                    if ct_xpipe
                    else (
                        pl.BlockSpec(
                            (1, s_blk, n_channels),
                            lambda b, s, sr: (b, s, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ) * 2
                    if flat_out
                    else (
                        pl.BlockSpec(
                            (1, s_blk, out_rows, out_lanes),
                            lambda b, s, sr: (b, s, 0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ) * 2
                ),
                scratch_shapes=scratch_shapes,
            )
            qr, qi = pl.pallas_call(
                kernel_coarse,
                grid_spec=grid_spec,
                out_shape=out_shape,
                compiler_params=compiler_params,
                interpret=interpret,
            )(scal, fr, wina, *consts, rotc, rots)
        if planes_native:
            # Keep the kernel's own [*, S, N2/2, N1] plane layout
            # (channel k = row·N1 + lane, row-major): the trailing
            # [out_rows, out_lanes] -> [C] merge below is a TPU tiled-
            # layout change, i.e. a relayout COPY of both multi-GB
            # planes every step when a Pallas consumer reads the merged
            # form. Native-handoff consumers (ops/corner_turn.py 5-d
            # path) slice this layout directly.
            shape5 = (*lead, n_spectra, out_rows, out_lanes)
            return qr.reshape(shape5), qi.reshape(shape5)
        shape = (*lead, n_spectra, n_channels)
        return qr.reshape(shape), qi.reshape(shape)

    if deint == "bitcast":
        # Little-endian pair bitcast: low byte = even sample (a layout
        # no-op in XLA); the kernel splits the streams with VPU shifts.
        fr = jax.lax.bitcast_convert_type(
            frames.reshape(batch, n_frames, n, 2), jnp.int16
        ).reshape(batch, n_frames * n1, n2)
        wina = winf[:, 0::2].reshape(n_taps * n1, n2)
        winb = winf[:, 1::2].reshape(n_taps * n1, n2)
    else:
        fr = frames.reshape(batch, n_frames * n1, 2 * n2)
        wina = winf.reshape(n_taps * n1, 2 * n2)

    # DFT / twiddle / untangle constants (trace-time numpy; XLA folds).
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    a1 = 2 * np.pi * np.outer(k1, k1) / n1
    a2 = 2 * np.pi * np.outer(k2, k2) / n2
    atw = 2 * np.pi * np.outer(k1, k2) / n
    kk = (k2[:, None] * n1 + k1[None, :]).astype(np.float64)
    aun = np.pi * kk / n
    if deint != "bitcast":
        sel = np.zeros((2 * n2, 2 * n2))
        sel[2 * k2, k2] = 1.0  # even lanes -> [:N2]
        sel[2 * k2 + 1, n2 + k2] = 1.0  # odd lanes -> [N2:]
        winb = jnp.asarray(sel, jnp.float32)
    consts = [
        np.cos(a1), -np.sin(a1),
        np.cos(a2), -np.sin(a2),
        # twiddles pre-tiled across the spectra block (stage A is batched)
        np.tile(np.cos(atw), (1, s_blk)), np.tile(-np.sin(atw), (1, s_blk)),
        np.cos(aun), -np.sin(aun),
    ]
    consts = [jnp.asarray(c, jnp.float32) for c in consts]

    const_specs = [
        pl.BlockSpec(c.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    qr, qi = pl.pallas_call(
        functools.partial(
            _fengine_kernel,
            s_blk=s_blk,
            n_taps=n_taps,
            n1=n1,
            n2=n2,
            dft_dtype=jnp.dtype(dft_dtype),
            deint=deint,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                wina.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                winb.shape, lambda b, s: (0, 0), memory_space=pltpu.VMEM
            ),
            *const_specs,
            rot_spec,
            rot_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, rows, fr.shape[-1]), fr.dtype),
            pltpu.VMEM((n1, s_blk * n2), jnp.dtype(dft_dtype)),
            pltpu.VMEM((n1, s_blk * n2), jnp.dtype(dft_dtype)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(fr, wina, winb, *consts, rotc, rots)
    shape = (*lead, n_spectra, n_channels)
    return qr.reshape(shape), qi.reshape(shape)
