"""Fused Pallas F-engine kernel vs the composed-op chain (interpret mode).

The kernel (ops/fengine_pallas.py) fuses FIR + rFFT + fine delay + int8
requant; these tests pin it against the already-golden-validated composed
path (pfb_channelise → apply_fine_delay → requantise) on the CPU
interpreter, plus the channelisation acceptance spec
(bdd_experiment/test/features/channelisation.feature:5-9) for the bf16
DFT mode. On-hardware parity runs in tests/tpu/.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay
from dpdk_dc_sand_tpu.ops.fengine_pallas import (
    fengine_fused,
    fused_supported,
)
from dpdk_dc_sand_tpu.ops.pfb import default_window, pfb_channelise
from dpdk_dc_sand_tpu.ops.requant import requantise

A, P, TAPS, F, S = 3, 2, 8, 1024, 16
C = F // 2
SCALE = 1 / 16


def _inputs(seed=2021, f=F):
    rng = np.random.default_rng(seed)
    n_frames = S + TAPS - 1
    frames = rng.integers(-64, 64, size=(A, P, n_frames, f), dtype=np.int8)
    fd = rng.uniform(-0.5, 0.5, (A, P)).astype(np.float32)
    ph = rng.uniform(-1, 1, (A, P)).astype(np.float32)
    return frames, fd, ph


def _reference(frames, fd, ph):
    f = frames.shape[-1]
    samples = jnp.asarray(frames).reshape(A, P, -1)
    spec = pfb_channelise(samples, default_window(TAPS, f), n_channels=f // 2,
                          use_pallas=False)
    re, im = apply_fine_delay(
        jnp.real(spec), jnp.imag(spec), fd, ph, n_channels=f // 2
    )
    return np.asarray(requantise(re, SCALE)), np.asarray(requantise(im, SCALE))


# (f, deint) tuples: the direct-CT kernel (the default where viable),
# the even/odd selection-matmul DIT variant, and the int16-bitcast DIT
# variant, which needs fft >= 2048 for its 128-lane int16 view
# (ops/fengine_pallas._deint_mode).
MODES = [
    pytest.param(1024, "auto", id="ct"),
    pytest.param(1024, "matmul", id="matmul"),
    pytest.param(2048, "bitcast", id="bitcast"),
]


def test_supported_shapes():
    assert fused_supported((A, P, S + TAPS - 1, F), TAPS, C)
    assert not fused_supported((A, P, S + TAPS - 1, F), TAPS, C // 2)
    assert not fused_supported((A, P, S + TAPS - 1, 192), TAPS, 96)
    assert not fused_supported((A, P, S + TAPS - 1, 256), TAPS, 128)


@pytest.mark.parametrize("f,deint", MODES)
def test_fused_f32_matches_composed_ops(f, deint):
    """f32 DFT vs XLA FFT: same int8 codes except requant ties.

    The two are different exact-arithmetic factorisations of the same
    transform; f32 rounding can land an output on an int8 rounding
    boundary, so allow ±1 code on a vanishing fraction of elements
    (zero at F=1024, 1/98304 at F=2048).
    """
    frames, fd, ph = _inputs(f=f)
    qr_ref, qi_ref = _reference(frames, fd, ph)
    qr, qi = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, f), jnp.asarray(fd),
        jnp.asarray(ph), n_channels=f // 2, quant_scale=SCALE,
        dft_dtype="float32", interpret=True, deint=deint,
    )
    for got, ref in ((qr, qr_ref), (qi, qi_ref)):
        d = np.abs(np.asarray(got, np.int32) - ref.astype(np.int32))
        assert d.max() <= 1
        assert (d != 0).mean() <= 1e-4


@pytest.mark.parametrize("f,deint", MODES)
def test_fused_bf16_within_one_code(f, deint):
    frames, fd, ph = _inputs(7, f=f)
    qr_ref, qi_ref = _reference(frames, fd, ph)
    qr, qi = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, f), jnp.asarray(fd),
        jnp.asarray(ph), n_channels=f // 2, quant_scale=SCALE,
        dft_dtype="bfloat16", interpret=True, deint=deint,
    )
    dr = np.abs(np.asarray(qr, np.int32) - qr_ref.astype(np.int32))
    di = np.abs(np.asarray(qi, np.int32) - qi_ref.astype(np.int32))
    assert dr.max() <= 1 and di.max() <= 1
    assert (dr != 0).mean() < 0.25 and (di != 0).mean() < 0.25


def test_channel_offset_matches_sharded_fine_delay():
    """xeng-style absolute-channel offsets shift the phase ramp."""
    frames, fd, ph = _inputs(11)
    off = C  # pretend this engine owns the second half of a 2C band
    samples = jnp.asarray(frames).reshape(A, P, -1)
    spec = pfb_channelise(samples, default_window(TAPS, F), n_channels=C,
                          use_pallas=False)
    re, im = apply_fine_delay(
        jnp.real(spec), jnp.imag(spec), fd, ph,
        n_channels=2 * C, channel_offset=off,
    )
    qr_ref = np.asarray(requantise(re, SCALE))
    qr, _ = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), n_channels=C, quant_scale=SCALE,
        channel_offset=off, n_channels_total=2 * C,
        dft_dtype="float32", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(qr), qr_ref)


@pytest.mark.parametrize("dft_dtype", ["float32", "bfloat16"])
def test_tone_leakage_no_worse_than_composed_path(dft_dtype):
    """CW tone: peak centred; leakage no worse than the XLA int8 chain.

    The −62 dB channelisation acceptance spec is verified on the f32
    qualification path (tests/qualification, measured ≈ −80 dB); an int8
    output floors at ≈ −53 dB per-bin regardless of the FFT, so here we
    pin that the fused kernel's DFT rounding adds no leakage over the
    composed path's own int8 floor (they share the requant contract).
    """
    k0 = 100
    n_frames = S + TAPS - 1
    n = n_frames * F
    t = np.arange(n)
    tone = np.clip(
        np.round(100 * np.cos(2 * np.pi * k0 * t / F)), -127, 127
    ).astype(np.int8)
    frames = np.broadcast_to(tone, (1, 1, n)).reshape(1, 1, n_frames, F)
    zero = jnp.zeros((1, 1), jnp.float32)

    # Scale the requant so the tone peak sits near (not over) full scale.
    spec = pfb_channelise(
        jnp.asarray(frames).reshape(1, 1, -1), default_window(TAPS, F),
        n_channels=C, use_pallas=False,
    )
    peak_mag = float(jnp.abs(spec).max())
    scale = 120.0 / peak_mag

    def power_db(qr, qi):
        power = (
            np.asarray(qr, np.float64) ** 2 + np.asarray(qi, np.float64) ** 2
        ).mean(axis=(0, 1, 2))
        assert power.argmax() == k0
        others = np.delete(power, [k0 - 1, k0, k0 + 1])
        return 10 * np.log10(max(others.max(), 1e-300) / power[k0])

    ref_db = power_db(
        requantise(jnp.real(spec), scale), requantise(jnp.imag(spec), scale)
    )
    qr, qi = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), zero, zero,
        n_channels=C, quant_scale=scale, dft_dtype=dft_dtype,
        interpret=True,
    )
    got_db = power_db(qr, qi)
    assert got_db <= max(ref_db + 3.0, -45.0), (got_db, ref_db)


def test_ct_batch_a_matches_default_ct():
    """Batched-stage-A ct schedule == per-si ct schedule, same codes.

    Same math at the same rounding points (the staging write is the
    ``accd`` cast), so the int8 outputs must agree exactly.
    """
    frames, fd, ph = _inputs(13)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct",
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    batched = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), ct_batch_a=True, **kw,
    )
    for got, ref in zip(batched, base):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("batch_a", [False, True], ids=["persi", "batcha"])
@pytest.mark.parametrize("coarse", [False, True], ids=["aligned", "ckernel"])
def test_rolling_history_matches_nonrolling(batch_a, coarse):
    """Rolling bf16 FIR-history ring == the full re-DMA schedule, exactly.

    Both paths convert every frame group to bf16 before the FIR (int8 is
    exact in bf16), so persisting history groups in a VMEM ring across
    grid steps must not change a single int8 output code — in every
    schedule (per-si / batch-A) and with the coarse delay folded into
    the kernel DMA or pre-aligned by the caller.
    """
    from dpdk_dc_sand_tpu.ops.fengine_pallas import coarse_margin_samples

    frames, fd, ph = _inputs(17)
    win = default_window(TAPS, F)
    common = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, ct_batch_a=batch_a, deint="ct",
    )
    if coarse:
        rng = np.random.default_rng(23)
        margin = coarse_margin_samples(F, TAPS, S, batch_a)
        assert margin is not None
        max_d = 96
        n_in = (S + TAPS - 1) * F + margin + max_d
        raw = rng.integers(-64, 64, size=(A, P, n_in), dtype=np.int8)
        cd = rng.integers(0, max_d, size=(A, P)).astype(np.int32)
        args = (jnp.asarray(raw), win, jnp.asarray(fd), jnp.asarray(ph))
        kw = dict(coarse_delays=jnp.asarray(cd), n_spectra=S, **common)
    else:
        args = (jnp.asarray(frames), win, jnp.asarray(fd), jnp.asarray(ph))
        kw = common
    base = fengine_fused(*args, **kw)
    rolled = fengine_fused(*args, rolling=True, **kw)
    for got, ref in zip(rolled, base):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ct_pipeline_matches_plain_batch_a():
    """Software-pipelined half-block batch-A schedule == plain batch-A.

    Identical ops at identical rounding points, only the program order
    differs (half 1's FIR staging is issued between half 0's MXU stages
    so the units can overlap) — the int8 codes must agree exactly.
    """
    frames, fd, ph = _inputs(29)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    piped = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), ct_pipeline=True, rolling=True, **kw,
    )
    for got, ref in zip(piped, base):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_slab_major_tapouter_matches_pipelined():
    """Slab-major tap-outer FIR (ring slabs stored transposed, stage A
    contracting the minor axis of the [per·N2, N1] accumulator) is the
    same math at the same rounding points as the pipelined schedule —
    the int8 codes must agree exactly."""
    frames, fd, ph = _inputs(31)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True, rolling=True,
        ct_pipeline=2,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    slab = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), fir_tapouter="slab", **kw,
    )
    for got, ref in zip(slab, base):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bfuse_stage_b_matches_pipelined():
    """ct_bfuse (each spectrum's two stage-B dots fused into one
    double-width dot over the sublane-concat [2N1, N2] operand) is the
    identical contraction per output element — exact equality."""
    frames, fd, ph = _inputs(37)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True, rolling=True,
        ct_pipeline=2,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    fused = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), ct_bfuse=True, **kw,
    )
    for got, ref in zip(fused, base):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bchunk_and_skew_match_pipelined():
    """Round-5 floor-attack schedules — ``ct_bfuse="chunk"`` (the whole
    sub-block's stage-B pairs row-stacked into ONE fat MXU dot) and
    ``ct_skew`` (chunk j's stage-B issued after chunk j+1's stage-A) —
    are the identical contraction per output element in a different
    program order: the int8 codes must agree exactly."""
    frames, fd, ph = _inputs(41)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True, rolling=True,
        ct_pipeline=2,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    for extra in (
        dict(ct_bfuse="chunk"),
        dict(ct_skew=True),
        dict(ct_bfuse="chunk", ct_skew=True),
        dict(ct_skew="fine"),
    ):
        got = fengine_fused(
            jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
            jnp.asarray(ph), **kw, **extra,
        )
        for g, ref in zip(got, base):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


def test_bfuse_and_skew_gates_are_loud():
    """A knob that cannot take effect must raise, not silently fall back
    to the plain schedule (repo convention; ADVICE round 4)."""
    frames, fd, ph = _inputs(43)
    args = (
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph),
    )
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True,
    )
    import pytest

    # ct_bfuse='chunk' without the chunked pipeline
    with pytest.raises(ValueError, match="ct_bfuse='chunk'"):
        fengine_fused(*args, deint="ct", ct_batch_a=True, ct_bfuse="chunk", **kw)
    # ct_skew without the chunked pipeline
    with pytest.raises(ValueError, match="ct_skew"):
        fengine_fused(*args, deint="ct", ct_batch_a=True, ct_skew=True, **kw)
    # ct_bfuse on the slab schedule (stage-B pair fusion would be
    # silently dropped by the slab per-si loop)
    with pytest.raises(ValueError, match="slab"):
        fengine_fused(
            *args, deint="ct", ct_batch_a=True, rolling=True,
            ct_pipeline=2, fir_tapouter="slab", ct_bfuse=True, **kw,
        )


def test_rowed_input_matches_flat():
    """Wire-rowed input ([..., rows, N2], the kernel's own HBM view) is
    the same bytes in the layout the kernel DMAs — bit-identical to the
    flat/4-d forms, minus the per-step whole-stream relayout copy those
    forms pay on TPU (measured −25.7 ms at the flagship config,
    benchmarks/dma_bisect.py + f_diag rowed rows, 2026-08-21)."""
    from dpdk_dc_sand_tpu.ops.fengine_pallas import _deint_mode

    _, n1, n2 = _deint_mode(C)
    frames, fd, ph = _inputs(47)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True, rolling=True,
        ct_pipeline=2,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    a, p = frames.shape[:2]
    rowed = fengine_fused(
        jnp.asarray(frames.reshape(a, p, -1, n2)), default_window(TAPS, F),
        jnp.asarray(fd), jnp.asarray(ph), rowed=True, **kw,
    )
    for got, ref in zip(rowed, base):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # coarse path: flat stream vs born-rowed stream
    rng = np.random.default_rng(49)
    margin = 8192
    n_in = (S + TAPS - 1) * F + margin
    raw = rng.integers(-64, 64, (a, p, n_in), dtype=np.int8)
    cd = rng.integers(0, 512, (a, p)).astype(np.int32)
    ckw = dict(coarse_delays=jnp.asarray(cd), n_spectra=S, **kw)
    ref = fengine_fused(
        jnp.asarray(raw), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **ckw,
    )
    got = fengine_fused(
        jnp.asarray(raw.reshape(a, p, -1, n2)), default_window(TAPS, F),
        jnp.asarray(fd), jnp.asarray(ph), rowed=True, **ckw,
    )
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_flat_out_matches_planes():
    """flat_out (the kernel flattening each spectrum's [rows, lanes]
    plane in VMEM so HBM holds the consumers' [batch, S, C] layout) is
    bit-identical to the plane output — the flatten is the row-major
    channel order by construction. Needs a full-lane geometry
    (flat_out_supported: out_lanes % 128 == 0 — the module's C=512 has
    8-lane planes, which Mosaic's shape cast rejects on chip)."""
    from dpdk_dc_sand_tpu.ops.fengine_pallas import flat_out_supported

    c, f, taps, s = 8192, 16384, 4, 16
    assert flat_out_supported(c) and not flat_out_supported(C)
    rng = np.random.default_rng(59)
    frames = rng.integers(-64, 64, (2, 2, s + taps - 1, f), dtype=np.int8)
    fd = rng.uniform(-0.5, 0.5, (2, 2)).astype(np.float32)
    ph = (-np.pi * fd / 2).astype(np.float32)
    kw = dict(
        n_channels=c, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True, rolling=True,
        ct_pipeline=2,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(taps, f), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    got = fengine_fused(
        jnp.asarray(frames), default_window(taps, f), jnp.asarray(fd),
        jnp.asarray(ph), flat_out=True, **kw,
    )
    for g, r in zip(got, base):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    import pytest

    with pytest.raises(ValueError, match="flat_out"):
        fengine_fused(
            jnp.asarray(frames), default_window(taps, f), jnp.asarray(fd),
            jnp.asarray(ph), flat_out=True, quantise=False, **kw,
        )
    # narrow-lane geometry: loud gate, not a silent fallback
    nf = _inputs(61)[0]
    with pytest.raises(ValueError, match="full-lane"):
        fengine_fused(
            jnp.asarray(nf), default_window(TAPS, F),
            jnp.zeros((A, P), jnp.float32), jnp.zeros((A, P), jnp.float32),
            n_channels=C, quant_scale=SCALE, interpret=True, deint="ct",
            ct_batch_a=True, flat_out=True,
        )


def test_cached_rot_planes_match_inline():
    """fine_rotation_planes fed back via rot_planes= is bit-identical to
    the inline per-step computation (same function, hoisted to the
    delay-update cadence)."""
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fine_rotation_planes

    frames, fd, ph = _inputs(53)
    kw = dict(
        n_channels=C, quant_scale=SCALE, dft_dtype="bfloat16",
        interpret=True, deint="ct", ct_batch_a=True,
    )
    base = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), **kw,
    )
    planes = fine_rotation_planes(
        jnp.asarray(fd), jnp.asarray(ph), n_channels=C, quant_scale=SCALE
    )
    got = fengine_fused(
        jnp.asarray(frames), default_window(TAPS, F), jnp.asarray(fd),
        jnp.asarray(ph), rot_planes=planes, **kw,
    )
    for g, r in zip(got, base):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_unquantised_f32_output_matches_composed_path():
    """quantise=False (the qualification output mode) ships the rotated
    f32 planes — must equal the composed XLA chain before requant."""
    rng = np.random.default_rng(7)
    n_frames = S + TAPS - 1
    frames = rng.integers(-64, 64, (1, 1, n_frames, F), dtype=np.int8)
    w = default_window(TAPS, F)
    zero = jnp.zeros((1, 1), jnp.float32)
    fr, fi = fengine_fused(
        jnp.asarray(frames), w, zero, zero, n_channels=C, quant_scale=1.0,
        dft_dtype="float32", quantise=False, interpret=True,
    )
    assert np.asarray(fr).dtype == np.float32
    spec = pfb_channelise(
        jnp.asarray(frames).reshape(1, 1, -1), w, n_channels=C,
        use_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(fr)[0, 0], np.asarray(jnp.real(spec))[0, 0],
        rtol=1e-4, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(fi)[0, 0], np.asarray(jnp.imag(spec))[0, 0],
        rtol=1e-4, atol=1e-2,
    )
