"""Op parity on the real TPU (small shapes, device-side reductions).

Device→host pulls are limited to scalars/small arrays — large pulls take
minutes through the relay (see .claude/skills/verify/SKILL.md).
"""

import numpy as np
import pytest

from dpdk_dc_sand_tpu import golden, ops
from dpdk_dc_sand_tpu.config import ArrayConfig

RNG = np.random.default_rng(seed=2021)
CFG = ArrayConfig(n_ants=8, n_channels=256, n_beams=4)


def max_err(device_arr, host_ref):
    """|device − host| max computed ON DEVICE, one scalar pulled."""
    import jax.numpy as jnp

    return float(jnp.max(jnp.abs(device_arr - jnp.asarray(host_ref))))


def test_reorder_exact_on_tpu():
    samples = RNG.integers(-128, 127, size=CFG.ingest_shape, dtype=np.int8)
    got = ops.prebeamform_reorder(samples)
    assert max_err(got.astype("float32"), golden.reorder(samples).astype(np.float32)) == 0.0


def test_coeffs_on_tpu():
    dv = np.zeros(CFG.delay_vals_shape, np.float32)
    dv[..., 0] = RNG.uniform(0, 5e-9, dv.shape[:-1])
    dv[..., 2] = RNG.uniform(-np.pi, np.pi, dv.shape[:-1])
    cos, sin = ops.steering_coeffs(
        dv,
        n_channels=CFG.n_channels,
        n_channels_per_stream=CFG.n_channels_per_stream,
        sample_period=CFG.sample_period,
    )
    w = golden.steering_coeffs_complex(dv, CFG.n_channels, CFG.sample_period)
    assert max_err(cos, w.real.astype(np.float32)) < 1e-4
    assert max_err(sin, w.imag.astype(np.float32)) < 1e-4


def test_beamform_reference_tolerance_on_tpu():
    samples = RNG.integers(-128, 127, size=CFG.ingest_shape, dtype=np.int8)
    reordered = golden.reorder(samples)
    dv = np.zeros(CFG.delay_vals_shape, np.float32)
    dv[..., 0] = RNG.uniform(0, 5e-9, dv.shape[:-1])
    dv[..., 2] = RNG.uniform(-np.pi, np.pi, dv.shape[:-1])
    coeffs = golden.steering_coeffs_matrix(
        dv, CFG.n_batches, CFG.n_pols, CFG.n_channels, CFG.sample_period
    )
    got = ops.beamform_matrix(reordered, coeffs)
    want = golden.beamform(reordered, coeffs)
    # reference tolerance rtol=atol=1e-4 scaled by magnitude
    assert max_err(got, want) <= 1e-4 * max(1.0, np.abs(want).max())


def test_pfb_pallas_kernel_on_tpu():
    n_taps, fft = 8, 512
    window = np.asarray(golden.pfb_window(n_taps, fft))
    x = RNG.integers(-64, 64, size=(2, (16 + n_taps - 1) * fft), dtype=np.int8)
    got = ops.pfb_fir(x, window, use_pallas=True)
    want = golden.pfb_fir(x.astype(np.float32), window)
    assert max_err(got, want) < 1e-3


def test_fft_and_fine_delay_on_tpu():
    n_taps, n_channels = 8, 128
    window = np.asarray(golden.pfb_window(n_taps, 2 * n_channels))
    k = 37
    n = np.arange((8 + n_taps - 1) * 2 * n_channels)
    x = (80 * np.cos(2 * np.pi * k * n / (2 * n_channels))).astype(np.float32)
    got = ops.pfb_channelise(x, window)
    import jax.numpy as jnp

    power = jnp.abs(got[4]) ** 2
    assert int(jnp.argmax(power)) == k


def test_requantise_exact_on_tpu():
    x = RNG.normal(scale=100, size=(256, 128)).astype(np.float32)
    got = ops.requantise(x, 0.5)
    want = golden.requantise(x, 0.5)
    assert max_err(got.astype("float32"), want.astype(np.float32)) == 0.0


def test_correlator_physics_on_tpu():
    import jax.numpy as jnp

    x = RNG.integers(-100, 100, size=(16, 64, 8, 2), dtype=np.int8)
    vre, vim = ops.correlate(x)
    assert float(jnp.abs(vre - jnp.swapaxes(vre, 1, 2)).max()) == 0.0
    assert float(jnp.abs(vim + jnp.swapaxes(vim, 1, 2)).max()) == 0.0


def test_fused_pipeline_runs_on_tpu():
    from dpdk_dc_sand_tpu.models import FBEngine

    cfg = ArrayConfig(n_ants=4, n_channels=256, n_beams=4, n_taps=8)
    fb = FBEngine(cfg, n_spectra=16)
    adc, cd, fd, ph, dv = fb.example_inputs()
    out = fb(adc, cd, fd, ph, dv)
    import jax.numpy as jnp

    assert bool(jnp.isfinite(out).all())
    assert out.shape == (2, 256, 16, 4, 2)


def test_sharded_fused_body_mosaic_compiles_on_chip():
    """Fused+turned sharded body compiled through Mosaic inside shard_map.

    The CPU-mesh suite runs this body interpret-mode only; here a 1×1
    mesh on the real chip proves the Pallas kernels lower through Mosaic
    *inside* shard_map (collectives degenerate but are still staged).
    """
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.parallel import ShardedFBEngine, make_mesh

    mesh = make_mesh(1, shape=(1, 1))
    cfg = ArrayConfig(n_ants=4, n_channels=1024, n_beams=4, n_taps=4)
    # n_spectra=64 so the corner-turn's P·S lane axis is 128-aligned.
    eng = ShardedFBEngine(cfg, mesh, n_spectra=64)
    # auto resolution picks the production fast path on the chip
    assert (eng.fengine, eng.bstage) == ("fused", "turned")
    adc, fd, ph, dv = eng.example_inputs()
    out = eng(adc, fd, ph, dv)
    assert bool(jnp.isfinite(jnp.asarray(out)).all())
    assert out.shape == (2, 1024, 64, 4, 2)


def test_flagship_shape_fused_turned_vs_golden_on_tpu():
    """Flagship-geometry spot check of the default (fused + turned) path.

    At the full 80 ant × 32k chan × 16 beam geometry (S=4 spectra):
    (a) FBEngine's auto defaults resolve to the measured-fastest config;
    (b) the exact-f32 fused F kernel's int8 planes match the host golden
        chain to ±1 code elementwise (round-half-even tie flips only);
    (c) the Pallas corner-turn + folded-dot B-stage holds the reference
        beamform tolerance (rtol=atol=1e-4 scaled,
        beamform_op_sequence_test.py:198-200) against the complex golden
        beamform on identical int8 inputs.
    All comparisons reduce on device; only scalars are pulled.
    """
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.models import FBEngine
    from dpdk_dc_sand_tpu.ops.beamform import beamform_turned
    from dpdk_dc_sand_tpu.ops.coeff_gen import steering_coeff_blockcat
    from dpdk_dc_sand_tpu.ops.corner_turn import corner_turn_planes
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    cfg = ArrayConfig(n_ants=80, n_channels=32768, n_beams=16, n_taps=16)
    # At the production spectra count the auto defaults resolve to the
    # measured-fastest config (construction only; the step below runs
    # the stages piecewise so the host golden stays tractable).
    fb = FBEngine(cfg, n_spectra=128)
    assert (fb.fengine, fb.bstage, fb.ct_batch_a) == ("fused", "turned", True)
    S = 4  # spectra for the golden F comparison

    rng = np.random.default_rng(7)
    frames = rng.integers(
        -64, 64,
        size=(cfg.n_ants, cfg.n_pols, S + cfg.n_taps - 1, cfg.fft_size),
        dtype=np.int8,
    )
    fd = rng.uniform(-0.5, 0.5, (cfg.n_ants, cfg.n_pols)).astype(np.float32)
    ph = rng.uniform(-1, 1, (cfg.n_ants, cfg.n_pols)).astype(np.float32)

    # --- host golden F chain ---
    window = np.asarray(golden.pfb_window(cfg.n_taps, cfg.fft_size))
    want_planes = np.empty(
        (cfg.n_ants, cfg.n_pols, S, cfg.n_channels, 2), np.int8
    )
    for a in range(cfg.n_ants):
        spectra = golden.pfb_channelise(
            frames[a].reshape(cfg.n_pols, -1).astype(np.float32), window
        )  # [P, S, C]
        for p in range(cfg.n_pols):
            corr = golden.apply_fine_delay(
                spectra[p], float(fd[a, p]), float(ph[a, p]), cfg.n_channels
            )
            want_planes[a, p] = golden.requantise(corr, 1.0 / 16.0)

    # --- (b) device fused_f32 F kernel vs golden planes: ±1 code ---
    frames_d = jax.device_put(jnp.asarray(frames))
    qr, qi = fengine_fused(
        frames_d, jnp.asarray(window), jnp.asarray(fd), jnp.asarray(ph),
        n_channels=cfg.n_channels, quant_scale=1.0 / 16.0,
        dft_dtype="float32", ct_batch_a=True,
    )
    got_planes = jnp.stack([qr, qi], axis=-1).astype(jnp.int32)
    ref_planes = jnp.asarray(want_planes).astype(jnp.int32)
    diff = jnp.abs(got_planes - ref_planes)
    assert int(jnp.max(diff)) <= 1
    assert float(jnp.mean((diff != 0).astype(jnp.float32))) <= 2e-3

    # --- (c) turned B-stage vs golden beamform on identical int8 input.
    # The corner-turn kernel needs a 128-aligned P·S lane axis, so this
    # part runs at the production S=128 on random planes; the golden
    # beamform checks the first 4 spectra of each pol (same math every
    # spectrum — the dot is batched over channels, not spectra).
    SB = 128
    planes = rng.integers(
        -100, 100, size=(cfg.n_ants, cfg.n_pols, SB, cfg.n_channels, 2),
        dtype=np.int8,
    )
    dv = np.zeros((cfg.n_beams, cfg.n_ants, 4), np.float32)
    dv[..., 0] = rng.uniform(0, 5e-9, dv.shape[:-1])
    dv[..., 2] = rng.uniform(-np.pi, np.pi, dv.shape[:-1])
    w = golden.steering_coeffs_complex(
        np.broadcast_to(dv, (cfg.n_channels,) + dv.shape),
        cfg.n_channels,
        cfg.sample_period,
    )  # [C, B, A] complex64
    qr_d = jnp.asarray(planes[..., 0])  # [A, P, SB, C] int8
    qi_d = jnp.asarray(planes[..., 1])
    x_t = corner_turn_planes(qr_d, qi_d)
    blocks = steering_coeff_blockcat(
        jnp.asarray(w.real), jnp.asarray(w.imag)
    )
    beam_re, beam_im = beamform_turned(
        x_t, blocks, n_pols=cfg.n_pols, precision="f32"
    )  # [P, C, SB, B]

    x = (
        planes[:, :, :S, :, 0].astype(np.float32)
        + 1j * planes[:, :, :S, :, 1]
    ).transpose(1, 3, 2, 0)  # [P, C, S, A]
    want = golden.beamform_complex(x, w)  # [P, C, S, B]
    tol = 1e-4 * max(1.0, float(np.abs(want).max()))
    assert max_err(beam_re[:, :, :S], want.real.astype(np.float32)) <= tol
    assert max_err(beam_im[:, :, :S], want.imag.astype(np.float32)) <= tol


def test_fused_fengine_kernel_on_tpu():
    """Fused F-engine kernel vs composed ops on the chip (both modes)."""
    import jax
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused, fused_supported
    from dpdk_dc_sand_tpu.ops.pfb import default_window, pfb_channelise
    from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay
    from dpdk_dc_sand_tpu.ops.requant import requantise

    A, P, taps, F, S = 4, 2, 16, 2048, 16
    C = F // 2
    frames = RNG.integers(-64, 64, size=(A, P, S + taps - 1, F), dtype=np.int8)
    assert fused_supported(frames.shape, taps, C)
    win = default_window(taps, F)
    fd = RNG.uniform(-0.5, 0.5, (A, P)).astype(np.float32)
    ph = RNG.uniform(-1, 1, (A, P)).astype(np.float32)
    frames_d = jax.device_put(jnp.asarray(frames))
    fd_d, ph_d = jnp.asarray(fd), jnp.asarray(ph)

    spec = pfb_channelise(frames_d.reshape(A, P, -1), win, n_channels=C)
    re, im = apply_fine_delay(
        jnp.real(spec), jnp.imag(spec), fd_d, ph_d, n_channels=C
    )
    qr_ref, qi_ref = requantise(re, 1 / 16), requantise(im, 1 / 16)

    for dt, (max_code, max_frac) in {
        "float32": (1, 0.001),
        "bfloat16": (1, 0.25),
    }.items():
        qr, qi = fengine_fused(
            frames_d, win, fd_d, ph_d,
            n_channels=C, quant_scale=1 / 16, dft_dtype=dt,
        )
        dmax = float(
            jnp.maximum(
                jnp.abs(qr.astype(jnp.int32) - qr_ref.astype(jnp.int32)).max(),
                jnp.abs(qi.astype(jnp.int32) - qi_ref.astype(jnp.int32)).max(),
            )
        )
        frac = float(
            ((qr != qr_ref).astype(jnp.float32).mean()
             + (qi != qi_ref).astype(jnp.float32).mean()) / 2
        )
        assert dmax <= max_code, (dt, dmax)
        assert frac <= max_frac, (dt, frac)


def test_kernel_coarse_rolling_matches_xla_coarse_on_tpu():
    """The default F fast path (in-kernel coarse delay + rolling bf16
    FIR-history ring) == the XLA alignment pass, compiled through
    Mosaic on the chip.

    Same stream, two margins: with the DMA slack present the engine
    takes the in-kernel path (DMA row offsets + VMEM sub-row shift +
    rolling ring); with the slack sliced away it falls back to the XLA
    coarse pass feeding the same kernel. Beams must agree to float
    tolerance (identical int8 planes into the same B stage). Comparison
    reduces on device; one scalar pulled.
    """
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.models import FBEngine
    from dpdk_dc_sand_tpu.ops.fengine_pallas import coarse_margin_samples

    cfg = ArrayConfig(n_ants=3, n_channels=1024, n_beams=2, n_taps=4)
    kwargs = dict(
        n_spectra=64, fengine="fused_f32", bstage="planar", precision="f32"
    )
    fb = FBEngine(cfg, **kwargs)
    assert fb.fengine_rolling
    slack = coarse_margin_samples(cfg.fft_size, cfg.n_taps, 64, fb.ct_batch_a)
    assert slack is not None
    budget = 1800
    adc, cd, fd, ph, dv = fb.example_inputs(margin=slack + budget)
    cd = (cd % budget).astype(np.int32)
    want_kernel = fb(adc, cd, fd, ph, dv)

    fb2 = FBEngine(cfg, **kwargs)
    got_xla = fb2(adc[..., : fb2.samples_in + budget], cd, fd, ph, dv)
    err = float(jnp.max(jnp.abs(want_kernel - got_xla)))
    scale = float(jnp.max(jnp.abs(got_xla)))
    assert err <= 1e-4 * max(1.0, scale), (err, scale)


def test_natural_beam_layout_matches_split_on_tpu():
    """beam_layout="natural" (the production/bench path) on the real
    chip: the dot-natural [C, P·S, 2B] output re-laid out host-side must
    match the split [P, C, S, B, 2] form (round-3 epilogue deletion)."""
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.models import FBEngine

    cfg = ArrayConfig(n_ants=4, n_channels=1024, n_beams=4, n_taps=4)
    kwargs = dict(n_spectra=64, precision="f32", bstage="turned")
    split = FBEngine(cfg, **kwargs)
    nat = FBEngine(cfg, beam_layout="natural", **kwargs)
    assert nat.fengine_pipeline >= 2  # round-3 default schedule active
    adc, cd, fd, ph, dv = split.example_inputs()
    want = split(adc, cd, fd, ph, dv)
    got = nat(adc, cd, fd, ph, dv)
    c, m, b2 = got.shape
    assert (c, m, b2) == (1024, 2 * 64, 8)
    re_im = got.reshape(c, 2, 64, 2, 4)
    relay = jnp.stack(
        [re_im[:, :, :, 0, :], re_im[:, :, :, 1, :]], axis=-1
    ).transpose(1, 0, 2, 3, 4)
    # device-side comparison (never pull the arrays)
    diff = jnp.abs(relay - want).max()
    assert float(diff) < 1e-4


def test_fxb_fast_path_on_tpu():
    """Full-instrument FXB (one F feeding X and B) on the fused fast
    path, on the real chip: beams finite + visibilities Hermitian."""
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.models import FXBEngine

    cfg = ArrayConfig(n_ants=4, n_channels=1024, n_beams=4, n_taps=4)
    fxb = FXBEngine(cfg, n_spectra=64, fengine="fused", bstage="turned")
    adc, cd, fd, ph, dv = fxb.example_inputs()
    beams, vre, vim = fxb(adc, cd, fd, ph, dv)
    assert bool(jnp.isfinite(beams).all())
    assert bool(jnp.isfinite(vre).all())
    # Hermitian: vis[c] = X X^H  =>  re symmetric, im antisymmetric.
    assert float(jnp.abs(vre - jnp.swapaxes(vre, 1, 2)).max()) < 1e-3
    assert float(jnp.abs(vim + jnp.swapaxes(vim, 1, 2)).max()) < 1e-3


def test_xcorr_kernels_exact_on_tpu():
    """Round-4 visibility kernels on the real chip: X-layout Pallas
    turn, turned grams, and the fused turn+gram kernel all equal the
    int64 integer golden model exactly (int8-MXU and bf16 variants)."""
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.ops.corner_turn import corner_turn_planes_x
    from dpdk_dc_sand_tpu.ops.correlate import correlate_turned
    from dpdk_dc_sand_tpu.ops.xcorr_pallas import (
        correlate_planes_fused,
        correlate_turned_fused,
    )

    A, P, S, C = 4, 2, 128, 256
    qr = jnp.asarray(RNG.integers(-100, 100, (A, P, S, C), dtype=np.int8))
    qi = jnp.asarray(RNG.integers(-100, 100, (A, P, S, C), dtype=np.int8))
    r = np.asarray(qr).transpose(3, 0, 1, 2).reshape(C, A * P, S)
    im = np.asarray(qi).transpose(3, 0, 1, 2).reshape(C, A * P, S)
    r64, i64 = r.astype(np.int64), im.astype(np.int64)
    want_re = np.einsum("cis,cjs->cij", r64, r64) + np.einsum(
        "cis,cjs->cij", i64, i64
    )
    want_im = np.einsum("cis,cjs->cij", i64, r64) - np.einsum(
        "cis,cjs->cij", r64, i64
    )
    wre = jnp.asarray(want_re.astype(np.float32))
    wim = jnp.asarray(want_im.astype(np.float32))

    xt = corner_turn_planes_x(qr, qi)
    for name, (vre, vim) in {
        "turned-xla-int8": correlate_turned(xt, A * P, "int8"),
        "turned-kernel-bf16": correlate_turned_fused(xt, A * P),
        "turned-kernel-int8": correlate_turned_fused(
            xt, A * P, int8_mxu=True
        ),
        "fused-kernel-int8": correlate_planes_fused(qr, qi, int8_mxu=True),
    }.items():
        assert float(jnp.abs(vre - wre).max()) == 0.0, name
        assert float(jnp.abs(vim - wim).max()) == 0.0, name


def test_unquantised_fused_output_on_tpu():
    """quantise=False (qualification mode) on the real chip matches the
    composed float chain."""
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused
    from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise

    C, taps, S = 512, 8, 8
    FFT = 2 * C
    frames = RNG.integers(-64, 64, (1, 1, S + taps - 1, FFT), dtype=np.int8)
    w = jnp.asarray(np.asarray(pfb_window(taps, FFT)))
    zero = jnp.zeros((1, 1), jnp.float32)
    fr, fi = fengine_fused(
        jnp.asarray(frames), w, zero, zero, n_channels=C, quant_scale=1.0,
        dft_dtype="float32", quantise=False,
    )
    spec = pfb_channelise(
        jnp.asarray(frames).reshape(1, 1, -1), w, n_channels=C,
        use_pallas=False,
    )
    scale = float(jnp.abs(spec).max())
    assert float(jnp.abs(fr - jnp.real(spec)).max()) / scale < 1e-5
    assert float(jnp.abs(fi - jnp.imag(spec)).max()) / scale < 1e-5


def test_tapouter_and_xpipe_bit_exact_on_tpu():
    """Round-4 F-kernel variants (kept for the record): tap-outer FIR
    and the cross-block carry schedule are bit-exact vs the production
    pipelined schedule on the real chip."""
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.golden.pfb import pfb_window
    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    C, taps, S = 1024, 4, 16
    FFT = 2 * C
    frames = jnp.asarray(
        RNG.integers(-64, 64, (2, 2, S + taps - 1, FFT), dtype=np.int8)
    )
    w = jnp.asarray(np.asarray(pfb_window(taps, FFT)))
    zero = jnp.zeros((2, 2), jnp.float32)
    kw = dict(
        n_channels=C, quant_scale=1.0 / 16.0, ct_batch_a=True,
        rolling=True, ct_pipeline=2,
    )
    base_r, base_i = fengine_fused(frames, w, zero, zero, **kw)
    for name, extra in {
        "tapouter": dict(fir_tapouter=True),
        "slab": dict(fir_tapouter="slab"),
        "bfuse": dict(ct_bfuse=True),
        "xpipe": dict(ct_xpipe=True),
    }.items():
        vr, vi = fengine_fused(frames, w, zero, zero, **kw, **extra)
        assert float(jnp.abs(vr.astype(jnp.int32) - base_r).max()) == 0, name
        assert float(jnp.abs(vi.astype(jnp.int32) - base_i).max()) == 0, name


def test_compiled_bf16_leakage_on_tpu():
    """The COMPILED production bf16 kernel's channelisation leakage,
    measured on real TPU hardware, meets the −62 dB spec — and the
    measured number is emitted as the committed evidence artifact the
    qualification report cites
    (tests/qualification/reports/channelisation_compiled_onchip.json).
    Same tone / kernel call / statistic as the interpret-mode
    qualification (tests/qualification/chan_common.py); only
    ``interpret`` differs, so any compiled-vs-interpret divergence
    fails loudly here.
    """
    import datetime
    import json

    import jax

    from tests.qualification.chan_common import (
        K,
        LEAKAGE_SPEC_DB,
        ONCHIP_REPORT,
        fused_power,
        worst_leakage_db,
    )

    power = fused_power("bfloat16", interpret=False)
    peak = int(np.argmax(power))
    worst = worst_leakage_db(power)
    assert peak == K
    assert worst <= LEAKAGE_SPEC_DB, worst
    ONCHIP_REPORT.parent.mkdir(parents=True, exist_ok=True)
    with open(ONCHIP_REPORT, "w") as f:
        json.dump(
            {
                "test": "test_compiled_bf16_leakage_on_tpu",
                "platform": str(jax.devices()[0]),
                "date": datetime.date.today().isoformat(),
                "interpret": False,
                "dft_dtype": "bfloat16",
                "peak_channel": peak,
                "worst_leakage_db": round(worst, 2),
                "spec_db": LEAKAGE_SPEC_DB,
                "note": "tone/kernel/statistic identical to the "
                "interpret-mode qualification (chan_common.py)",
            },
            f,
            indent=1,
        )
        f.write("\n")
