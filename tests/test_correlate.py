"""X-engine correlator tests: op vs golden, physics, accumulation."""

import numpy as np

from dpdk_dc_sand_tpu import golden, ops
from dpdk_dc_sand_tpu.config import ArrayConfig
from dpdk_dc_sand_tpu.models import XEngine

RNG = np.random.default_rng(seed=2021)


def _planar(chan=4, t=32, inputs=6):
    return RNG.integers(-100, 100, size=(chan, t, inputs, 2), dtype=np.int8)


def test_correlate_matches_golden():
    x = _planar()
    vre, vim = ops.correlate(x)
    want = golden.correlate(
        x[..., 0].astype(np.float64) + 1j * x[..., 1]
    )
    np.testing.assert_allclose(np.asarray(vre), want.real, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(vim), want.imag, rtol=1e-5, atol=1e-2)


def test_planar_golden_matches_complex_golden():
    x = _planar()
    c = x[..., 0].astype(np.float64) + 1j * x[..., 1]
    vre, vim = golden.correlate_planar(x[..., 0], x[..., 1])
    want = golden.correlate(c)
    np.testing.assert_allclose(vre, want.real, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(vim, want.imag, rtol=1e-5, atol=1e-3)


def test_hermitian_and_autocorrelation_properties():
    x = _planar()
    vre, vim = ops.correlate(x)
    vre, vim = np.asarray(vre), np.asarray(vim)
    # V is Hermitian: V[i,j] = conj(V[j,i])
    np.testing.assert_allclose(vre, vre.transpose(0, 2, 1), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(vim, -vim.transpose(0, 2, 1), rtol=1e-5, atol=1e-3)
    # autocorrelations are real and non-negative
    diag_im = np.diagonal(vim, axis1=1, axis2=2)
    diag_re = np.diagonal(vre, axis1=1, axis2=2)
    np.testing.assert_allclose(diag_im, 0, atol=1e-3)
    assert (diag_re >= 0).all()


def test_correlated_signal_shows_in_cross_terms():
    """Two inputs carrying the same tone correlate; independent noise doesn't."""
    t = 512
    n = np.arange(t)
    tone = 50 * np.exp(2j * np.pi * 0.125 * n)
    noise = RNG.normal(scale=20, size=t) + 1j * RNG.normal(scale=20, size=t)
    x = np.zeros((1, t, 3, 2), np.float32)
    x[0, :, 0, 0], x[0, :, 0, 1] = tone.real, tone.imag
    x[0, :, 1, 0], x[0, :, 1, 1] = tone.real, tone.imag
    x[0, :, 2, 0], x[0, :, 2, 1] = noise.real, noise.imag
    vre, vim = ops.correlate(x)
    v = np.asarray(vre) + 1j * np.asarray(vim)
    coherent = abs(v[0, 0, 1])
    incoherent = abs(v[0, 0, 2])
    assert coherent > 10 * incoherent


def test_accumulate_adds():
    x = _planar()
    acc = np.zeros((4, 6, 6), np.float32)
    vre1, vim1 = ops.correlate_accumulate(x, acc, acc)
    vre2, vim2 = ops.correlate_accumulate(x, np.asarray(vre1), np.asarray(vim1))
    np.testing.assert_allclose(np.asarray(vre2), 2 * np.asarray(vre1), rtol=1e-5)


def test_xengine_window_integration():
    cfg = ArrayConfig(n_ants=3, n_channels=256)
    xe = XEngine(cfg, n_accum=4)
    samples = xe.example_inputs(n_chan=4, t_block=8)
    vre, vim = xe.integrate(samples)
    assert np.asarray(vre).shape == (4, 6, 6)
    # equals the sum of per-block correlations
    want_re = np.zeros((4, 6, 6), np.float32)
    want_im = np.zeros((4, 6, 6), np.float32)
    for b in range(4):
        r, i = golden.correlate_planar(
            samples[b, ..., 0], samples[b, ..., 1]
        )
        want_re += r
        want_im += i
    np.testing.assert_allclose(np.asarray(vre), want_re, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(vim), want_im, rtol=1e-4, atol=1e-2)
