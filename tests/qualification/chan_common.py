"""Shared channelisation-qualification measurement helpers.

Used by the interpret-mode qualification
(``test_channelisation_production.py``) and by the ON-CHIP compiled
measurement (``tests/tpu/test_ops_on_tpu.py``), so the number in the
evidence chain comes from the same tone, the same kernel call and the
same leakage statistic — only ``interpret`` differs.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from dpdk_dc_sand_tpu.golden.pfb import pfb_window

LEAKAGE_SPEC_DB = -62.0
C, TAPS, S = 512, 16, 8
FFT = 2 * C
K = 100

#: Committed on-chip evidence artifact (written by the tpu suite).
ONCHIP_REPORT = (
    Path(__file__).parent / "reports" / "channelisation_compiled_onchip.json"
)


def make_tone() -> np.ndarray:
    """TPDF-dithered 8-bit digitiser CW tone at channel-``K`` centre.

    An undithered integer-frequency tone quantises into deterministic
    harmonics ~−58 dBc that would mask the filterbank; ±1-code
    triangular dither whitens the error to a flat ≈−71 dB/bin floor,
    below the −62 dB spec line (standard ADC test practice).
    """
    n_frames = S + TAPS - 1
    n = np.arange(n_frames * FFT)
    rng = np.random.default_rng(2021)
    dither = rng.uniform(-0.5, 0.5, n.size) + rng.uniform(-0.5, 0.5, n.size)
    tone = np.clip(
        np.round(120 * np.cos(2 * np.pi * K * n / FFT) + dither), -127, 127
    ).astype(np.int8)
    return tone.reshape(1, 1, n_frames, FFT)


def fused_power(dft_dtype: str, interpret: bool) -> np.ndarray:
    """Per-channel mean power of the fused kernel's unquantised output."""
    import jax.numpy as jnp

    from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

    zero = jnp.zeros((1, 1), jnp.float32)
    fr, fi = fengine_fused(
        jnp.asarray(make_tone()),
        jnp.asarray(np.asarray(pfb_window(TAPS, FFT))),
        zero,
        zero,
        n_channels=C,
        quant_scale=1.0,
        dft_dtype=dft_dtype,
        quantise=False,
        interpret=interpret,
    )
    power = np.asarray(fr, np.float64) ** 2 + np.asarray(fi, np.float64) ** 2
    # Average over spectra: tightens the dither-floor variance (the
    # floor's expectation is set by the dither, not by averaging).
    return power[0, 0].mean(axis=0)


def worst_leakage_db(power: np.ndarray) -> float:
    rel_db = 10 * np.log10(power / power[K] + 1e-300)
    mask = np.ones(C, bool)
    mask[K] = False
    return float(rel_db[mask].max())


def load_onchip_report() -> dict | None:
    if ONCHIP_REPORT.exists():
        with open(ONCHIP_REPORT) as f:
            return json.load(f)
    return None
