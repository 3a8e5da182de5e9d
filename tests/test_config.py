"""Tests for ArrayConfig / DelayModel core types."""

import numpy as np
import pytest

from dpdk_dc_sand_tpu.config import ArrayConfig, DelayModel, cdiv, round_up


def test_defaults_match_reference_constants():
    cfg = ArrayConfig()
    assert cfg.n_pols == 2
    assert cfg.adc_sample_rate == 1712e6
    assert cfg.sample_period == pytest.approx(1 / 1712e6)
    assert cfg.n_samples_per_block == 16  # 128 bits / 8-bit samples
    assert cfg.n_blocks == 256 // 16


def test_channels_per_stream_matches_reference_formula():
    # n_channels_per_stream = n_channels // n_ants // 4
    # (beamform_op_sequence_test.py:85)
    cfg = ArrayConfig(n_ants=64, n_channels=4096)
    assert cfg.n_channels_per_stream == 4096 // 64 // 4 == 16
    assert cfg.channel_offset(3) == 48


def test_shapes():
    cfg = ArrayConfig(n_ants=4, n_channels=256, n_beams=4, n_batches=2)
    cps = cfg.n_channels_per_stream
    assert cfg.ingest_shape == (2, 4, cps, 256, 2, 2)
    assert cfg.reordered_shape == (2, 2, cps, 16, 16, 4, 2)
    assert cfg.delay_vals_shape == (cps, 4, 4, 4)
    assert cfg.coeff_shape == (2, 2, cps, 8, 8)
    assert cfg.beam_shape == (2, 2, cps, 16, 16, 8)


def test_invalid_configs_rejected():
    with pytest.raises(ValueError):
        ArrayConfig(n_channels=1000)  # not power of two
    with pytest.raises(ValueError):
        ArrayConfig(n_samples_per_channel=250)  # not multiple of 16


def test_config_is_hashable_static_arg():
    assert hash(ArrayConfig()) == hash(ArrayConfig())
    assert ArrayConfig() != ArrayConfig(n_ants=5)


def test_delay_model_roundtrip():
    rng = np.random.default_rng(2021)
    dm = DelayModel(
        rng.normal(size=(16, 8)).astype(np.float32),
        rng.normal(size=(16, 8)).astype(np.float32),
        rng.normal(size=(16, 8)).astype(np.float32),
        rng.normal(size=(16, 8)).astype(np.float32),
    )
    dv = dm.to_delay_vals(4)
    assert dv.shape == (4, 16, 8, 4)
    back = DelayModel.from_delay_vals(dv)
    np.testing.assert_array_equal(back.delay_s, dm.delay_s)
    np.testing.assert_array_equal(back.phase_rate_radps, dm.phase_rate_radps)


def test_delay_model_time_extrapolation():
    dm = DelayModel(
        np.full((1, 1), 2.0, np.float32),
        np.full((1, 1), 0.5, np.float32),
        np.full((1, 1), 1.0, np.float32),
        np.full((1, 1), -0.25, np.float32),
    )
    at = dm.at_time(4.0)
    assert at.delay_s[0, 0] == pytest.approx(4.0)
    assert at.phase_rad[0, 0] == pytest.approx(0.0)


def test_helpers():
    assert cdiv(7, 3) == 3
    assert round_up(100, 128) == 128
    assert round_up(128, 128) == 128
