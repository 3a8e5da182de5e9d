"""Tests for the delay-tracking requirements calculator."""

import numpy as np
import pytest

from dpdk_dc_sand_tpu import delay_tracking as dt


def test_ecef_known_points():
    # Equator/prime meridian → (a, 0, 0)
    np.testing.assert_allclose(
        dt.geodetic_to_ecef(0.0, 0.0), [6378137.0, 0.0, 0.0], atol=1e-6
    )
    # North pole → (0, 0, b) with b = a(1-f)
    b = 6378137.0 * (1 - 1 / 298.257223563)
    np.testing.assert_allclose(
        dt.geodetic_to_ecef(90.0, 0.0), [0.0, 0.0, b], atol=1e-6
    )


def test_chord_distance_sanity():
    # ~1 degree of latitude ≈ 111 km
    d = dt.chord_distance_km((-30.0, 21.0), (-31.0, 21.0))
    assert 109.0 < d < 112.0
    assert dt.chord_distance_km((-30.7, 21.4), (-30.7, 21.4)) == 0.0


def test_delay_from_elevation():
    # Source on horizon: delay = baseline / c; at zenith: zero.
    b = 10_000.0
    assert dt.calculate_delay_from_source_elevation(b, 0.0) == pytest.approx(
        b / dt.SPEED_OF_LIGHT
    )
    assert dt.calculate_delay_from_source_elevation(b, 90.0) == pytest.approx(
        0.0, abs=1e-18
    )
    with pytest.raises(ValueError):
        dt.calculate_delay_from_source_elevation(b, 91.0)


def test_requirements_envelope():
    reqs = dt.calculate_delay_tracking_requirements(10.0)  # 10 km baseline
    # max delay = 3 * b / c (reference lines 156-170)
    assert reqs["max_coarse_delay_us"] == pytest.approx(
        3 * 10_000.0 / dt.SPEED_OF_LIGHT * 1e6
    )
    rr = reqs["range_of_rate_of_change_of_delay_ns_s"]
    # max rate at 90 deg elevation exceeds min rate at 15 deg
    assert rr["max"] > rr["min"] > 0


def test_longest_baseline_and_csv(tmp_path):
    csv = tmp_path / "ants.csv"
    csv.write_text(
        "name,lon,lat\n"
        "m000,21.44,-30.71\n"
        "m001,21.45,-30.71\n"
        "e154,21.60,-30.90\n"
    )
    coords = dt.get_coordinates_from_csv(str(csv))
    assert coords["m000"] == (-30.71, 21.44)
    baselines = dt.calculate_baselines(coords)
    pair, longest = dt.find_longest_baseline(baselines)
    assert set(pair) == {"m000", "e154"}
    assert longest == max(baselines.values())


def test_max_coarse_delay_samples():
    n = dt.max_coarse_delay_samples(17.0, 1712e6)
    # 3 * 17 km / c * 1712e6 ≈ 291k samples
    assert n == int(np.ceil(3 * 17e3 / dt.SPEED_OF_LIGHT * 1712e6))


def test_cli_smoke(tmp_path, capsys):
    csv = tmp_path / "ants.csv"
    csv.write_text("name,lon,lat\nm000,21.44,-30.71\nm001,21.58,-30.83\n")
    dt.main([str(csv)])
    out = capsys.readouterr().out
    assert "Longest Baseline" in out
    assert "Maximum Delay Compensation" in out
