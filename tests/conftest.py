"""Shared pytest scaffolding.

Two jobs, mirroring the reference's test strategy (SURVEY.md §4):

1. Force JAX onto a virtual 8-device CPU platform so multi-chip sharding
   (mesh/psum/ppermute/all_to_all paths) is exercised without TPU hardware.
   Must happen before the first ``import jax`` anywhere in the test session.
2. Provide the ``combinations`` marker: parameter sweeps from several value
   lists that by default run only enough combinations to cover every value
   once (with the final, most complex value of every list always paired
   together), expanding to the full Cartesian product under
   ``--all-combinations`` — the reference's pairwise-pruning plugin pattern
   (beamformer/unit_test/conftest.py:17-101).
"""

import os

# The axon sitecustomize imports jax at interpreter startup (before any
# conftest code), so mutating JAX_PLATFORMS/JAX_PLATFORM_NAME here is too
# late — jax's config already captured them. XLA_FLAGS however is read
# lazily at CPU-backend init, and jax.config.update works any time before
# first device use. Order matters: flags first, then the config update.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config) -> None:
    config.addinivalue_line(
        "markers", "combinations(names, *values): test combinations of values"
    )


def pytest_addoption(parser) -> None:
    parser.getgroup("combinations").addoption(
        "--all-combinations",
        action="store_true",
        help="Test the full Cartesian product of parameters",
    )


def pytest_generate_tests(metafunc) -> None:
    full = metafunc.config.option.all_combinations
    for marker in metafunc.definition.iter_markers("combinations"):
        raw_names = marker.args[0]
        if isinstance(raw_names, (tuple, list)):
            names = list(raw_names)
        else:
            names = [n.strip() for n in raw_names.split(",") if n.strip()]
        value_lists = marker.args[1:]
        if len(names) != len(value_lists):
            pytest.fail(
                f"{metafunc.definition.nodeid}: combinations marker got "
                f"{len(names)} names but {len(value_lists)} value lists",
                pytrace=False,
            )
        if not names:
            continue
        if full:
            for name, vals in zip(names, value_lists):
                metafunc.parametrize(name, vals)
        else:
            depth = max(len(vals) for vals in value_lists)
            combos = []
            for i in range(depth):
                if i == depth - 1:
                    combos.append(tuple(vals[-1] for vals in value_lists))
                else:
                    combos.append(
                        tuple(vals[i % len(vals)] for vals in value_lists)
                    )
            metafunc.parametrize(names, combos)
