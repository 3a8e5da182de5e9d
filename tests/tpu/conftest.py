"""On-hardware test suite — auto-enabled whenever a TPU is reachable.

The main suite forces the CPU backend (tests/conftest.py) so the virtual
8-device mesh works; these tests exercise the actual TPU. The platform is
flipped to the TPU backend lazily — by a session fixture scoped to this
directory, which runs after all CPU-mesh tests (``tests/tpu`` collects
last) — so a combined ``pytest tests/`` run exercises both backends.

Gating (``DCSAND_TPU_TESTS``):

- unset (default): probe for a TPU backend when the first test in this
  directory runs; run on it, or skip the directory if none is reachable.
- ``1``: require the TPU — tests fail rather than skip if it is missing.
- ``0``: skip the directory without probing.
"""

import os

import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("DCSAND_TPU_TESTS") == "0":
        skip = pytest.mark.skip(reason="DCSAND_TPU_TESTS=0")
        for item in items:
            if "tests/tpu" in str(item.fspath).replace("\\", "/"):
                item.add_marker(skip)


@pytest.fixture(scope="session", autouse=True)
def _tpu_platform():
    """Switch jax to the TPU backend for this directory's tests."""
    if os.environ.get("DCSAND_TPU_TESTS") == "0":
        yield
        return
    import jax

    try:
        jax.config.update("jax_platforms", "axon")
    except Exception:
        pass
    if jax.default_backend() != "tpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        if os.environ.get("DCSAND_TPU_TESTS") == "1":
            pytest.fail("DCSAND_TPU_TESTS=1 but no TPU backend is reachable")
        pytest.skip("no TPU backend reachable")
    yield
    # Restore the CPU platform the main suite forced (harmless at
    # session end; keeps any late non-tpu collection consistent).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
