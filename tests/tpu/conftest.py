"""On-hardware test suite — opt-in, run ALONE against the real chip.

The main suite forces the CPU backend (tests/conftest.py); these tests
exercise the actual TPU, where this environment's axon backend has real
gaps (complex64 host transfers unimplemented, slow device→host pulls).

Run with::

    DCSAND_TPU_TESTS=1 python -m pytest tests/tpu -q -p no:cacheprovider

Skipped entirely unless ``DCSAND_TPU_TESTS=1`` and a TPU is reachable.
"""

import os

import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("DCSAND_TPU_TESTS") != "1":
        skip = pytest.mark.skip(reason="set DCSAND_TPU_TESTS=1 to run on the chip")
        for item in items:
            if "tests/tpu" in str(item.fspath).replace("\\", "/"):
                item.add_marker(skip)
        return
    import jax

    try:
        jax.config.update("jax_platforms", "axon")
    except Exception:
        pass
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(
            reason="no TPU backend (run tests/tpu alone, not with the CPU suite)"
        )
        for item in items:
            item.add_marker(skip)
