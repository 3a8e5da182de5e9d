"""Run the on-chip suite from a combined ``pytest tests/`` invocation.

The main suite initialises the (virtual 8-device) CPU backend before any
``tests/tpu`` test runs, and an already-initialised JAX cannot flip to
the TPU platform in-process — so in a combined run the on-chip directory
would silently skip (found by the round-2 review). This test closes that
hole: it executes ``pytest tests/tpu`` in a FRESH subprocess, where the
lazy platform flip in ``tests/tpu/conftest.py`` works, and fails loudly
(with the child's output) if any on-chip test fails.

Gating mirrors ``tests/tpu/conftest.py`` (``DCSAND_TPU_TESTS``): unset →
probe and skip loudly when no TPU is reachable; ``1`` → require the TPU;
``0`` → skip. Standalone ``pytest tests/tpu`` runs are unaffected (this
file lives outside that directory and subprocesses it exactly once).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe_tpu() -> bool:
    """Can a fresh interpreter reach a TPU backend?"""
    code = (
        "import jax; import sys;"
        "sys.exit(0 if jax.default_backend() == 'tpu' else 1)"
    )
    try:
        return (
            subprocess.run(
                [sys.executable, "-c", code],
                cwd=_REPO,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                timeout=120,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def test_on_chip_suite_in_fresh_process():
    gate = os.environ.get("DCSAND_TPU_TESTS")
    if gate == "0":
        pytest.skip("DCSAND_TPU_TESTS=0: on-chip suite disabled")
    if not _probe_tpu():
        if gate == "1":
            pytest.fail("DCSAND_TPU_TESTS=1 but no TPU backend is reachable")
        pytest.skip(
            "no TPU backend reachable from a fresh process; "
            "on-chip coverage NOT exercised (set DCSAND_TPU_TESTS=1 to fail)"
        )
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", "tests/tpu", "-q",
            "--tb=short", "-p", "no:warnings",
        ],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    # Exit 0 means tests were collected and none failed (pytest uses
    # exit 5 for an empty collection); additionally require at least one
    # PASS so an all-skip run (e.g. a gating regression in the child)
    # cannot masquerade as coverage.
    assert proc.returncode == 0, (
        f"on-chip suite failed (exit {proc.returncode}):\n{tail}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert " passed" in proc.stdout or "%]" in proc.stdout and any(
        ch == "." for ln in proc.stdout.splitlines() if "%]" in ln
        for ch in ln
    ), f"no on-chip tests ran:\n{tail}"
    print(tail)
