"""Real multi-process (simulated multi-host) integration test.

The reference's deployment model is engines on many hosts, each
subscribing only to its own multicast groups (ibverbs_rx.c:207-210).
Here: TWO OS processes joined via ``jax.distributed`` (gloo CPU
collectives), each owning 4 of the 8 virtual devices, each feeding only
its local shards through :func:`assemble_global` — then the full
distributed F+B step (ppermute halo + all_to_all corner turn + antenna
psum) runs ACROSS the process boundary. Equivalence is checked against
the identical single-process 8-device run.

Subprocesses get fresh interpreters (the test session's jax is already
bound to one process's view), so everything runs via
``tests/multihost_worker.py``.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(pid, nprocs, coordinator, out, devices_per_proc):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # The session's coordinator variables must not leak into workers.
    for k in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    return subprocess.Popen(
        [
            sys.executable,
            str(WORKER),
            "--pid", str(pid),
            "--nprocs", str(nprocs),
            "--coordinator", coordinator,
            "--out", str(out),
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )


def _run_and_read(procs, outs, timeout=300):
    for p in procs:
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, err.decode(errors="replace")[-2000:]
    return [json.loads(Path(o).read_text()) for o in outs]


def test_two_process_feed_and_step_matches_single_process(tmp_path):
    # Reference: the SAME pipeline in one process over all 8 devices.
    ref_out = tmp_path / "ref.json"
    ref = _run_and_read(
        [_launch(0, 1, "", ref_out, devices_per_proc=8)], [ref_out]
    )[0]
    assert ref["n_global_devices"] == 8
    assert ref["n_local_shards"] == 8

    # Two processes, 4 local devices each, gloo-joined.
    coord = f"localhost:{_free_port()}"
    outs = [tmp_path / "p0.json", tmp_path / "p1.json"]
    procs = [
        _launch(0, 2, coord, outs[0], devices_per_proc=4),
        _launch(1, 2, coord, outs[1], devices_per_proc=4),
    ]
    results = _run_and_read(procs, outs)
    for r in results:
        assert r["n_global_devices"] == 8
        # per-host ingest: each process fed ONLY its 4 local shards
        assert r["n_local_shards"] == 4
        assert r["out_shape"] == ref["out_shape"]
        assert r["checksum"] == pytest.approx(ref["checksum"], rel=1e-5)
