"""Profiler hooks — the TPU equivalent of the reference's baked-in
profiling aids (SURVEY.md §5.1: CUDA events in the harness, nvcc
-lineinfo). Wraps ``jax.profiler`` traces and annotations with graceful
degradation on backends that cannot serve them (the tunnelled chip here).
"""

from __future__ import annotations

import contextlib
import logging
from typing import Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dcsand-trace") -> Iterator[Optional[str]]:
    """Capture a profiler trace of the enclosed block (TensorBoard format).

    Yields the trace directory, or None when the backend refused — the
    pipeline must keep working without profiling (the stage-timed harness
    in :mod:`dpdk_dc_sand_tpu.utils.timing` is the always-available
    fallback).
    """
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield log_dir
    except Exception as e:  # noqa: BLE001 - profiling is best-effort
        logger.warning("profiler trace unavailable: %s", e)
        yield None


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Label the enclosed host region in profiler traces."""
    import jax

    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:  # noqa: BLE001
        yield
