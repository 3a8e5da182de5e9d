"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def factor_devices(n: int) -> Tuple[int, int]:
    """Factor ``n`` devices into the most square (ant, time) grid.

    Prefers a balanced 2D split so both the antenna-reduction axis and the
    time/channel axis get parallelism; falls back to 1×n.
    """
    best = (1, n)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("ant", "time"),
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """Build a 2D mesh over the available devices.

    Axes: ``"ant"`` — antenna sharding (beamform reduction via psum);
    ``"time"`` — time-block sharding pre-corner-turn, which the
    ``all_to_all`` corner turn converts into channel sharding (the xeng_id
    split) for the B-stage.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = factor_devices(len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
