"""X-engine: visibility integration over accumulation windows.

Completes the F/X/B trio the reference sandbox prototypes toward
(merge_gpu_repositories/do_merge.sh merges katfgpu + katxgpu →
katgpucbf). Consumes the same 8-bit channelised transport format as the
B-engine and integrates full visibility matrices per channel slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dpdk_dc_sand_tpu.config import ArrayConfig
from dpdk_dc_sand_tpu.ops.correlate import correlate


class XEngine:
    """Visibility accumulator for one engine's channel slice.

    Parameters
    ----------
    cfg:
        System configuration; inputs = ``n_ants · n_pols`` signals.
    n_accum:
        Time blocks integrated per output dump (the reference's
        256-accumulation cadence, BeamformerParameters.h:17).
    """

    def __init__(self, cfg: ArrayConfig, n_accum: int = 256, precision: str = "f32"):
        self.cfg = cfg
        self.n_accum = n_accum
        self.n_inputs = cfg.n_ants * cfg.n_pols
        self._step = jax.jit(
            functools.partial(_accum_window, precision=precision, n_accum=n_accum)
        )

    def integrate(self, samples: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Integrate one accumulation window.

        ``samples``: ``[n_accum, chan, time_per_block, n_inputs, 2]``
        planar int8 — a window of transport chunks. Returns ``(V_re,
        V_im)`` ``[chan, n_inputs, n_inputs]`` f32.
        """
        return self._step(samples)

    def example_inputs(self, n_chan: int = 16, t_block: int = 16, seed: int = 2021):
        rng = np.random.default_rng(seed)
        return rng.integers(
            -64,
            64,
            size=(self.n_accum, n_chan, t_block, self.n_inputs, 2),
            dtype=np.int8,
        )


def _accum_window(samples: jax.Array, *, precision: str, n_accum: int):
    def body(carry, block):
        vre, vim = correlate(block, precision)
        return (carry[0] + vre, carry[1] + vim), None

    n_chan, _, n_inputs, _ = samples.shape[1:]
    init = (
        jnp.zeros((n_chan, n_inputs, n_inputs), jnp.float32),
        jnp.zeros((n_chan, n_inputs, n_inputs), jnp.float32),
    )
    (vre, vim), _ = jax.lax.scan(body, init, samples)
    return vre, vim
