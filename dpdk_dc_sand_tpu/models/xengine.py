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
from dpdk_dc_sand_tpu.ops.correlate import correlate, correlate_accumulate


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


class VisibilityAccumulator:
    """Cross-step visibility integration with device-resident state.

    The streaming counterpart of :meth:`XEngine.integrate`: feed it one
    step's voltages (or a pre-correlated ``(V_re, V_im)`` pair) at a time;
    every ``n_accum`` steps it emits an integrated dump and restarts — the
    reference's ACCUMULATIONS_BEFORE_NEW_COEFFS=256 cadence
    (BeamformerParameters.h:17) as a device-side running sum. The
    accumulator buffers are donated to each update, so integration is
    in-place in HBM and nothing is pulled to the host between dumps.

    Works unchanged on sharded inputs (e.g. the channel-sharded
    visibilities from ``ShardedFBEngine(emit_visibilities=True)``): the
    running sum inherits the addends' sharding.
    """

    def __init__(self, n_accum: int, precision: str = "f32"):
        self.n_accum = n_accum
        self._acc: tuple[jax.Array, jax.Array] | None = None
        self._count = 0
        self._first_seq: int | None = None
        self._add = jax.jit(
            lambda ar, ai, vr, vi: (ar + vr, ai + vi), donate_argnums=(0, 1)
        )
        self._corr_add = jax.jit(
            functools.partial(correlate_accumulate, precision=precision),
            donate_argnums=(1, 2),
        )

    @property
    def count(self) -> int:
        """Steps integrated into the current window."""
        return self._count

    def add(self, vis_re: jax.Array, vis_im: jax.Array, seq: int | None = None):
        """Fold one step's visibilities in; return a dump when complete.

        Returns ``None`` mid-window, else ``(V_re, V_im, first_seq)`` with
        the window's integrated f32 visibilities and the sequence number of
        its first step (``None`` when seqs were never supplied).
        """
        if self._acc is None:
            self._acc = (
                jnp.zeros_like(vis_re, jnp.float32),
                jnp.zeros_like(vis_im, jnp.float32),
            )
        if self._count == 0:
            self._first_seq = seq
        self._acc = self._add(*self._acc, vis_re, vis_im)
        self._count += 1
        if self._count < self.n_accum:
            return None
        dump = (*self._acc, self._first_seq)
        self._acc = (
            jnp.zeros_like(dump[0]),
            jnp.zeros_like(dump[1]),
        )
        self._count = 0
        return dump

    def add_samples(self, samples: jax.Array, seq: int | None = None):
        """Correlate one step's voltages and fold them in (fused update).

        ``samples``: ``[chan, time, n_inputs, 2]`` planar int8 — the
        F-engine transport block. Correlation and accumulation run in one
        jit with the accumulators donated.
        """
        if self._acc is None:
            n_chan, _, n_inputs, _ = samples.shape
            self._acc = (
                jnp.zeros((n_chan, n_inputs, n_inputs), jnp.float32),
                jnp.zeros((n_chan, n_inputs, n_inputs), jnp.float32),
            )
        if self._count == 0:
            self._first_seq = seq
        self._acc = self._corr_add(samples, *self._acc)
        self._count += 1
        if self._count < self.n_accum:
            return None
        dump = (*self._acc, self._first_seq)
        self._acc = (jnp.zeros_like(dump[0]), jnp.zeros_like(dump[1]))
        self._count = 0
        return dump


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
