"""FXB engine: one F stage feeding both the beamformer and the correlator.

The full instrument the reference sandbox was building toward
(merge_gpu_repositories/do_merge.sh: katfgpu + katxgpu → katgpucbf): the
channelised, delay-corrected, requantised antenna voltages fan out to the
B-engine (multi-beam matmul) and the X-engine (visibility integration)
inside one jit — the F-stage output is computed once and consumed twice
without leaving HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpdk_dc_sand_tpu.config import ArrayConfig
from dpdk_dc_sand_tpu.golden.pfb import pfb_window
from dpdk_dc_sand_tpu.models.fbengine import _coeff_blocks
from dpdk_dc_sand_tpu.ops.beamform import beamform_planes
from dpdk_dc_sand_tpu.ops.correlate import correlate_planes
from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay, coarse_delay
from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise
from dpdk_dc_sand_tpu.ops.requant import requantise


class FXBEngine:
    """Fused F + X + B signal chain on one chip.

    Per step returns ``(beams, vis_re, vis_im)``:

    - beams ``[n_pols, n_channels, n_spectra, n_beams, 2]`` f32;
    - visibilities ``[n_channels, n_inputs, n_inputs]`` f32 each, the
      step's spectra integrated (accumulate across steps on the caller's
      side or via :class:`~dpdk_dc_sand_tpu.models.XEngine` windows),
      with ``n_inputs = n_ants · n_pols``.
    """

    def __init__(
        self,
        cfg: ArrayConfig,
        n_spectra: int = 32,
        quant_scale: float = 1.0 / 16.0,
        precision: str = "f32",
        use_pallas: bool | None = None,
    ) -> None:
        self.cfg = cfg
        self.n_spectra = n_spectra
        self.window = jnp.asarray(np.asarray(pfb_window(cfg.n_taps, cfg.fft_size)))
        self._coeff_fn = jax.jit(functools.partial(_coeff_blocks, cfg=cfg))
        self._coeffs = None
        self._coeff_key = None
        self._step = jax.jit(
            functools.partial(
                _fxb_step,
                window=self.window,
                cfg=cfg,
                n_spectra=n_spectra,
                quant_scale=quant_scale,
                precision=precision,
                use_pallas=use_pallas,
            )
        )

    @property
    def samples_in(self) -> int:
        return (self.n_spectra + self.cfg.n_taps - 1) * self.cfg.fft_size

    def set_beam_delays(self, delay_vals, ant_weights=None, t_s: float = 0.0) -> None:
        """Same contract as :meth:`FBEngine.set_beam_delays` (t_s
        extrapolates via the delay/phase rates, traced, no recompile)."""
        key = (id(delay_vals), id(ant_weights), float(t_s))
        if self._coeffs is None or key != self._coeff_key:
            w = (
                jnp.ones(self.cfg.n_ants, jnp.float32)
                if ant_weights is None
                else jnp.asarray(ant_weights, jnp.float32)
            )
            self._coeffs = self._coeff_fn(
                jnp.asarray(delay_vals), w, jnp.float32(t_s)
            )
            self._coeff_key = key

    def step(self, adc, coarse_delays, frac_delays, phases):
        """Hot-loop step using the cached steering planes."""
        if self._coeffs is None:
            raise RuntimeError("call set_beam_delays() first")
        return self._step(adc, coarse_delays, frac_delays, phases, self._coeffs)

    def __call__(self, adc, coarse_delays, frac_delays, phases, delay_vals):
        self.set_beam_delays(delay_vals)
        return self._step(adc, coarse_delays, frac_delays, phases, self._coeffs)

    def example_inputs(self, seed: int = 2021, margin: int = 64):
        rng = np.random.default_rng(seed)
        cfg = self.cfg
        adc = rng.integers(
            -64, 64, size=(cfg.n_ants, cfg.n_pols, self.samples_in + margin),
            dtype=np.int8,
        )
        cd = rng.integers(0, margin, size=cfg.n_ants).astype(np.int32)
        fd = rng.uniform(-0.5, 0.5, cfg.n_ants).astype(np.float32)
        ph = (-np.pi * fd / 2).astype(np.float32)
        dv = np.zeros((cfg.n_beams, cfg.n_ants, 4), np.float32)
        dv[..., 0] = rng.uniform(0, 5e-9, dv.shape[:-1])
        dv[..., 2] = rng.uniform(-np.pi, np.pi, dv.shape[:-1])
        return adc, cd, fd, ph, dv


def _fxb_step(
    adc: jax.Array,
    coarse_delays: jax.Array,
    frac_delays: jax.Array,
    phases: jax.Array,
    coeffs,
    *,
    window: jax.Array,
    cfg: ArrayConfig,
    n_spectra: int,
    quant_scale: float,
    precision: str,
    use_pallas: bool | None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    # ---- shared F stage ----
    out_len = (n_spectra + cfg.n_taps - 1) * cfg.fft_size
    aligned = coarse_delay(adc, coarse_delays, out_len)
    spectra = pfb_channelise(
        aligned, window, n_channels=cfg.n_channels, use_pallas=use_pallas
    )
    re, im = apply_fine_delay(
        jnp.real(spectra),
        jnp.imag(spectra),
        frac_delays[:, None],
        phases[:, None],
        n_channels=cfg.n_channels,
    )
    # (re, im) stay separate int8 planes through the handoff (trailing-2
    # stacks force padded tiled layouts back through the FFT chain; see
    # benchmarks/fuse_boundary2.py).
    qr = requantise(re, quant_scale)  # [A, P, S, C] int8
    qi = requantise(im, quant_scale)

    # ---- B stage ----
    xr = jnp.transpose(qr, (1, 3, 2, 0))  # [P, C, S, A]
    xi = jnp.transpose(qi, (1, 3, 2, 0))
    cos, sin = coeffs
    beam_re, beam_im = beamform_planes(xr, xi, cos, sin, precision)
    beams = jnp.stack([beam_re, beam_im], axis=-1)

    # ---- X stage: [C, S, A·P] planes over the same quantised voltages ----
    a, p, s, c = qr.shape
    cr = jnp.transpose(qr, (3, 2, 0, 1)).reshape(c, s, a * p)
    ci = jnp.transpose(qi, (3, 2, 0, 1)).reshape(c, s, a * p)
    vis_re, vis_im = correlate_planes(cr, ci, precision)
    return beams, vis_re, vis_im
