"""Distributed F+B pipeline over a ("ant", "time") mesh via shard_map.

The three reference parallelism mechanisms (SURVEY.md §2.7) become three
XLA collectives inside one jitted step:

1. **Overlap-save halo exchange** (time-block split of the sample stream,
   the reference's BeamformerParameters.h:44-51 blocking): each time shard
   receives the last ``(n_taps−1)·fft_size`` samples of its left neighbour
   via ``lax.ppermute`` before the PFB FIR. The exchange is circular — in
   steady-state streaming, shard 0's halo is the previous chunk's tail,
   which lives on the last shard.
2. **Distributed corner turn** (the xeng_id channel split,
   coeff_generator.py:49-53): ``lax.all_to_all`` over the "time" axis
   swaps spectra-sharding for channel-sharding — each device ends up with
   all time samples of its channel slice, exactly what a multicast
   subscription gave an X-engine in the reference.
3. **Antenna-sum reduction** (the warp-shuffle tree,
   BeamformerKernels.cu:318-341): antennas are sharded over "ant"; each
   device beamforms its antenna subset and ``lax.psum`` over "ant"
   completes the coherent sum across ICI.

Coarse delay is an ingest-side concern (the host feed aligns whole-sample
offsets before sharding, as the NIC/chunking layer did in the reference);
fine delay and fringe phase are applied in-shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dpdk_dc_sand_tpu.config import ArrayConfig
from dpdk_dc_sand_tpu.golden.pfb import pfb_window
from dpdk_dc_sand_tpu.models.fbengine import _coeff_blocks
from dpdk_dc_sand_tpu.ops.beamform import beamform_planes
from dpdk_dc_sand_tpu.ops.coeff_gen import steering_key
from dpdk_dc_sand_tpu.ops.correlate import correlate_planes
from dpdk_dc_sand_tpu.ops.delay import apply_fine_delay
from dpdk_dc_sand_tpu.ops.pfb import pfb_channelise
from dpdk_dc_sand_tpu.ops.requant import requantise


class ShardedFBEngine:
    """F+B pipeline sharded over a 2D ``("ant", "time")`` mesh.

    Parameters
    ----------
    cfg:
        System configuration. ``cfg.n_ants`` must divide by the "ant" axis
        size; ``cfg.n_channels`` and ``n_spectra`` by the "time" axis size;
        ``n_spectra // time_size ≥ cfg.n_taps − 1`` so one neighbour's halo
        suffices.
    mesh:
        Mesh from :func:`dpdk_dc_sand_tpu.parallel.make_mesh`.
    """

    def __init__(
        self,
        cfg: ArrayConfig,
        mesh: Mesh,
        n_spectra: int = 256,
        quant_scale: float = 1.0 / 16.0,
        precision: str = "f32",
        use_pallas: bool | None = None,
        emit_visibilities: bool = False,
        scatter_beams: bool = False,
        fengine: str = "auto",
        fengine_interpret: bool = False,
        bstage: str = "auto",
        emit_planes: bool = False,
        ct_batch_a: bool | str = "auto",
        fengine_rolling: bool | str = "auto",
        fengine_pipeline: bool | str = "auto",
        ici_chunks: int | str = "auto",
        fengine_s_blk: int | None = None,
        fengine_vmem_mb: int | None = None,
        fengine_tapouter: bool | str = False,
        fengine_bfuse: bool | str = False,
        fengine_skew: bool = False,
        rowed_ingest: bool | str = "auto",
        fengine_flat_out: bool | str = "auto",
    ) -> None:
        if fengine not in ("auto", "xla", "fused", "fused_f32"):
            raise ValueError(f"unknown fengine backend {fengine!r}")
        if bstage not in ("auto", "planar", "turned", "fused"):
            raise ValueError(f"unknown bstage backend {bstage!r}")
        ant_size = mesh.shape["ant"]
        time_size = mesh.shape["time"]
        if fengine == "auto" or bstage == "auto":
            # Resolve against the PER-SHARD geometry the body actually
            # sees: each shard channelises the full band for its time
            # slice (fused F), then after the all_to_all the corner turn
            # handles all spectra of its channel slice (turned B).
            import jax as _jax

            from dpdk_dc_sand_tpu.ops.corner_turn import corner_turn_supported
            from dpdk_dc_sand_tpu.ops.fengine_pallas import fused_supported

            pallas_ok = (
                fengine_interpret or _jax.default_backend() == "tpu"
            )
            if fengine == "auto":
                frames_shape = (
                    cfg.n_ants // max(ant_size, 1),
                    cfg.n_pols,
                    n_spectra // max(time_size, 1) + cfg.n_taps - 1,
                    cfg.fft_size,
                )
                fengine = (
                    "fused"
                    if pallas_ok
                    and fused_supported(frames_shape, cfg.n_taps, cfg.n_channels)
                    else "xla"
                )
            if bstage == "auto":
                from dpdk_dc_sand_tpu.ops.bstage_pallas import (
                    bstage_fused_supported,
                )

                a_loc = cfg.n_ants // max(ant_size, 1)
                c_loc = cfg.n_channels // max(time_size, 1)
                # "turned" over "fused": same measured ordering as the
                # single-chip engine (see models/fbengine.py).
                if pallas_ok and corner_turn_supported(
                    a_loc, cfg.n_pols, n_spectra, c_loc
                ):
                    bstage = "turned"
                elif pallas_ok and bstage_fused_supported(
                    a_loc, cfg.n_pols, n_spectra, cfg.n_beams, c_loc
                ):
                    bstage = "fused"
                else:
                    bstage = "planar"
        if ct_batch_a == "auto":
            # Same measured choice as the single-chip engine (+7% F-only,
            # bit-identical output — models/fbengine.resolve_backends).
            ct_batch_a = fengine in ("fused", "fused_f32")
        if fengine_rolling == "auto":
            from dpdk_dc_sand_tpu.ops.fengine_pallas import rolling_supported

            fengine_rolling = fengine in (
                "fused",
                "fused_f32",
            ) and rolling_supported(cfg.n_channels)
        if fengine_pipeline == "auto":
            # Same measured default as the single-chip engine (51.4 vs
            # 54.0 ms F-only; sane compile since the two-buffer
            # reformulation) — resolved against the PER-SHARD spectra.
            from dpdk_dc_sand_tpu.ops.fengine_pallas import (
                pipeline_auto_k,
            )

            fengine_pipeline = (
                pipeline_auto_k(
                    n_spectra // max(time_size, 1), cfg.n_channels
                )
                if fengine in ("fused", "fused_f32") and bool(ct_batch_a)
                else 0
            )
        self.fengine = fengine
        self.bstage = bstage
        self.ct_batch_a = bool(ct_batch_a)
        self.fengine_rolling = bool(fengine_rolling)
        self.fengine_pipeline = int(fengine_pipeline)
        #: Kernel-tuning overrides, same contract as FBEngine.
        self.fengine_s_blk = fengine_s_blk
        self.fengine_vmem_mb = fengine_vmem_mb
        self.fengine_tapouter = fengine_tapouter
        self.fengine_bfuse = fengine_bfuse
        self.fengine_skew = fengine_skew
        if rowed_ingest == "auto":
            # Wire-rowed ingest (the fused kernel's own HBM view,
            # [A, P, rows, N2]): on wherever the fused direct-CT kernel
            # runs — a flat-born stream pays a whole-stream relayout
            # copy per step (benchmarks/dma_bisect.py, -25.7 ms at the
            # single-chip flagship).
            from dpdk_dc_sand_tpu.ops.fengine_pallas import (
                ingest_alignment,
            )

            # (fft_size is always a multiple of N2 in ct form, so the
            # halo is whole rows by construction — asserted again where
            # halo_rows is computed in _sharded_fb_body.)
            n2a = ingest_alignment(cfg.fft_size)
            rowed_ingest = (
                fengine in ("fused", "fused_f32") and n2a is not None
            )
        self.rowed_ingest = bool(rowed_ingest)
        if fengine_flat_out == "auto":
            # Same consumer-layout emission as the single-chip engines
            # (full-lane geometries only; flat_out_supported).
            from dpdk_dc_sand_tpu.ops.fengine_pallas import flat_out_auto

            fengine_flat_out = fengine in (
                "fused", "fused_f32"
            ) and flat_out_auto(
                cfg.n_channels,
                n_spectra // max(time_size, 1),
                fengine_s_blk,
                bool(ct_batch_a),
            )
        self.fengine_flat_out = bool(fengine_flat_out)
        if cfg.n_ants % ant_size:
            raise ValueError("n_ants must divide the ant mesh axis")
        if cfg.n_channels % time_size or n_spectra % time_size:
            raise ValueError("n_channels and n_spectra must divide the time axis")
        if n_spectra // time_size < cfg.n_taps - 1:
            raise ValueError("time shards thinner than the FIR halo")
        if scatter_beams and cfg.n_beams % ant_size:
            raise ValueError("scatter_beams needs n_beams divisible by the ant axis")
        if emit_planes and (emit_visibilities or scatter_beams):
            raise ValueError("emit_planes excludes the B/X stages")
        if ici_chunks == "auto":
            # Committed-projection default (SCALING.json models k=8 at
            # the flagship geometry): the largest k in {8, 4, 2} that
            # divides the per-device spectra count, so the F->B
            # collective/compute interleave is ON wherever it applies.
            # 1 (off) on a single-device mesh — no collectives to hide —
            # and in the emit modes the interleave doesn't cover.
            per_dev = n_spectra // max(time_size, 1)
            ici_chunks = 1
            if (
                ant_size * time_size > 1
                and not (emit_planes or emit_visibilities)
            ):
                from dpdk_dc_sand_tpu.ops.bstage_pallas import (
                    bstage_fused_supported,
                )
                from dpdk_dc_sand_tpu.ops.corner_turn import (
                    corner_turn_supported,
                )

                a_loc = cfg.n_ants // max(ant_size, 1)
                c_loc = cfg.n_channels // max(time_size, 1)
                for k in (8, 4, 2):
                    if per_dev % k or per_dev // k < 1:
                        continue
                    # The per-chunk B stage sees S/k spectra — the
                    # bstage resolution validated the MONOLITHIC S, so
                    # an auto k must re-check the chunked geometry or a
                    # working config would start failing Mosaic
                    # lowering under the new default (review round 5).
                    s_chunk = n_spectra // k
                    if bstage == "turned" and not corner_turn_supported(
                        a_loc, cfg.n_pols, s_chunk, c_loc
                    ):
                        continue
                    if bstage == "fused" and not bstage_fused_supported(
                        a_loc, cfg.n_pols, s_chunk, cfg.n_beams, c_loc
                    ):
                        continue
                    ici_chunks = k
                    break
        self.ici_chunks = int(ici_chunks)
        if self.ici_chunks < 1:
            raise ValueError("ici_chunks must be >= 1")
        if self.ici_chunks > 1 and (n_spectra // max(time_size, 1)) % (
            self.ici_chunks
        ):
            raise ValueError(
                "ici_chunks must divide the per-device spectra count "
                f"({n_spectra // max(time_size, 1)})"
            )
        if self.ici_chunks > 1 and (emit_planes or emit_visibilities):
            raise ValueError(
                "ici_chunks interleaving applies to the F→B step only"
            )
        self.cfg = cfg
        self.mesh = mesh
        self.n_spectra = n_spectra
        self.emit_visibilities = emit_visibilities
        self.emit_planes = emit_planes
        self.scatter_beams = scatter_beams
        self.window = jnp.asarray(np.asarray(pfb_window(cfg.n_taps, cfg.fft_size)))

        halo_len = (cfg.n_taps - 1) * cfg.fft_size
        body = functools.partial(
            _sharded_fb_body,
            window=self.window,
            cfg=cfg,
            time_size=time_size,
            halo_len=halo_len,
            quant_scale=quant_scale,
            precision=precision,
            use_pallas=use_pallas,
            emit_visibilities=emit_visibilities,
            scatter_beams=scatter_beams,
            fengine=fengine,
            fengine_interpret=fengine_interpret,
            bstage=bstage,
            emit_planes=emit_planes,
            ct_batch_a=self.ct_batch_a,
            fengine_rolling=self.fengine_rolling,
            fengine_pipeline=self.fengine_pipeline,
            ici_chunks=self.ici_chunks,
            fengine_s_blk=fengine_s_blk,
            fengine_vmem_mb=fengine_vmem_mb,
            fengine_tapouter=fengine_tapouter,
            fengine_bfuse=fengine_bfuse,
            fengine_skew=fengine_skew,
            fengine_flat_out=self.fengine_flat_out,
        )
        # With scatter_beams the antenna reduction is a reduce_scatter
        # (psum_scatter): half the ICI bytes of the all-reduce and the
        # dump stays beam-sharded over "ant" — each device owns
        # n_beams/ant_size beams of its channel slice.
        beam_out = P(None, "time", None, "ant" if scatter_beams else None, None)
        if emit_planes:
            # Channel-sharded int8 (re, im) planes — the distributed
            # F-engine product (what an X/B engine would ingest off the
            # multicast fabric in the reference deployment).
            out_specs = (P("ant", None, None, "time"),) * 2
        elif emit_visibilities:
            out_specs = (beam_out, P("time", None, None), P("time", None, None))
        else:
            out_specs = beam_out
        def _make(adc_spec):
            return shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    adc_spec,
                    P("ant"),  # frac_delays [A]
                    P("ant"),  # phases [A]
                    P("time", None, "ant"),  # cos [C, B, A]
                    P("time", None, "ant"),  # sin [C, B, A]
                ),
                out_specs=out_specs,
                check_vma=False,
            )

        # adc arrives either flat [A, P, N] or wire-rowed
        # [A, P, rows, N2] (time-sharded on samples/rows respectively);
        # __call__ dispatches on ndim.
        sharded = _make(P("ant", None, "time"))
        sharded_rowed = (
            _make(P("ant", None, "time", None)) if self.rowed_ingest else None
        )

        # Steering planes are regenerated only on delay updates (the
        # 256-accumulation reuse cadence) and enter the step pre-sharded.
        # Same generator as the single-chip engine (_coeff_blocks →
        # ops.steering_coeffs): one copy of the rotation math, with the
        # delay/phase-rate time extrapolation and ?beam-weights folding
        # (BeamformerKernels.cu:121-189; corr3_servlet.py:140-153).
        self._coeff_fn = jax.jit(
            functools.partial(_coeff_blocks, cfg=cfg),
            out_shardings=(
                NamedSharding(mesh, P("time", None, "ant")),
            ) * 2,
        )
        self._coeffs = None
        self._coeff_key = None
        self._step = jax.jit(sharded)
        self._step_rowed = (
            jax.jit(sharded_rowed) if sharded_rowed is not None else None
        )
        self.sample_sharding = NamedSharding(mesh, P("ant", None, "time"))
        self.sample_sharding_rowed = NamedSharding(
            mesh, P("ant", None, "time", None)
        )
        self.beam_sharding = NamedSharding(mesh, beam_out)

    @property
    def samples_in(self) -> int:
        """Global ADC samples per step (history arrives via the halo)."""
        return self.n_spectra * self.cfg.fft_size

    def __call__(
        self,
        adc: jax.Array,
        frac_delays: jax.Array,
        phases: jax.Array,
        delay_vals: jax.Array,
        ant_weights=None,
        t_s: float = 0.0,
    ) -> jax.Array:
        """One distributed step.

        adc ``[n_ants, n_pols, samples_in]`` int8 (coarse-aligned);
        frac_delays/phases ``[n_ants]`` f32; delay_vals ``[beam][ant][4]``.
        Returns ``[n_pols, n_channels, n_spectra, n_beams, 2]`` f32 beams,
        channel-sharded over the "time" mesh axis.
        """
        self.set_beam_delays(delay_vals, ant_weights=ant_weights, t_s=t_s)
        cos, sin = self._coeffs
        if getattr(adc, "ndim", 3) == 4:
            if self._step_rowed is None:
                raise ValueError(
                    "wire-rowed adc needs a fused direct-CT geometry "
                    "(rowed_ingest resolved off for this engine)"
                )
            return self._step_rowed(adc, frac_delays, phases, cos, sin)
        return self._step(adc, frac_delays, phases, cos, sin)

    def set_beam_delays(self, delay_vals, ant_weights=None, t_s: float = 0.0) -> None:
        """(Re)generate sharded steering planes from delay polynomials.

        Same contract as :meth:`FBEngine.set_beam_delays`: ``t_s`` seconds
        past the polynomial epoch extrapolates the solution via the
        delay/phase rates (traced — advancing time never recompiles);
        ``ant_weights`` folds per-antenna magnitudes into the planes (the
        servlet's ``?beam-weights`` fan-out contract)."""
        key = steering_key(delay_vals, ant_weights, t_s)
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

    def example_inputs(self, seed: int = 2021, rowed: bool = False):
        rng = np.random.default_rng(seed)
        cfg = self.cfg
        adc = rng.integers(
            -64, 64, size=(cfg.n_ants, cfg.n_pols, self.samples_in), dtype=np.int8
        )
        if rowed:
            from dpdk_dc_sand_tpu.ops.fengine_pallas import ingest_alignment

            n2 = ingest_alignment(cfg.fft_size)
            if n2 is None or not self.rowed_ingest:
                raise ValueError(
                    "rowed example inputs need the fused direct-CT "
                    "geometry (rowed_ingest resolved off for this "
                    "engine)"
                )
            adc = adc.reshape(cfg.n_ants, cfg.n_pols, -1, n2)
        fd = rng.uniform(-0.5, 0.5, cfg.n_ants).astype(np.float32)
        ph = (-np.pi * fd / 2).astype(np.float32)
        dv = np.zeros((cfg.n_beams, cfg.n_ants, 4), np.float32)
        dv[..., 0] = rng.uniform(0, 5e-9, dv.shape[:-1])
        dv[..., 2] = rng.uniform(-np.pi, np.pi, dv.shape[:-1])
        return adc, fd, ph, dv


def _sharded_fb_body(
    adc_l: jax.Array,  # [A_loc, P, n_loc]
    frac_l: jax.Array,  # [A_loc]
    phase_l: jax.Array,  # [A_loc]
    cos_l: jax.Array,  # [C_loc, B, A_loc]
    sin_l: jax.Array,
    *,
    window: jax.Array,
    cfg: ArrayConfig,
    time_size: int,
    halo_len: int,
    quant_scale: float,
    precision: str,
    use_pallas: bool | None,
    emit_visibilities: bool = False,
    scatter_beams: bool = False,
    fengine: str = "xla",
    fengine_interpret: bool = False,
    bstage: str = "planar",
    emit_planes: bool = False,
    ct_batch_a: bool = False,
    fengine_rolling: bool = False,
    fengine_pipeline: bool = False,
    ici_chunks: int = 1,
    fengine_s_blk: int | None = None,
    fengine_vmem_mb: int | None = None,
    fengine_tapouter: bool | str = False,
    fengine_bfuse: bool | str = False,
    fengine_skew: bool = False,
    fengine_flat_out: bool = False,
) -> jax.Array:
    # 1. Overlap-save halo: previous time shard's tail (circular).
    perm = [(i, (i + 1) % time_size) for i in range(time_size)]
    rowed = adc_l.ndim == 4
    if rowed:
        # Wire-rowed stream [A_loc, P, rows, N2]: the halo is whole
        # rows (halo_len is a multiple of N2 for every ct geometry —
        # truncation here would silently corrupt the overlap-save halo).
        assert halo_len % adc_l.shape[-1] == 0, (halo_len, adc_l.shape)
        halo_rows = halo_len // adc_l.shape[-1]
        halo = lax.ppermute(adc_l[..., -halo_rows:, :], "time", perm)
        ext = jnp.concatenate([halo, adc_l], axis=-2)
    else:
        halo = lax.ppermute(adc_l[..., -halo_len:], "time", perm)
        ext = jnp.concatenate([halo, adc_l], axis=-1)

    # 2. Local F-stage.
    if fengine != "xla":
        # Fused Pallas F chain (ops/fengine_pallas.py) — the honest-
        # streaming fast path on TPU (XLA's rFFT materialises ~GB
        # four-step temps; see ROADMAP). Each shard channelises the
        # full band for its time slice, so no channel offset here.
        from dpdk_dc_sand_tpu.ops.fengine_pallas import fengine_fused

        n_ants_loc = ext.shape[0]
        frames = (
            ext
            if rowed
            else ext.reshape(n_ants_loc, cfg.n_pols, -1, cfg.fft_size)
        )
        qr, qi = fengine_fused(
            frames,
            window,
            jnp.broadcast_to(frac_l[:, None], (n_ants_loc, cfg.n_pols)),
            jnp.broadcast_to(phase_l[:, None], (n_ants_loc, cfg.n_pols)),
            n_channels=cfg.n_channels,
            quant_scale=quant_scale,
            dft_dtype="float32" if fengine == "fused_f32" else "bfloat16",
            interpret=fengine_interpret,
            ct_batch_a=ct_batch_a,
            rolling=fengine_rolling,
            ct_pipeline=fengine_pipeline,
            s_blk=fengine_s_blk,
            vmem_limit_mb=fengine_vmem_mb,
            fir_tapouter=fengine_tapouter,
            ct_bfuse=fengine_bfuse,
            ct_skew=fengine_skew,
            rowed=rowed,
            flat_out=fengine_flat_out,
        )  # [A_loc, P, S_loc, C] int8 planes
    else:
        if rowed:
            ext = ext.reshape(*ext.shape[:2], -1)
        spectra = pfb_channelise(
            ext, window, n_channels=cfg.n_channels, use_pallas=use_pallas
        )  # [A_loc, P, S_loc, C]
        re, im = apply_fine_delay(
            jnp.real(spectra),
            jnp.imag(spectra),
            frac_l[:, None],
            phase_l[:, None],
            n_channels=cfg.n_channels,
        )
        # (re, im) stay separate int8 planes through the F→B handoff — the
        # trailing-2 stack forces padded tiled layouts whose copies
        # back-propagate through the FFT chain (benchmarks/fuse_boundary2.py).
        qr = requantise(re, quant_scale)  # [A_loc, P, S_loc, C] int8
        qi = requantise(im, quant_scale)

    # 3+4. Distributed corner turn (spectra-sharding -> channel-sharding)
    # then partial beamform over local antennas and the antenna-axis
    # collective: all-reduce (psum) for replicated beams, or
    # reduce-scatter (psum_scatter over the beam axis) — the warp-shuffle
    # tree of BeamformerKernels.cu:318-341 at ICI scale.
    def turn(qr_c, qi_c):
        a = lax.all_to_all(
            qr_c, "time", split_axis=3, concat_axis=2, tiled=True
        )
        b = lax.all_to_all(
            qi_c, "time", split_axis=3, concat_axis=2, tiled=True
        )
        return a, b

    def b_stage(ar, ai):
        # -> (pre, pim) partial beams [P, C_loc, S, B] for one spectra
        # sub-block, before the antenna reduction.
        if bstage == "fused":
            # Corner turn + block-diagonal dot in one Pallas kernel —
            # the single-chip fastest B path, per shard
            # (ops/bstage_pallas.py).
            from dpdk_dc_sand_tpu.ops.bstage_pallas import (
                beamform_turned_fused,
            )
            from dpdk_dc_sand_tpu.ops.coeff_gen import steering_coeff_blockcat

            blocks = steering_coeff_blockcat(cos_l, sin_l)
            return beamform_turned_fused(
                ar, ai, blocks, n_pols=cfg.n_pols, precision=precision,
                interpret=fengine_interpret,
            )
        if bstage == "turned":
            # Local corner turn via the Pallas kernel (the XLA turn runs
            # at ~34 GB/s effective; see ops/corner_turn.py) + one
            # folded dot.
            from dpdk_dc_sand_tpu.ops.beamform import beamform_turned
            from dpdk_dc_sand_tpu.ops.coeff_gen import steering_coeff_blockcat
            from dpdk_dc_sand_tpu.ops.corner_turn import corner_turn_planes

            x_t = corner_turn_planes(ar, ai, interpret=fengine_interpret)
            blocks = steering_coeff_blockcat(cos_l, sin_l)
            return beamform_turned(
                x_t, blocks, n_pols=cfg.n_pols, precision=precision
            )
        xr_c = jnp.transpose(ar, (1, 3, 2, 0))
        xi_c = jnp.transpose(ai, (1, 3, 2, 0))
        return beamform_planes(xr_c, xi_c, cos_l, sin_l, precision)

    def reduce_beams(pre, pim):
        if scatter_beams:
            pre = lax.psum_scatter(
                pre, "ant", scatter_dimension=3, tiled=True
            )
            pim = lax.psum_scatter(
                pim, "ant", scatter_dimension=3, tiled=True
            )
        else:
            pre = lax.psum(pre, "ant")
            pim = lax.psum(pim, "ant")
        return pre, pim

    if ici_chunks > 1 and not emit_planes and not emit_visibilities:
        # ICI/compute interleave: the local SPECTRA axis is split into
        # sub-blocks, each corner-turned, beamformed and reduced
        # independently — spectra chunking keeps channel ownership (and
        # hence the steering-plane sharding and output layout) exactly
        # as in the monolithic step, so the results are bit-identical.
        # The dependence structure lets XLA's latency-hiding scheduler
        # run chunk j+1's all_to_all and chunk j-1's psum concurrently
        # with chunk j's B-stage compute instead of serialising one
        # monolithic collective against the whole step
        # (benchmarks/scaling_model.py models the overlapped cost).
        s_loc = qr.shape[2]
        per = s_loc // ici_chunks
        parts = []
        for j in range(ici_chunks):
            sl = slice(j * per, (j + 1) * per)
            ar, ai = turn(qr[:, :, sl], qi[:, :, sl])
            parts.append(b_stage(ar, ai))
        reduced = [reduce_beams(pre, pim) for pre, pim in parts]

        def order(chunks):
            # Chunk j's gathered spectra are device-major [(d, i'), …];
            # the monolithic order is (d, j, i'). One stacked reshape
            # restores it (a single fused copy over the beams).
            p, c, _, b = chunks[0].shape
            stacked = jnp.stack(
                [x.reshape(p, c, time_size, per, b) for x in chunks],
                axis=3,
            )  # [P, C_loc, T, k, per, B]
            return stacked.reshape(p, c, time_size * ici_chunks * per, b)

        pre = order([r[0] for r in reduced])
        pim = order([r[1] for r in reduced])
        return jnp.stack([pre, pim], axis=-1)

    ar, ai = turn(qr, qi)
    if emit_planes:
        # Distributed F-engine product: [A_loc, P, S_full, C_loc] int8
        # (re, im) planes, channel-sharded — ready for SPEAD egress.
        return ar, ai
    xr = jnp.transpose(ar, (1, 3, 2, 0))
    xi = jnp.transpose(ai, (1, 3, 2, 0))

    pre, pim = b_stage(ar, ai)
    pre, pim = reduce_beams(pre, pim)
    beams = jnp.stack([pre, pim], axis=-1)
    if not emit_visibilities:
        return beams

    # 5. X stage: correlation needs all antenna pairs, so gather the
    # channel slice's voltages across the "ant" axis (the unavoidable
    # all-pairs traffic), then integrate the local channels.
    from dpdk_dc_sand_tpu.ops.xcorr_pallas import (
        correlate_planes_fused,
        xcorr_fused_supported,
    )

    a_loc = ar.shape[0]
    a_full = a_loc * lax.psum(1, "ant")
    pallas_ok = fengine_interpret or jax.default_backend() == "tpu"
    if pallas_ok and xcorr_fused_supported(
        a_full, cfg.n_pols, ar.shape[2], ar.shape[3]
    ):
        # Gather the int8 planes and run the one-pass Pallas visibility
        # kernel (in-VMEM turn + stacked gram): no XLA transpose, no
        # gram intermediates in HBM — same ICI bytes as the plane-wise
        # gather below (identical data, different axis).
        gr = lax.all_gather(ar, "ant", axis=0, tiled=True)
        gi = lax.all_gather(ai, "ant", axis=0, tiled=True)
        vre, vim = correlate_planes_fused(
            gr, gi, interpret=fengine_interpret,
            int8_mxu=not fengine_interpret,
        )
        return beams, vre, vim
    fr = lax.all_gather(xr, "ant", axis=3, tiled=True)
    fi = lax.all_gather(xi, "ant", axis=3, tiled=True)
    p, c_loc, s_full, a_full = fr.shape
    cr = jnp.transpose(fr, (1, 2, 3, 0)).reshape(c_loc, s_full, a_full * p)
    ci = jnp.transpose(fi, (1, 2, 3, 0)).reshape(c_loc, s_full, a_full * p)
    vre, vim = correlate_planes(cr, ci, precision)
    return beams, vre, vim
