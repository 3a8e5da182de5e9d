"""Analytic multi-chip scaling projection — makes the >=80% claim falsifiable.

One physical chip is available in this environment, so 1->N scaling
efficiency cannot be *measured*; this model makes the claim testable
instead of "unmeasured". It combines

- the MEASURED single-chip step time (the flagship bench, chained-ADC
  marginal methodology — pass --step-ms, default from the latest
  committed BENCH artifact), with
- the EXACT per-device ICI byte counts of the three collectives in
  ``parallel/fbengine_sharded.py`` (ppermute FIR halo, all_to_all corner
  turn, psum beam reduction — counted from the shard shapes, not
  estimated), over
- a stated ICI bandwidth assumption (v5e: 1600 Gbps/chip aggregate).

Per-device step time at mesh (ant=as, time=ts), N = as*ts. Two models:

1. unoverlapped (conservative):

    t_N = t_1 / N + t_ici,     t_ici = bytes_per_device / BW_ici

2. interleaved (``ShardedFBEngine(ici_chunks=k)``, implemented and
   equivalence-tested on the 8-device mesh): the corner-turn/psum
   collectives of spectra sub-block j run concurrently with sub-block
   j±1's B-stage compute — a two-resource (ICI links / TensorCore)
   pipeline whose span is bounded by the larger stream plus one chunk
   of fill/drain:

    t_N = t_f/N + max(t_ici_tp, t_b/N) + (t_ici_tp + t_b/N)/k + t_halo

   with t_b the measured single-chip B-stage marginal (the compute the
   collectives interleave with), t_f = t_1 − t_b, and t_ici_tp the
   turn+psum byte time (the halo ppermute stays unoverlapped — it
   precedes the F stage).

(compute splits exactly N ways — every stage's work is linear in the
antenna x spectra grid). Efficiency(N) = t_1 / (N * t_N).

The reference's cost-model precedent: GPUs-per-ingest-rate,
BeamformerCoefficientTest.cu:422-454.

Run: python benchmarks/scaling_model.py [--step-ms 77] [--ici-gbps 1600]
Writes SCALING.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os

# Flagship geometry (BASELINE.md north star).
A, P, C, B_BEAMS, TAPS, S = 80, 2, 32768, 16, 16, 128
FFT = 2 * C


def valid_meshes(n: int):
    """All (ant, time) factorisations the sharded engine accepts."""
    for a in range(1, n + 1):
        if n % a:
            continue
        t = n // a
        if A % a or C % t or S % t or S // t < TAPS - 1:
            continue
        yield a, t


def per_device_ici_bytes(
    ant_size: int, time_size: int, scatter_beams: bool = False
) -> dict:
    """Exact bytes each device SENDS per step, per collective.

    Counted from the shard shapes in _sharded_fb_body (fbengine_sharded):

    - halo: ppermute sends the local tail [A_loc, P, (taps-1)*FFT] int8
      to one neighbour (one hop, zero when time_size == 1).
    - turn: all_to_all over "time" on the int8 (re, im) planes
      [A_loc, P, S_loc, C]; each device keeps 1/time_size and sends the
      rest.
    - psum: ring all-reduce of the partial beams
      [P, C_loc, S, B] f32 x2 (re, im); a ring sends 2*(n-1)/n of the
      buffer per device — or (n-1)/n with scatter_beams=True
      (psum_scatter leaves the dump beam-sharded; the engine supports
      both, fbengine_sharded:psum_scatter).
    """
    a_loc = A // ant_size
    s_loc = S // time_size
    c_loc = C // time_size
    halo = a_loc * P * (TAPS - 1) * FFT if time_size > 1 else 0
    planes = 2 * a_loc * P * s_loc * C  # int8 re+im
    turn = planes * (time_size - 1) // time_size if time_size > 1 else 0
    beams = 2 * P * c_loc * S * B_BEAMS * 4  # f32 re+im partial sums
    factor_ = (1.0 if scatter_beams else 2.0) * (ant_size - 1) / ant_size
    psum = int(beams * factor_) if ant_size > 1 else 0
    return {"halo": halo, "turn": turn, "psum": psum}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--step-ms",
        type=float,
        default=None,
        help="measured single-chip flagship step (default: from BENCH artifact)",
    )
    ap.add_argument(
        "--ici-gbps",
        type=float,
        default=1600.0,
        help="per-chip aggregate ICI bandwidth, Gbit/s (v5e spec: 1600)",
    )
    ap.add_argument(
        "--b-stage-ms",
        type=float,
        default=8.5,
        help="measured single-chip B-stage marginal (ROADMAP, the compute "
        "the interleaved collectives overlap with)",
    )
    ap.add_argument(
        "--ici-chunks",
        type=int,
        default=8,
        help="spectra sub-blocks for the interleaved model "
        "(ShardedFBEngine ici_chunks)",
    )
    ap.add_argument(
        "--source",
        default=None,
        help="provenance note for --step-ms (e.g. the bench run it came from)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    step_ms = args.step_ms
    bench_src = args.source or "--step-ms"
    if step_ms is None:
        import glob

        for name in sorted(
            (os.path.basename(b) for b in glob.glob(os.path.join(root, "BENCH_r0*.json"))),
            reverse=True,
        ):
            path = os.path.join(root, name)
            if os.path.exists(path):
                with open(path) as f:
                    rec = json.load(f)
                if "parsed" in rec:  # driver artifact wraps the JSON line
                    rec = rec["parsed"]
                msps = rec["value"]
                samples = A * P * S * FFT
                step_ms = samples / (msps * 1e6) * 1e3
                bench_src = name
                break
        else:
            raise SystemExit("no BENCH artifact found; pass --step-ms")

    bw = args.ici_gbps / 8 * 1e9  # bytes/s
    rows = []
    for n in (1, 2, 4, 8, 16):
        # Pick the best legal mesh (the sharding layout is ours to
        # choose — the model's job is the best-achievable projection;
        # scatter_beams is an existing engine option).
        best = None
        for ant_size, time_size in valid_meshes(n):
            for scatter in (False, True):
                if scatter and B_BEAMS % ant_size:
                    continue
                bts = per_device_ici_bytes(ant_size, time_size, scatter)
                total = sum(bts.values())
                t_ici_ms = total / bw * 1e3
                t_n = step_ms / n + t_ici_ms
                eff = step_ms / (n * t_n)

                # Interleaved model: turn+psum pipeline against the
                # B-stage compute; halo stays serial (pre-F).
                k = args.ici_chunks
                t_halo_ms = bts["halo"] / bw * 1e3
                t_tp_ms = (bts["turn"] + bts["psum"]) / bw * 1e3
                t_b_n = args.b_stage_ms / n
                t_f_n = (step_ms - args.b_stage_ms) / n
                t_n_ov = (
                    t_f_n
                    + max(t_tp_ms, t_b_n)
                    + (t_tp_ms + t_b_n) / k
                    + t_halo_ms
                )
                eff_ov = step_ms / (n * t_n_ov)
                row = {
                    "chips": n,
                    "mesh": {"ant": ant_size, "time": time_size},
                    "scatter_beams": scatter,
                    "ici_bytes_per_device": bts,
                    "t_ici_ms": round(t_ici_ms, 3),
                    "t_step_ms": round(t_n, 3),
                    "efficiency": round(eff, 4),
                    "t_step_ms_interleaved": round(t_n_ov, 3),
                    "efficiency_interleaved": round(eff_ov, 4),
                }
                if (
                    best is None
                    or row["efficiency_interleaved"]
                    > best["efficiency_interleaved"]
                ):
                    best = row
        if best is not None:
            rows.append(best)

    out = {
        "model": (
            "unoverlapped: t_N = t_1/N + ici_bytes/BW; interleaved "
            "(ici_chunks): t_N = t_f/N + max(t_turn+psum, t_b/N) + "
            "(t_turn+psum + t_b/N)/k + t_halo"
        ),
        "config": {
            "n_ants": A, "n_pols": P, "n_channels": C, "n_beams": B_BEAMS,
            "n_taps": TAPS, "n_spectra": S,
        },
        "assumptions": {
            "single_chip_step_ms": round(step_ms, 2),
            "single_chip_step_source": bench_src,
            "ici_gbps_per_chip": args.ici_gbps,
            "ici_note": (
                "v5e aggregate ICI per chip (spec). 'efficiency' is the "
                "zero-overlap conservative bound; "
                "'efficiency_interleaved' models the implemented "
                "ici_chunks spectra-sub-block interleave "
                "(ShardedFBEngine, equivalence-tested on the 8-device "
                "mesh). DCN-crossing meshes would be slower."
            ),
            "b_stage_ms": args.b_stage_ms,
            "ici_chunks": args.ici_chunks,
            "byte_counts": "exact, from the shard shapes in "
            "parallel/fbengine_sharded._sharded_fb_body",
        },
        "projection": rows,
        "north_star": {
            "claim": ">=80% efficiency 1 -> N>=2 (BASELINE.md)",
            "predicted_8chip_efficiency": next(
                r["efficiency_interleaved"] for r in rows if r["chips"] == 8
            ),
            "predicted_16chip_efficiency": next(
                r["efficiency_interleaved"] for r in rows if r["chips"] == 16
            ),
            "met_in_model": next(
                r["efficiency_interleaved"] for r in rows if r["chips"] == 16
            )
            >= 0.80,
        },
    }
    path = args.out or os.path.join(root, "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["projection"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
