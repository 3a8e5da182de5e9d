"""Rewrite committed-number quotes in the docs from the artifacts.

Round-4 review found three different transport figures for one artifact
across ROADMAP.md, PARITY.md and the artifact itself — documents drift,
measurements don't. This script makes the artifacts the single source of
truth: every doc line carrying a ``<!-- autonum:KEY -->`` marker has the
text before the marker regenerated from the committed JSON artifacts.

Run after refreshing any artifact:
    python benchmarks/sync_quotes.py [--check]

``--check`` exits non-zero if any doc is stale (CI-friendly).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load(path):
    with open(path) as f:
        return json.load(f)


def build_quotes() -> dict:
    q = {}
    udp = _load(os.path.join(ROOT, "benchmarks", "UDP_RATE.json"))
    best = udp["best_mode"]
    ll = udp.get("best_lossless") or {}
    q["udp-best"] = (
        f"transport ({udp['transport'].split(' (')[0].split(' +')[0]}"
        f", 2-CPU host): {best} {udp['best_tx_gbps']} Gbps blast TX"
        + (
            f" / {ll['rx_gbps']} Gbps lossless paced"
            if ll
            else " / no lossless point"
        )
    )
    ws = udp.get("worker_scaling", [])
    if ws:
        pts = ", ".join(
            f"{w['workers']}w={w.get('max_lossless_gbps')}"
            for w in ws
        )
        q["udp-workers"] = f"worker scaling, max lossless Gbps: {pts}"

    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r0*.json")))
    if benches:
        b = _load(benches[-1])
        b = b.get("parsed", b)  # driver artifacts nest under "parsed"
        q["flagship"] = (
            f"flagship PFB+beamform: {b['value']} Msamples/s/chip "
            f"({b['vs_baseline']}x realtime; {os.path.basename(benches[-1])})"
        )
    rf = os.path.join(ROOT, "ROOFLINE.json")
    if os.path.exists(rf):
        r = _load(rf)
        q["roofline"] = (
            f"{r['fraction_of_roofline']:.0%} of the "
            f"{r['ceiling_msamples_per_s']} Ms/s {r['binding_resource']}-"
            "bound ceiling"
        )
    return q


MARK = re.compile(r"^(\s*[-|*]?\s*)(.*?)(\s*<!-- autonum:([\w-]+) -->)(.*)$")


def sync(check: bool = False) -> int:
    quotes = build_quotes()
    stale = 0
    for doc in ("ROADMAP.md", "PARITY.md", "README.md"):
        path = os.path.join(ROOT, doc)
        if not os.path.exists(path):
            continue
        out, changed = [], False
        with open(path) as f:
            for line in f:
                m = MARK.match(line.rstrip("\n"))
                if m and m.group(4) in quotes:
                    new = (
                        f"{m.group(1)}{quotes[m.group(4)]}"
                        f"{m.group(3)}{m.group(5)}"
                    )
                    if new != line.rstrip("\n"):
                        changed = True
                    out.append(new + "\n")
                else:
                    out.append(line)
        if changed:
            stale += 1
            if not check:
                with open(path, "w") as f:
                    f.writelines(out)
                print(f"updated {doc}")
            else:
                print(f"STALE: {doc}")
    if not stale:
        print("docs in sync with artifacts")
    return 1 if (check and stale) else 0


if __name__ == "__main__":
    sys.exit(sync(check="--check" in sys.argv))
