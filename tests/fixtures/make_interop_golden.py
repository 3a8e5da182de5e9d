"""Regenerate the byte-golden interop fixtures (tests/fixtures/*.json).

Why these exist: the reference speaks SPEAD through the real spead2
library (fgpu_send_prototype/fgpu_send_prototype.py:15-19) and KATCP
through aiokatcp (ngkcs/ngkcs/corr3_servlet.py:8). This environment has
no package egress — ``pip install spead2 aiokatcp`` fails with DNS
resolution errors (attempt log frozen in ``interop_golden.json``
["pip_attempt"]) — so true library round-trips cannot run here. The
strongest committable substitute is to FREEZE the exact bytes the codecs
emit today, spec-checked field by field (tests/test_spead64.py validated
the layout against the SPEAD-64-48 flavour spec and an independently
written reference parser): any codec drift after this point fails
loudly, and the frozen bytes are the test vectors for a first real
spead2/aiokatcp round-trip when an environment with the libraries
exists.

Run: PYTHONPATH=/root/repo python tests/fixtures/make_interop_golden.py
"""

from __future__ import annotations

import json
import os

import numpy as np


def build() -> dict:
    from dpdk_dc_sand_tpu.control.protocol import Message
    from dpdk_dc_sand_tpu.stream.spead64 import (
        packetize64,
        stream_stop_packet,
    )

    cases = []
    for name, size, heap_cnt, ts, chan, mtu in (
        ("multi_packet", 10000, 42, 123456789, 4096, 4096),
        ("single_packet", 512, 7, 1712000000, 0, 4096),
        ("exact_mtu", 4096, 2**40 + 5, 2**45 - 1, 24576, 4096),
    ):
        payload = (np.arange(size, dtype=np.int64) % 251).astype(np.uint8)
        pkts = packetize64(
            payload, heap_cnt, timestamp=ts, channel_offset=chan,
            mtu_payload=mtu,
        )
        cases.append(
            {
                "name": name,
                "payload_size": size,
                "heap_cnt": heap_cnt,
                "timestamp": ts,
                "channel_offset": chan,
                "mtu_payload": mtu,
                "packets_hex": [p.hex() for p in pkts],
            }
        )

    katcp = [
        Message(Message.REQUEST, "beam-weights", "1.0", "0.5", mid=7),
        Message(Message.REPLY, "beam-weights", "ok", mid=7),
        Message(Message.INFORM, "interface-changed", "sensor-list"),
        Message(
            Message.REQUEST,
            "set-name",
            "with space\nand\tctl\\chars\x00\x1b",
        ),
        Message(Message.REPLY, "watchdog", "ok"),
    ]

    return {
        "pip_attempt": {
            "date": "2026-08-21",
            "command": "pip install spead2 aiokatcp",
            "outcome": (
                "NameResolutionError: Failed to resolve 'pypi.org' "
                "([Errno -2] Name or service not known); ERROR: No "
                "matching distribution found for spead2 — zero-egress "
                "environment, library interop not runnable here"
            ),
        },
        "spead64": cases,
        "stop_packet_hex": stream_stop_packet().hex(),
        "katcp_lines_hex": [m.encode().hex() for m in katcp],
    }


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "interop_golden.json")
    with open(out, "w") as f:
        json.dump(build(), f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
