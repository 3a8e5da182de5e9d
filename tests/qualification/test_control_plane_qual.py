"""Control-plane qualification (features/control_plane.feature).

Evidence for the aggregation contract over the real TCP path: fan-out,
sensor mirroring with renaming, and failure propagation — the
multi-node-without-a-cluster harness of the reference
(ngkcs/testing/test_corr3_servlet.py:14-147).
"""

import asyncio

import pytest

from dpdk_dc_sand_tpu.control import (
    Client,
    CorrServlet,
    FailReply,
    FakeNode,
    Status,
)

N_ANTS = 4


def _run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


async def _fleet(n_nodes=3, fail_one=False):
    nodes = [FakeNode(fail=(fail_one and i == 1)) for i in range(n_nodes)]
    for n in nodes:
        await n.start()
    servlet = CorrServlet(
        "corr3",
        n_antennas=N_ANTS,
        engine_endpoints=[("127.0.0.1", n.port) for n in nodes],
    )
    await servlet.start()
    client = await Client("127.0.0.1", servlet.port).connect()
    return nodes, servlet, client


async def _teardown(nodes, servlet, client):
    await client.close()
    await servlet.stop()
    for n in nodes:
        await n.stop()


def test_beam_weights_reach_fleet(report):
    async def scenario():
        report.step("Given", "a servlet fronting three engine nodes")
        nodes, servlet, client = await _fleet()
        try:
            weights = [1.5] * N_ANTS
            report.step(
                "When", "the operator sets beam weights", weights=weights
            )
            await client.request("beam-weights", *weights)
            received = [n.last_weights for n in nodes]
            report.step(
                "Then", "every node receives the same weights",
                nodes_updated=sum(bool(n.beam_weights_set) for n in nodes),
            )
            report.detail_entry("per_node_weights", received)
            assert all(w == weights for w in received)
        finally:
            await _teardown(nodes, servlet, client)

    _run(scenario())


def test_sensor_mirroring(report):
    async def scenario():
        report.step("Given", "a servlet fronting three engine nodes")
        nodes, servlet, client = await _fleet()
        try:
            report.step(
                "When", "a node's device-status sensor changes"
            )
            nodes[1].device_status.set("degraded", Status.WARN)
            await asyncio.sleep(0.3)
            mirrored = servlet.sensors["node1.device-status"]
            report.step(
                "Then",
                "the servlet republishes it as nodeN.device-status",
                mirrored_value=str(mirrored.value),
                mirrored_status=str(mirrored.status),
            )
            report.detail_entry(
                "mirrored_names",
                sorted(sn.name for sn in servlet.sensors if sn.name.startswith("node1.")),
            )
            assert mirrored.value == "degraded"
        finally:
            await _teardown(nodes, servlet, client)

    _run(scenario())


def test_node_failure_surfaces(report):
    async def scenario():
        report.step(
            "Given", "a servlet fronting three engine nodes with one failing"
        )
        nodes, servlet, client = await _fleet(fail_one=True)
        try:
            report.step("When", "the operator sets beam weights")
            with pytest.raises(FailReply) as exc:
                await client.request("beam-weights", *([1.0] * N_ANTS))
            report.step(
                "Then", "the request fails with the node's error",
                error=str(exc.value)[:120],
            )
        finally:
            await _teardown(nodes, servlet, client)

    _run(scenario())
