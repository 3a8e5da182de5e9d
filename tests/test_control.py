"""Control-plane tests — the ngkcs servlet test pattern.

Multi-node testing without a cluster (SURVEY.md §4.3): N FakeNode servers
plus the servlet under test, all in one asyncio loop, driving the real TCP
path: request fan-out, error propagation as fail replies, and end-to-end
sensor mirroring with timestamp propagation
(ngkcs/testing/test_corr3_servlet.py:14-147).
"""

import asyncio

import pytest

from dpdk_dc_sand_tpu.control import (
    Client,
    CorrServlet,
    DeviceServer,
    FailReply,
    FakeNode,
    Sensor,
    Status,
)
from dpdk_dc_sand_tpu.control.protocol import Message, escape, unescape


# ----------------------------------------------------------------------
# Wire format
# ----------------------------------------------------------------------
class TestMessage:
    def test_escape_roundtrip(self):
        for s in ["plain", "with space", "new\nline", "tabs\t", "", "back\\slash"]:
            assert unescape(escape(s)) == s

    def test_encode_decode(self):
        msg = Message(Message.REQUEST, "beam-weights", "1.0", "two words", mid=7)
        back = Message.decode(msg.encode())
        assert back.mtype == "?"
        assert back.name == "beam-weights"
        assert back.mid == 7
        assert back.args == ["1.0", "two words"]

    def test_decode_garbage(self):
        assert Message.decode(b"not a message\n") is None
        assert Message.decode(b"\n") is None


# ----------------------------------------------------------------------
# Server/client basics
# ----------------------------------------------------------------------
class EchoServer(DeviceServer):
    async def request_echo(self, conn, *args):
        return args

    async def request_boom(self, conn):
        raise FailReply("kaboom")


@pytest.fixture
def loop():
    loop = asyncio.new_event_loop()
    yield loop
    loop.close()


def run(loop, coro):
    return loop.run_until_complete(coro)


def test_request_reply_and_fail(loop):
    async def scenario():
        srv = EchoServer()
        await srv.start()
        client = await Client("127.0.0.1", srv.port).connect()
        args, _ = await client.request("echo", "a", "b c")
        assert args == ["a", "b c"]
        with pytest.raises(FailReply, match="kaboom"):
            await client.request("boom")
        with pytest.raises(FailReply):
            await client.request("nonexistent")
        args, _ = await client.request("watchdog")
        await client.close()
        await srv.stop()

    run(loop, scenario())


def test_sensor_list_value_and_sampling(loop):
    async def scenario():
        srv = EchoServer()
        s = srv.add_sensor(Sensor("temp", "temperature", "degC", "float", 20.5))
        await srv.start()
        client = await Client("127.0.0.1", srv.port).connect()

        args, informs = await client.request("sensor-list")
        assert args == ["1"]
        assert informs[0].args[:2] == ["temp", "temperature"]

        args, informs = await client.request("sensor-value", "temp")
        assert informs[0].args[2:5] == ["temp", "unknown", "20.5"]

        # subscribe; async update must push an inform
        pushed = []
        client.on_inform(pushed.append)
        await client.request("sensor-sampling", "temp", "auto")
        s.set(21.0, Status.WARN)
        await asyncio.sleep(0.1)
        status_informs = [m for m in pushed if m.name == "sensor-status"]
        assert status_informs, "no sensor push received"
        assert status_informs[-1].args[2:5] == ["temp", "warn", "21.0"]

        with pytest.raises(FailReply):
            await client.request("sensor-sampling", "nope", "auto")
        await client.close()
        await srv.stop()

    run(loop, scenario())


def test_log_level_and_log_informs(loop):
    """?log-level queries/sets the threshold; #log informs honour it."""

    async def scenario():
        srv = EchoServer()
        await srv.start()
        client = await Client("127.0.0.1", srv.port).connect()
        pushed = []
        client.on_inform(pushed.append)

        args, _ = await client.request("log-level")
        assert args == ["warn"]

        # below threshold: suppressed
        srv.log_inform("info", "quiet please")
        # at/above threshold: delivered
        srv.log_inform("error", "input sequence gap", name="engine")
        await asyncio.sleep(0.1)
        logs = [m for m in pushed if m.name == "log"]
        assert len(logs) == 1
        assert logs[0].args[0] == "error"
        assert logs[0].args[2:] == ["engine", "input sequence gap"]

        args, _ = await client.request("log-level", "debug")
        assert args == ["debug"]
        srv.log_inform("info", "now visible")
        await asyncio.sleep(0.1)
        logs = [m for m in pushed if m.name == "log"]
        assert len(logs) == 2 and logs[-1].args[3] == "now visible"

        args, _ = await client.request("log-level", "off")
        srv.log_inform("fatal", "even this is muted")
        await asyncio.sleep(0.1)
        assert len([m for m in pushed if m.name == "log"]) == 2

        with pytest.raises(FailReply, match="unknown log level"):
            await client.request("log-level", "loud")
        await client.close()
        await srv.stop()

    run(loop, scenario())


# ----------------------------------------------------------------------
# Servlet: fan-out, validation, error propagation, sensor mirroring
# ----------------------------------------------------------------------
N_ANTS = 4


async def make_fleet(n_nodes=3, fail_one=False):
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


async def teardown(nodes, servlet, client):
    await client.close()
    await servlet.stop()
    for n in nodes:
        await n.stop()


def test_beam_weights_fanout(loop):
    async def scenario():
        nodes, servlet, client = await make_fleet()
        await client.request("beam-weights", *([1.5] * N_ANTS))
        assert all(n.beam_weights_set for n in nodes)
        assert nodes[0].last_weights == [1.5] * N_ANTS
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_beam_weights_validation(loop):
    async def scenario():
        nodes, servlet, client = await make_fleet()
        with pytest.raises(FailReply, match="expected 4 weights"):
            await client.request("beam-weights", 1.0, 2.0)
        with pytest.raises(FailReply, match="non-numeric"):
            await client.request("beam-weights", "a", "b", "c", "d")
        assert not any(n.beam_weights_set for n in nodes)
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_node_failure_propagates(loop):
    async def scenario():
        nodes, servlet, client = await make_fleet(fail_one=True)
        with pytest.raises(FailReply):
            await client.request("beam-weights", *([1.0] * N_ANTS))
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_delay_model_fanout(loop):
    async def scenario():
        nodes, servlet, client = await make_fleet()
        vals = [1e-9, 0.0, 0.5, 0.0] * N_ANTS
        await client.request("delay-model", *vals)
        assert nodes[2].last_delay_model == pytest.approx(vals)
        with pytest.raises(FailReply, match="groups of 4"):
            await client.request("delay-model", 1.0, 2.0, 3.0)
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_transient_node_failure_retried(loop):
    """A node that fails once is retried transparently (fan-out succeeds)."""

    async def scenario():
        nodes = [FakeNode(fail_times=(1 if i == 1 else 0)) for i in range(3)]
        for n in nodes:
            await n.start()
        servlet = CorrServlet(
            "corr3",
            n_antennas=N_ANTS,
            engine_endpoints=[("127.0.0.1", n.port) for n in nodes],
            request_retries=1,
        )
        await servlet.start()
        client = await Client("127.0.0.1", servlet.port).connect()
        await client.request("beam-weights", *([2.0] * N_ANTS))
        assert all(n.beam_weights_set for n in nodes)
        assert servlet.sensors["device-status"].value == "ok"
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_hung_node_times_out_and_degrades(loop):
    """A hung engine is bounded by the deadline; healthy nodes still get
    the update; device-status degrades and recovers."""

    async def scenario():
        nodes = [FakeNode(hang_s=(0.5 if i == 1 else 0.0)) for i in range(3)]
        for n in nodes:
            await n.start()
        servlet = CorrServlet(
            "corr3",
            n_antennas=N_ANTS,
            engine_endpoints=[("127.0.0.1", n.port) for n in nodes],
            request_timeout=0.1,
            request_retries=0,
        )
        await servlet.start()
        client = await Client("127.0.0.1", servlet.port).connect()
        with pytest.raises(FailReply, match="node1: timeout"):
            await client.request("beam-weights", *([3.0] * N_ANTS))
        assert nodes[0].beam_weights_set and nodes[2].beam_weights_set
        assert not nodes[1].beam_weights_set
        assert servlet.sensors["device-status"].value == "degraded"
        nodes[1].hang_s = 0.0
        await asyncio.sleep(0.6)  # let the hung handler drain its sleep
        await client.request("beam-weights", *([4.0] * N_ANTS))
        assert servlet.sensors["device-status"].value == "ok"
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_sensor_mirroring_end_to_end(loop):
    async def scenario():
        nodes, servlet, client = await make_fleet()
        # mirrored sensors registered with nodeN prefix
        assert "node0.device-status" in servlet.sensors
        assert "node2.ingest-rate" in servlet.sensors
        # downstream change propagates with status + timestamp
        nodes[1].device_status.set("degraded", Status.WARN)
        await asyncio.sleep(0.2)
        mirrored = servlet.sensors["node1.device-status"]
        assert mirrored.value == "degraded"
        assert mirrored.status == Status.WARN
        assert mirrored.timestamp == pytest.approx(
            nodes[1].device_status.timestamp, abs=1e-3
        )
        # monotonic timestamps across successive updates
        t1 = mirrored.timestamp
        nodes[1].device_status.set("ok", Status.NOMINAL)
        await asyncio.sleep(0.2)
        assert mirrored.timestamp >= t1
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_interface_changed_broadcast(loop):
    async def scenario():
        nodes, servlet, client = await make_fleet(n_nodes=1)
        seen = []
        client.on_inform(seen.append)
        # a second mirror sync triggers interface-changed to connected clients
        servlet.mass_inform("interface-changed", "sensor-list")
        await asyncio.sleep(0.1)
        assert any(m.name == "interface-changed" for m in seen)
        await teardown(nodes, servlet, client)

    run(loop, scenario())


def test_help_and_version_list(loop):
    async def scenario():
        srv = EchoServer()
        await srv.start()
        client = await Client("127.0.0.1", srv.port).connect()
        args, informs = await client.request("help")
        names = [m.args[0] for m in informs]
        assert "echo" in names and "sensor-list" in names and "help" in names
        args, informs = await client.request("help", "watchdog")
        assert informs[0].args[1].startswith("Liveness")
        with pytest.raises(FailReply):
            await client.request("help", "nope")
        args, informs = await client.request("version-list")
        assert any(m.args[0] == "dpdk-dc-sand-tpu" for m in informs)
        await client.close()
        await srv.stop()

    run(loop, scenario())


def test_auth_challenge_gates_requests(loop):
    """Shared-secret extension: unauthenticated requests fail, the HMAC
    challenge-response admits a client, and a wrong secret is rejected."""
    from dpdk_dc_sand_tpu.control.protocol import Client, DeviceServer

    async def scenario():
        server = DeviceServer(port=0, auth_secret="s3cret")
        await server.start()
        try:
            # Right secret: connect() handles the challenge transparently.
            good = await Client(
                "127.0.0.1", server.port, auth_secret="s3cret"
            ).connect()
            await good.request("watchdog")
            await good.close()

            # No secret: every request (except ?auth) is refused.
            bare = Client("127.0.0.1", server.port)
            await bare.connect()
            with pytest.raises(FailReply, match="unauthorized"):
                await bare.request("watchdog")
            # Wrong digest is rejected, connection stays unauthed.
            with pytest.raises(FailReply, match="bad credentials"):
                await bare.request("auth", "0" * 64)
            with pytest.raises(FailReply, match="unauthorized"):
                await bare.request("watchdog")
            await bare.close()

            # Wrong secret via the client helper fails at connect time.
            with pytest.raises(FailReply):
                await Client(
                    "127.0.0.1", server.port, auth_secret="wrong"
                ).connect()
        finally:
            await server.stop()

    run(loop, scenario())
