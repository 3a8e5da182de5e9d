"""Control & monitoring plane (L5): KATCP-style request/sensor protocol.

The reference fronts a fleet of DSP nodes with an asyncio KATCP servlet
that forwards requests and mirrors sensors (ngkcs/ngkcs/corr3_servlet.py).
aiokatcp is not available in this environment, so this package implements
a wire-compatible subset natively: ``?request``/``!reply``/``#inform``
lines with KATCP argument escaping, typed sensors with status, a
DeviceServer base with handler dispatch and sensor sampling, a Client with
request futures and sensor watching, the aggregating servlet, and the
fake-node test double (ngkcs/testing/fake_node.py pattern).
"""

from dpdk_dc_sand_tpu.control.protocol import (  # noqa: F401
    Client,
    DeviceServer,
    FailReply,
    Message,
)
from dpdk_dc_sand_tpu.control.sensors import Sensor, SensorSet, Status  # noqa: F401
from dpdk_dc_sand_tpu.control.servlet import CorrServlet  # noqa: F401
from dpdk_dc_sand_tpu.control.fake_node import FakeNode  # noqa: F401
