"""Shared utilities: stage-timed benchmarking harness, test helpers."""

from dpdk_dc_sand_tpu.utils.timing import PipelineTest, StageTimes  # noqa: F401
