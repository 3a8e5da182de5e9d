"""CPU golden models (numpy) — the test oracles for every accelerator op.

Mirrors the reference's pattern of pairing each GPU op with a CPU reference
implementation (SURVEY.md §4): ``beamformer/beamforming/reorder.py``,
``beamformer/unit_test/coeff_generator_cpu.py``,
``beamformer/unit_test/complex_mult_cpu.py``. Everything here is plain
numpy, deliberately simple and loop-light, and never imports jax.
"""

from dpdk_dc_sand_tpu.golden.reorder import reorder, reorder_inverse  # noqa: F401
from dpdk_dc_sand_tpu.golden.coeffs import (  # noqa: F401
    steering_coeffs_complex,
    steering_coeffs_matrix,
    complex_to_matrix,
)
from dpdk_dc_sand_tpu.golden.beamform import beamform, beamform_complex  # noqa: F401
from dpdk_dc_sand_tpu.golden.pfb import (  # noqa: F401
    pfb_window,
    pfb_fir,
    pfb_channelise,
)
from dpdk_dc_sand_tpu.golden.delay import (  # noqa: F401
    coarse_delay,
    fine_delay_phase,
    apply_fine_delay,
)
from dpdk_dc_sand_tpu.golden.requant import requantise  # noqa: F401
from dpdk_dc_sand_tpu.golden.correlate import correlate, correlate_planar  # noqa: F401
