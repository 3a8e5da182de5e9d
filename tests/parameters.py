"""Single source of truth for test parameter sweeps.

The CPU-test analog of ``beamformer/unit_test/test_parameters.py:19-34``:
antenna counts include awkward non-powers-of-two, channel counts span the
MeerKAT range (scaled down so CPU tests stay fast; the full-scale values are
exercised by the on-hardware benchmarks in ``bench.py``).
"""

# Antenna counts, including non-powers-of-two (reference sweeps 4..256 with
# 5, 19, 23, 61, 79 among them).
array_size = [4, 5, 8, 19, 64]

# Total system channel counts (reference: 1024, 4096, 32768).
num_channels = [256, 1024, 4096]

# Samples per channel per batch: MeerKAT 1 KiB heap geometry
# (test_parameters.py:22-25).
num_samples_per_channel = [256]

num_beams = [4, 16]

num_batches = [1, 3]
