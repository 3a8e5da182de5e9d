"""Teaching example: vector add as a Pallas TPU kernel.

The ``cpp_example``/``pycuda_example`` analog (VectorAddTest.cu,
pycuda_example/vector_add.py): allocate big vectors, add on the
accelerator, verify on the host, report stage timings with the
:class:`PipelineTest` harness. Demonstrates the minimal pallas_call
pattern (pallas_guide.md "Minimal Kernel") plus the harness every real op
benchmark uses.

Run: ``python examples/vector_add_pallas.py [n_elements]``
"""

import sys

import numpy as np


def vector_add(x, y):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = x_ref[:] + y_ref[:]

    if jax.default_backend() != "tpu":
        return x + y  # pallas TPU kernels need the TPU backend
    block = 8 * 128
    n = x.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, y)


def main(n: int = 1 << 22) -> None:
    from dpdk_dc_sand_tpu.utils import PipelineTest

    class VectorAddTest(PipelineTest):
        name = "vector-add"

        def simulate_input(self):
            rng = np.random.default_rng(2021)
            return {
                "x": rng.normal(size=n).astype(np.float32),
                "y": rng.normal(size=n).astype(np.float32),
            }

        def run_kernel(self, device):
            import jax

            return {"sum": jax.jit(vector_add)(device["x"], device["y"])}

        def verify_output(self, host_in, host_out):
            return bool(
                np.allclose(host_out["sum"], host_in["x"] + host_in["y"])
            )

    times = VectorAddTest().run_test(iters=3)
    print(times.report())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22)
