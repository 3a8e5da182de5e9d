"""MXU numeric probing and roofline — the tensor_core analog.

``tensor_core/tc_dynamic_range`` asks whether 65000 × 1.5e-5 survives
fp16 tensor-core arithmetic (tc_dynamic_range.py:13-15). The MXU question
is the same with bfloat16 inputs and f32 accumulation: bf16 has fp32's
exponent range (no overflow at 65000) but only an 8-bit significand, so
the answer differs from the CUDA fp16 case in an instructive way.
"""

from __future__ import annotations

import time
from typing import Dict


def mxu_dynamic_range(
    large: float = 65000.0, small: float = 1.5e-5, dtype: str = "bfloat16"
) -> Dict[str, float]:
    """Probe value survival through one MXU matmul.

    A [16,16] matrix of ``large`` multiplied by a diagonal of ``small``
    should yield exactly ``large*small`` everywhere if the pipeline
    preserves both magnitudes (tc_dynamic_range.cu:6-20 structure).
    """
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    a = jnp.full((16, 16), large, dt)
    b = (jnp.eye(16) * small).astype(dt)
    out = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )(a, b)
    got = float(out[0, 0])
    expected = large * small
    import numpy as np

    rel_err = abs(got - expected) / abs(expected)
    return {
        "expected": expected,
        "got": got,
        "rel_err": rel_err,
        # bf16 significand rounding bounds the error near 2^-8
        "survives": float(rel_err < 2 ** -7),
    }


def matmul_roofline(
    n: int = 4096, dtype: str = "bfloat16", iters: int = 8
) -> Dict[str, float]:
    """Measured MXU TFLOP/s from a dependent matmul chain.

    Chained (``x ← x@w·eps``) so relayed backends cannot elide or overlap
    iterations; first call compiles and is excluded.
    """
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.full((n, n), 0.5, dt)
    w = (jnp.eye(n) * 1.001).astype(dt)

    @jax.jit
    def chain(x):
        def body(i, x):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(dt)

        return jax.lax.fori_loop(0, iters, body, x)

    float(chain(x)[0, 0])  # compile + run
    t0 = time.perf_counter()
    float(chain(x)[0, 0])
    dt_s = time.perf_counter() - t0
    flops = 2 * n**3 * iters
    return {"n": n, "iters": iters, "tflops": flops / dt_s / 1e12}


def main() -> None:
    dr = mxu_dynamic_range()
    print(
        f"dynamic range bf16: expected={dr['expected']:.4g} got={dr['got']:.4g} "
        f"rel_err={dr['rel_err']:.3g} survives={bool(dr['survives'])}"
    )
    rl = matmul_roofline()
    print(f"matmul roofline: {rl['tflops']:.1f} TFLOP/s @ n={rl['n']}")


if __name__ == "__main__":
    main()
