"""Beamform formulation shoot-out on the target chip.

Compares the folded single-dot rotation-block layout against the planar
4-dot form and precision modes. Finding (v5e via axon, 2026-08): XLA
lowers the folded [C x (S,2A)@(2A,2B)] batched-tiny-matmul pathologically
(~1000x slower than planar); the planar 4-dot form is the production
path. Re-run after XLA upgrades. Scale C down if the relay makes full
scale impractical.
"""
import numpy as np, jax, jax.numpy as jnp, time
from jax import lax
def log(*a): print(*a, flush=True)
C, S, A, B, P = 8192, 32, 80, 16, 2
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.integers(-64, 64, size=(P, C, S, A, 2), dtype=np.int8)))
w = jax.device_put(jnp.asarray(rng.normal(size=(C, 2*A, 2*B)).astype(np.float32)))
cos = jax.device_put(jnp.asarray(rng.normal(size=(C, B, A)).astype(np.float32)))
sin = jax.device_put(jnp.asarray(rng.normal(size=(C, B, A)).astype(np.float32)))

def folded_moveaxis(x, w):
    xx = x.reshape(P, C, S, 2*A).astype(jnp.float32)
    x2 = jnp.moveaxis(xx, 1, 0)
    dims = (((3,), (1,)), ((0,), (0,)))
    out = lax.dot_general(x2, w, dims, precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, 0, 1)

def folded_inplace_batch(x, w):
    xx = x.reshape(P, C, S, 2*A).astype(jnp.float32)
    # batch dim = axis 1 of lhs, axis 0 of rhs; no pre-transpose
    dims = (((3,), (1,)), ((1,), (0,)))
    out = lax.dot_general(xx, w, dims, precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)  # [C, P, S, 2B]
    return jnp.moveaxis(out, 0, 1)

def folded_bf16(x, w):
    xx = x.reshape(P, C, S, 2*A).astype(jnp.bfloat16)
    dims = (((3,), (1,)), ((1,), (0,)))
    out = lax.dot_general(xx, w.astype(jnp.bfloat16), dims,
                          preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, 0, 1)

def folded_default_prec(x, w):
    xx = x.reshape(P, C, S, 2*A).astype(jnp.float32)
    dims = (((3,), (1,)), ((1,), (0,)))
    out = lax.dot_general(xx, w, dims, preferred_element_type=jnp.float32)
    return jnp.moveaxis(out, 0, 1)

def planar4(x, cos, sin):
    xr = x[..., 0].astype(jnp.float32); xi = x[..., 1].astype(jnp.float32)
    wc = jnp.swapaxes(cos, -1, -2); ws = jnp.swapaxes(sin, -1, -2)
    def cdot(v, w):
        dims = (((3,), (1,)), ((1,), (0,)))
        return lax.dot_general(v, w, dims, precision=lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    rr = cdot(xr, wc); ii = cdot(xi, ws); ri = cdot(xr, ws); ir = cdot(xi, wc)
    return rr - ii, ri + ir

def measure(fn, args, tag):
    try:
        def chained(n):
            @jax.jit
            def run(x0):
                def body(i, carry):
                    xc, acc = carry
                    out = fn(xc, *args)
                    if isinstance(out, tuple):
                        p = out[0][0, 0, 0, 0] + out[1][0, 0, 0, 0]
                    else:
                        p = out[0, 0, 0, 0]
                    return (x0 + (p * 0).astype(x0.dtype), acc + p)
                return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))[1]
            return run
        r1, r3 = chained(1), chained(3)
        t0=time.time(); float(r1(x)); c1 = time.time()-t0
        float(r3(x))
        t1 = t3 = 1e9
        for _ in range(2):
            t0=time.time(); float(r1(x)); t1 = min(t1, time.time()-t0)
            t0=time.time(); float(r3(x)); t3 = min(t3, time.time()-t0)
        per = (t3 - t1) / 2
        log(f"{tag:22s}: {per*1e3:9.2f} ms/iter (compile {c1:.0f}s)")
    except Exception as e:
        log(tag, "FAIL", str(e)[:120])

measure(folded_moveaxis, (w,), "folded+moveaxis f32H")
measure(folded_inplace_batch, (w,), "folded in-place f32H")
measure(folded_default_prec, (w,), "folded default-prec")
measure(folded_bf16, (w,), "folded bf16")
measure(planar4, (cos, sin), "planar 4-dot f32H")
