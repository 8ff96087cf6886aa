#!/usr/bin/env python3
"""Microbench: XLA-side prep costs around the fused pool kernel.

Times, at stage-1 shapes (B16 T8 H56 W56 C96 bf16):
  pad_thw   : jnp.pad halo on T,H,W (current s1 prep — W pad misaligns sublanes)
  pad_th    : jnp.pad halo on T,H only (aligned; roll+mask kernel target)
  parity    : the strided-path pad + H/W parity reshape (current kv prep)
  copy      : plain device copy (SOL reference)
  pool_s1   : full fused_pool_ln stride 1 (kernel + prep)
  pool_s2   : full fused_pool_ln stride (1,2,2)

Chained-iteration timing (per-dispatch floor ~1.5ms on the tunnel;
block_until_ready does not block — see bench.py).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from svit_tpu.utils.env import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, x, iters=20):
    """Chain iters applications; returns ms/iter."""

    @jax.jit
    def chain(x):
        for _ in range(iters):
            # barrier forces the op's output to materialize (otherwise XLA
            # fuses pads/reshapes into the consuming reduce and the "cost"
            # being measured never hits HBM); the mean then serializes the
            # next iteration on the result.
            y = jax.lax.optimization_barrier(fn(x))
            x = x + (y.mean() * 1e-12).astype(x.dtype)
        return x.ravel()[0]

    float(chain(x))  # warmup; scalar fetch drains the queue (block_until_
    # ready does not block on this platform)
    t0 = time.perf_counter()
    float(chain(x))  # fetch forces completion
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B, T, H, W, C = 16, 8, 56, 56, 96
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, T, H, W, C), jnp.bfloat16
    )

    res = {}
    res["copy"] = timed(lambda x: x + jnp.bfloat16(1), x)
    res["pad_thw"] = timed(
        lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), x
    )
    res["pad_th"] = timed(
        lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0))), x
    )

    def parity(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        Bp, Tp, Hp, Wp, Cp = xp.shape
        return xp.reshape(Bp, Tp, Hp // 2, 2, Wp // 2, 2 * Cp)

    res["parity"] = timed(parity, x)

    from svit_tpu.ops import pallas_pool as pp

    kw = jnp.asarray(np.random.RandomState(1).randn(3, 3, 3, 1, C) * 0.1,
                     jnp.float32)
    ls = jnp.ones((96,), jnp.float32)
    lb = jnp.zeros((96,), jnp.float32)
    res["pool_s1"] = timed(
        lambda x: pp.fused_pool_ln(x, kw, ls, lb, (3, 3, 3), (1, 1, 1), 96), x
    )
    res["pool_s2"] = timed(
        lambda x: pp.fused_pool_ln(x, kw, ls, lb, (3, 3, 3), (1, 2, 2), 96), x
    )

    for k, v in res.items():
        print(f"{k:10s} {v:8.3f} ms")


if __name__ == "__main__":
    main()
