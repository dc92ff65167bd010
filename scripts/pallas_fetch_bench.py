#!/usr/bin/env python
"""Microbenchmark of the pool one-hot fetch/compact machinery on chip.

Times K iterations of pool_fetch_queue-style gathers inside one kernel for
several matmul strategies:
  f32hi   — current: f32 one-hot x f32 halves, Precision.HIGHEST
  f32def  — same, default precision (WRONG for >11-bit values; timing only)
  int8    — int8 one-hot x 4 int8 byte planes -> int32 accumulate
  bf16    — bf16 one-hot x 3 bf16 byte planes (exact: bytes < 2^8)
Also times compact_slab-style scatters for f32hi / int8.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
LANES = 1024
ROWS = 152  # cq fetch size for cnr-2000
K = 512


def make_kernel(mode):
    def kernel(pos_ref, pool_ref, out_ref):
        pool = pool_ref[...]  # (ROWS, 128) i32

        if mode == "int8":
            planes = [((pool >> (8 * h)) & 0xFF).astype(jnp.int8)
                      for h in range(4)]
        elif mode == "bf16":
            planes = [((pool >> (8 * h)) & 0xFF).astype(jnp.bfloat16)
                      for h in range(3)]
        else:
            planes = [(pool & 0xFFFF).astype(jnp.float32),
                      ((pool >> 16) & 0xFFFF).astype(jnp.float32)]

        def body(i, acc):
            ppos = pos_ref[...] + i  # (8,128) cursors
            r0 = ppos.reshape(1, LANES) >> 7
            iota = jax.lax.broadcasted_iota(I32, (LANES, ROWS), 1)
            prec = (jax.lax.Precision.HIGHEST if mode == "f32hi"
                    else jax.lax.Precision.DEFAULT)
            x = None
            if mode == "int8":
                oh = (iota == r0.T).astype(jnp.int8)
                for h, p in enumerate(planes):
                    a = jax.lax.dot_general(
                        oh, p, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=I32)
                    x = a if x is None else x | (a << (8 * h))
            elif mode == "bf16":
                oh = (iota == r0.T).astype(jnp.bfloat16)
                for h, p in enumerate(planes):
                    a = jax.lax.dot_general(
                        oh, p, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(I32)
                    x = a if x is None else x | (a << (8 * h))
            else:
                oh = (iota == r0.T).astype(jnp.float32)
                for h, p in enumerate(planes):
                    a = jax.lax.dot_general(
                        oh, p, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(I32)
                    x = a if x is None else x | (a << (16 * h))
            # align: own-row gather to cursor column
            sh = (ppos.reshape(1, LANES) & 127).T
            cidx = jax.lax.broadcasted_iota(I32, (LANES, 128), 1)
            ga = jnp.take_along_axis(x, (cidx + sh) & 127, axis=1)
            return acc + jnp.sum(ga[:, :16].astype(I32))

        acc = jax.lax.fori_loop(0, K, body, jnp.int32(0))
        out_ref[0, 0] = acc

    return kernel


def run(mode):
    kernel = make_kernel(mode)
    pos = np.random.default_rng(0).integers(
        0, ROWS * 128 - 256, (8, 128)).astype(np.int32)
    pool = np.random.default_rng(1).integers(
        0, 1 << 24, (ROWS, 128)).astype(np.int32)
    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0)),
                  pl.BlockSpec((ROWS, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), I32),
    )
    jfn = jax.jit(lambda p, q, s: fn(p + s, q))
    t0 = time.perf_counter()
    int(jfn(pos, pool, jnp.int32(0))[0, 0])
    compile_t = time.perf_counter() - t0
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        int(jfn(pos, pool, jnp.int32(rep))[0, 0])
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.025) / K * 1e6
    print(f"{mode:7s}: compile {compile_t:.1f}s, {per:.2f} us/fetch")


def main():
    modes = sys.argv[1:] or ["f32hi", "f32def", "int8", "bf16"]
    for m in modes:
        try:
            run(m)
        except Exception as e:  # noqa: BLE001
            print(f"{m:7s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
