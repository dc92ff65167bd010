#!/usr/bin/env python
"""Microbenchmark of the XLA TPU primitives the decoder leans on."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def timed(name, fn, *args, reps=3, work=None):
    out = fn(*args)
    _ = int(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.uint32), dtype=jnp.uint32))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, jnp.uint32(r))
        _ = int(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.uint32), dtype=jnp.uint32))
        best = min(best, time.perf_counter() - t0)
    rate = (work / best / 1e6) if work else 0
    print(f"{name:32s} {best*1e3:8.1f} ms   {rate:10.1f} M/s")


def main():
    N = 8_000_000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=N).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**30, size=N).astype(np.int32))

    # overhead
    triv = jax.jit(lambda s=jnp.uint32(0): jnp.uint32(1) + s)
    _ = int(triv())
    t0 = time.perf_counter()
    for i in range(5):
        _ = int(triv(jnp.uint32(i)))
    print(f"{'dispatch+fetch overhead':32s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms")

    gather = jax.jit(lambda v, i, s=jnp.uint32(0): v[i] + s.astype(jnp.int32))
    timed("gather 8M rand", gather, vals, idx, work=N)

    scat = jax.jit(lambda v, i, s=jnp.uint32(0): jnp.zeros(N, jnp.int32).at[i].add(v + s.astype(jnp.int32)))
    timed("scatter-add 8M rand", scat, vals, idx, work=N)

    scatset = jax.jit(lambda v, i, s=jnp.uint32(0): jnp.zeros(N, jnp.int32).at[i].set(v + s.astype(jnp.int32), mode="drop", unique_indices=True))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    timed("scatter-set 8M unique", scatset, vals, perm, work=N)

    cs = jax.jit(lambda v, s=jnp.uint32(0): jnp.cumsum(v + s.astype(jnp.int32)))
    timed("cumsum 8M", cs, vals, work=N)

    srt = jax.jit(lambda v, s=jnp.uint32(0): jnp.sort(v + s.astype(jnp.int32)))
    timed("sort 8M", srt, vals, work=N)

    srt2 = jax.jit(lambda a, b, s=jnp.uint32(0): jax.lax.sort((a + s.astype(jnp.int32), b), num_keys=2))
    timed("two-key sort 8M", srt2, vals, idx, work=N)

    args = jax.jit(lambda v, s=jnp.uint32(0): jnp.argsort(v + s.astype(jnp.int32)))
    timed("argsort 8M", args, vals, work=N)

    # elementwise chain (vector ALU rate)
    def ew(v, s=jnp.uint32(0)):
        x = v + s.astype(jnp.int32)
        for _ in range(16):
            x = (x * 3) ^ (x >> 5)
        return x
    timed("elementwise x16 8M", jax.jit(ew), vals, work=16 * N)

    # small sorted-gather (locality)
    sidx = jnp.asarray(np.sort(rng.integers(0, N, size=N)).astype(np.int32))
    timed("gather 8M sorted", gather, vals, sidx, work=N)


if __name__ == "__main__":
    main()
