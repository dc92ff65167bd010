#!/usr/bin/env python
"""Probe: can a Pallas TPU kernel decode gamma codes with the bitstream in
VMEM (per-lane dynamic gather)?  Run with JAX_PLATFORMS=cpu for interpret
mode, default env for the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("JAX_PLATFORMS", "") == "cpu"
U32 = jnp.uint32
I32 = jnp.int32


def gamma_kernel(words_ref, pos_ref, out_ref, newpos_ref):
    pos = pos_ref[:]
    i = (pos >> 5).astype(I32)
    w = words_ref[:]
    a = jnp.take(w, i, axis=0)
    b = jnp.take(w, i + 1, axis=0)
    off = (pos & 31).astype(U32)
    off2 = (U32(32) - off) & U32(31)
    hi = jnp.where(off > 0, (a << off) | (b >> off2), a)
    c = jnp.take(w, i + 2, axis=0)
    lo = jnp.where(off > 0, (b << off) | (c >> off2), b)
    h = jnp.where(hi > 0, jax.lax.clz(hi), 32 + jax.lax.clz(lo)).astype(I32)
    # extract h bits after the unary part
    start = (h + 1).astype(U32)
    sh2 = (U32(32) - start) & U32(31)
    r = jnp.where(start >= 32, lo << (start - U32(32)),
                  jnp.where(start > 0, (hi << start) | (lo >> sh2), hi))
    width = h.astype(U32)
    rest = jnp.where(width > 0, r >> ((U32(32) - width) & U32(31)), U32(0))
    zp1 = (U32(1) << (width & U32(31))) | rest
    out_ref[:] = zp1 - U32(1)
    newpos_ref[:] = pos + 2 * h + 1


def main():
    from webgraph_tpu.bits.bitstream import OutputBitStream
    from webgraph_tpu.bits import codes as C, jcodes as J

    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 20, size=4096).astype(np.int64)
    obs = OutputBitStream()
    poss = []
    p = 0
    for v in vals:
        poss.append(p)
        p += obs.write(C.GAMMA, int(v), 3)
    data = obs.to_bytes()
    words = jnp.asarray(J.words_from_bytes(data))
    W = ((len(words) + 255) // 256) * 256
    words = jnp.pad(words, (0, W - len(words)))
    pos = jnp.asarray(np.asarray(poss, np.int32))

    fn = pl.pallas_call(
        gamma_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(pos.shape, U32),
            jax.ShapeDtypeStruct(pos.shape, I32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
    )
    out, newpos = jax.jit(fn)(words, pos)
    out = np.asarray(out)
    assert np.array_equal(out, vals.astype(np.uint32)), "values mismatch"
    print("pallas gamma decode OK:", out[:5], "interpret=" + str(INTERPRET))

    # quick throughput probe on device
    if not INTERPRET:
        f = jax.jit(lambda w, p: fn(w, p)[0].astype(jnp.uint32).sum())
        _ = int(f(words, pos))
        t0 = time.perf_counter()
        for r in range(5):
            _ = int(f(words, pos + (r % 2)))
        dt = (time.perf_counter() - t0) / 5
        print(f"4096 codes in {dt*1e3:.2f} ms incl dispatch")


if __name__ == "__main__":
    main()
