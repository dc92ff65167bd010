#!/usr/bin/env python
"""On-chip unit test of compact_slab + pool_fetch_queue: scatter known
per-lane slabs into the pool, DMA the pool out, and also read it back via
the paged-queue fetch; compare both against numpy."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgraph_tpu.pallas import decode as D

I32 = jnp.int32
RTOT = 160
NPF = 1


def main():
    rng = np.random.default_rng(11)
    cnt = rng.integers(0, 17, 1024).astype(np.int32)
    pre = np.zeros(1024, dtype=np.int32)
    acc = 0
    for l in range(1024):
        pre[l] = acc
        acc += int(cnt[l])
    vals = rng.integers(1, 1 << 20, (D.SLAB, 1024)).astype(np.int32)
    # expected pool content
    exp = np.zeros(RTOT * 128, dtype=np.int64)
    for l in range(1024):
        for j in range(int(cnt[l])):
            exp[pre[l] + j] = vals[j, l]

    # queue fetch positions
    qpos = rng.integers(0, max(acc - 16, 1), 1024).astype(np.int32)
    exp_q = np.zeros((16, 1024), dtype=np.int64)
    for l in range(1024):
        exp_q[:, l] = exp[qpos[l] : qpos[l] + 16]

    def kernel(vals_ref, pre_ref, cnt_ref, qpos_ref, pool_out, q_out,
               pool_ref, pool32_ref, colbuf_ref, dma_sem):
        pool_ref[...] = jnp.zeros((RTOT, 128), I32)
        D.pool32_refresh(pool_ref, pool32_ref, RTOT, NPF, 0, RTOT)
        colbuf_ref[...] = vals_ref[...]
        pre = D.unflat(pre_ref[...])
        cnt = D.unflat(cnt_ref[...])
        D.compact_slab(colbuf_ref, pool_ref, pool32_ref, pre, cnt, RTOT, NPF)
        q = D.pool_fetch_queue(pool32_ref, RTOT, NPF,
                               D.unflat(qpos_ref[...]),
                               jnp.ones((8, 128), dtype=bool))
        q_out[...] = q
        dma = pltpu.make_async_copy(pool_ref, pool_out, dma_sem)
        dma.start()
        dma.wait()

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((D.SLAB, 1024), lambda: (0, 0))] +
                 [pl.BlockSpec((1, 1024), lambda: (0, 0))] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec((16, 1024), lambda: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((RTOT, 128), I32),
                   jax.ShapeDtypeStruct((16, 1024), I32)],
        scratch_shapes=[pltpu.VMEM((RTOT, 128), I32),
                        pltpu.VMEM((NPF * RTOT, 128), jnp.float32),
                        pltpu.VMEM((D.SLAB, 1024), I32),
                        pltpu.SemaphoreType.DMA],
        interpret=os.environ.get("JAX_PLATFORMS", "") == "cpu",
    )
    pool, q = fn(jnp.asarray(vals), jnp.asarray(pre).reshape(1, 1024),
                 jnp.asarray(cnt).reshape(1, 1024),
                 jnp.asarray(qpos).reshape(1, 1024))
    pool = np.asarray(pool).reshape(-1).astype(np.int64)
    q = np.asarray(q).astype(np.int64)
    okp = np.array_equal(pool, exp)
    okq = np.array_equal(q, exp_q)
    print("compact_slab:", "ok" if okp else "BAD")
    if not okp:
        bad = np.flatnonzero(pool != exp)
        print("  bad slots:", bad[:10], "got", pool[bad[:5]], "exp", exp[bad[:5]])
    print("pool_fetch_queue:", "ok" if okq else "BAD")
    if not okq:
        bad = np.argwhere(q != exp_q)
        print("  bad:", bad[:6].tolist())
        for r, l in bad[:4]:
            print(f"  row {r} lane {l}: got {q[r, l]} exp {exp_q[r, l]} qpos {qpos[l]}")


if __name__ == "__main__":
    main()
