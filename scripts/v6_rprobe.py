"""Decompose dispatch overhead vs true per-decode time: raw wall time of
R in-program kernel repetitions for R in {1, 2, 4, 8} (the slope is the
honest per-decode cost, the intercept the true dispatch overhead)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.pallas import decode2 as D2

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"

bv = BVGraph.load(CNR)
cfg, plan, meta, words = D2.prepare2(bv)
fn = D2._compiled2(cfg, False)
meta_j, words_j = jnp.asarray(meta), jnp.asarray(words)

for R in (1, 2, 4, 8):
    @jax.jit
    def fnR(meta, words, salt, R=R):
        def body(i, acc):
            m2 = meta.at[31, 0, 0].set(salt + i)
            slab, wp, dbg, dump = fn(m2, words)
            return acc + jnp.sum(slab[:, :1].astype(jnp.uint32),
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

    int(np.uint32(fnR(meta_j, words_j, jnp.uint32(0))))  # compile
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        int(np.uint32(fnR(meta_j, words_j, jnp.uint32(100 + rep * R))))
        best = min(best, time.perf_counter() - t0)
    print(f"R={R}: raw {best*1e3:.1f} ms", flush=True)
