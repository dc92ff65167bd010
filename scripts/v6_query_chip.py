"""On-chip timing of batched random access (BASELINE config 5) through the
streaming kernel: 1024 random successors(x) queries per invocation.

Salted dependent-scalar-fetch methodology; verified against the host
oracle truth arrays."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.pallas.query2 import QueryPlanner
from webgraph_tpu.pallas import decode2 as D2

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
MULT = 2654435761

bv = BVGraph.load(CNR)
z = np.load("/tmp/cnr-2000-truth2.npz")
toff, tsucc = z["off"], z["succ"]
qp = QueryPlanner(bv)
rng = np.random.default_rng(3)
Q = 1024
nodes = rng.integers(0, bv.num_nodes(), size=Q)
cfg, meta, words, row_off, counts = qp.plan(nodes)
print(f"cfg: lw={cfg.lw} slabw={cfg.slabw} sb={cfg.sb} cap={cfg.trip_cap}")
fn = D2._compiled2(cfg, False)

# checksum weights over exactly the queried rows
w = np.zeros((Q, cfg.slabw), dtype=np.uint32)
expect = 0
for i, x in enumerate(nodes):
    d = int(counts[i])
    pos = np.arange(d, dtype=np.uint64)
    wv = (((i * 131071 + pos) * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
    w[i, row_off[i]:row_off[i] + d] = wv
    expect = (expect + int((tsucc[toff[x]:toff[x] + d].astype(np.uint64)
                            * wv.astype(np.uint64)).sum())) & 0xFFFFFFFF

@jax.jit
def f(meta, words, w, salt):
    slab, wp, dbg, dump = fn(meta, words)
    return jnp.sum(slab.astype(jnp.uint32) * w, dtype=jnp.uint32) + salt

m_j, w_j, ww_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
t0 = time.time()
s0 = int(np.uint32(f(m_j, w_j, ww_j, jnp.uint32(0))))
print(f"compile+run {time.time()-t0:.1f}s; checksum ok: {s0 == expect} ({s0} vs {expect})")
assert s0 == expect

triv = jax.jit(lambda x: x + 1)
int(triv(jnp.uint32(0)))
t0 = time.perf_counter()
for k in range(5):
    int(triv(jnp.uint32(k)))
over = (time.perf_counter() - t0) / 5
best = 1e9
for rep in range(1, 6):
    t0 = time.perf_counter()
    s = int(np.uint32(f(m_j, w_j, ww_j, jnp.uint32(rep))))
    assert s == (expect + rep) % (1 << 32)
    best = min(best, time.perf_counter() - t0)
eff = max(best - over, 1e-9)
print(f"batched random access: {eff*1e3:.2f} ms / {Q} queries = "
      f"{eff/Q*1e9:.0f} ns/node  (arcs touched {int(counts.sum())})")
