"""Second on-chip decode datapoint: an Erdos-Renyi synthetic (different
degree/reference structure from cnr-2000 — near-zero copy chains, almost
all residuals), decoded by the streaming kernel with the salted-checksum
methodology."""
import sys, time, os, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.graph.builders import MutableGraph
from webgraph_tpu.pallas import decode2 as D2

MULT = 2654435761
base = "/tmp/er200k/g"
if not os.path.exists(base + ".graph"):
    os.makedirs("/tmp/er200k", exist_ok=True)
    g = MutableGraph.erdos_renyi(200_000, m=2_000_000, seed=42)
    BVGraph.store(g, base)
bv = BVGraph.load(base)
from webgraph_tpu.formats import bvgraph_np
toff, tsucc = bvgraph_np.decode_to_csr(bv)

cfg, plan, meta, words = D2.prepare2(bv)
n, m = plan.n, plan.m
print(f"er-200k: n={n} m={m} lw={cfg.lw} slabw={cfg.slabw} "
      f"max_steps={plan.max_steps}")
fn = D2._compiled2(cfg, False)
w = np.zeros((D2.LANES, cfg.slabw), dtype=np.uint32)
d = np.diff(toff).astype(np.int64)
gpos = np.arange(m, dtype=np.uint64)
wv = ((gpos * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
take = np.repeat(plan.prow[:n], d) + (gpos.astype(np.int64) - np.repeat(toff[:n], d))
w.reshape(-1)[take] = wv
expect = int((tsucc.astype(np.uint64) * wv.astype(np.uint64)).sum() & 0xFFFFFFFF)

@jax.jit
def f(meta, words, w, salt):
    slab, wp, dbg, dump = fn(meta, words)
    return jnp.sum(slab.astype(jnp.uint32) * w, dtype=jnp.uint32) + salt, wp

m_j, w_j, ww_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
s0, wp = f(m_j, w_j, ww_j, jnp.uint32(0))
s0 = int(np.uint32(s0))
assert np.array_equal(np.asarray(wp).reshape(-1), plan.exp_wp)
assert s0 == expect, (s0, expect)
print("checksum OK")
triv = jax.jit(lambda x: x + 1); int(triv(jnp.uint32(0)))
t0 = time.perf_counter()
for k in range(5): int(triv(jnp.uint32(k)))
over = (time.perf_counter() - t0) / 5
best = 1e9
for rep in range(1, 6):
    t0 = time.perf_counter()
    s, _ = f(m_j, w_j, ww_j, jnp.uint32(rep))
    assert int(np.uint32(s)) == (expect + rep) % (1 << 32)
    best = min(best, time.perf_counter() - t0)
eff = max(best - over, 1e-9)
print(f"er-200k decode: {eff*1e3:.2f} ms = {m/eff/1e6:.1f} Medges/s")
