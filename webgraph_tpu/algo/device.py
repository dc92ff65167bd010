"""Device-resident graph analytics: BFS, bit-parallel NF, distance sweeps.

The reference parallelizes these with shared-memory threads
(ParallelBreadthFirstVisit.java:79,149-181 level-synchronous frontier BFS;
NeighbourhoodFunction.java:100 parallel sweeps; SumSweep forward/backward
BFS machinery).  The TPU mapping is arc-parallel, level-synchronous
propagation over a device-resident CSR:

  * ``bfs_distances``  — one (or k batched) source(s); per level one
    arc-parallel gather of frontier flags + a scatter-max into the
    destination nodes (XLA ``.at[].max``), inside ``lax.while_loop``.
  * ``nf64``           — 64-source bit-parallel BFS (the exact-NF
    decomposition of NeighbourhoodFunction.java:100): per iteration the
    64-bit reach masks propagate along all arcs via a segmented-OR scan
    over a destination-sorted arc list (OR has no native scatter on XLA;
    the segmented scan is the associative equivalent).
  * ``eccentricity_sweep`` — forward/backward BFS eccentricities feeding
    SumSweep (algo/sumsweep.py) without leaving the device.

Everything is jittable, static-shaped, and oracle-tested against the host
NumPy implementations (algo/bfs.py, algo/nf.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

I32 = jnp.int32


class DeviceCSR:
    """A CSR graph resident on device, with a destination-sorted arc copy
    (for segmented-OR propagation) built once at construction."""

    def __init__(self, offsets: np.ndarray, succ: np.ndarray, n: int | None = None):
        offsets = np.asarray(offsets, dtype=np.int64)
        succ = np.asarray(succ, dtype=np.int64)
        self.n = int(n if n is not None else len(offsets) - 1)
        self.m = int(len(succ))
        src = np.repeat(np.arange(self.n, dtype=np.int64), np.diff(offsets))
        self.src = jnp.asarray(src.astype(np.int32))
        self.dst = jnp.asarray(succ.astype(np.int32))
        # destination-sorted arc order + segment boundaries
        order = np.argsort(succ, kind="stable")
        self.src_by_dst = jnp.asarray(src[order].astype(np.int32))
        dsorted = succ[order]
        self.dst_sorted = jnp.asarray(dsorted.astype(np.int32))
        is_start = np.ones(self.m, dtype=bool)
        is_start[1:] = dsorted[1:] != dsorted[:-1]
        self.seg_start = jnp.asarray(is_start)
        # index of each destination's LAST in-arc in sorted order (or -1)
        last = np.full(self.n, -1, dtype=np.int64)
        last[dsorted] = np.arange(self.m)  # ascending: last write wins
        self.last_in = jnp.asarray(last.astype(np.int32))

    @classmethod
    def from_graph(cls, g):
        offsets, succ = g.to_csr()
        return cls(offsets, succ, g.num_nodes())


def bfs_distances(csr: DeviceCSR, sources, max_levels: int | None = None):
    """Distances from `sources` (int or 1-D list) — min over sources, i.e.
    one BFS from the source set.  Returns int32[n], -1 for unreachable.

    Level-synchronous arc-parallel propagation
    (ParallelBreadthFirstVisit.java:149-181)."""
    n, src, dst = csr.n, csr.src, csr.dst
    sources = jnp.atleast_1d(jnp.asarray(sources, dtype=I32))
    cap = int(max_levels if max_levels is not None else n)

    @jax.jit
    def run(sources):
        dist = jnp.full(n, -1, dtype=I32)
        dist = dist.at[sources].set(0)
        front = jnp.zeros(n, dtype=I32).at[sources].set(1)

        def cond(st):
            _, front, level = st
            return (jnp.max(front) > 0) & (level < cap)

        def body(st):
            dist, front, level = st
            hit = jnp.zeros(n, dtype=I32).at[dst].max(front[src])
            newf = (hit > 0) & (dist < 0)
            dist = jnp.where(newf, level + 1, dist)
            return dist, newf.astype(I32), level + 1

        dist, _, _ = jax.lax.while_loop(cond, body, (dist, front, jnp.int32(0)))
        return dist

    return run(sources)


def _seg_or_scan(flags, seg_start):
    """Segmented OR over a uint32 (or uint64-as-2xuint32) value array:
    within each segment (seg_start marks the first element) the result at a
    segment's last position is the OR of the whole segment."""

    def comb(a, b):
        fa, va = a
        fb, vb = b
        v = jnp.where(fb, vb, va | vb)
        return fa | fb, v

    return jax.lax.associative_scan(comb, (seg_start, flags))[1]


def nf64(csr: DeviceCSR, sources, max_iters: int | None = None):
    """Bit-parallel BFS from up to 64 sources at once.

    Returns (counts int32[iters+1] cumulative-reachable-pairs per distance,
    reach_masks uint32[n, 2]) — the exact neighbourhood-function
    decomposition of NeighbourhoodFunction.java:100/118: NF(t) = total
    number of (source, node) pairs at distance <= t.
    """
    n = csr.n
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    assert len(sources) <= 64
    cap = int(max_iters if max_iters is not None else n)

    init = np.zeros((n, 2), dtype=np.uint32)
    for i, s in enumerate(sources):
        init[int(s), i // 32] |= np.uint32(1) << np.uint32(i % 32)
    init = jnp.asarray(init)

    src_by_dst, seg_start, last_in = csr.src_by_dst, csr.seg_start, csr.last_in

    @jax.jit
    def run(masks):
        def popcnt(x):
            return jax.lax.population_count(x.astype(jnp.uint32)).astype(I32)

        def tot(masks):
            return jnp.sum(popcnt(masks[:, 0]) + popcnt(masks[:, 1]))

        def body(st):
            masks, counts, it, _ = st
            vals0 = masks[src_by_dst, 0]
            vals1 = masks[src_by_dst, 1]
            or0 = _seg_or_scan(vals0, seg_start)
            or1 = _seg_or_scan(vals1, seg_start)
            upd0 = jnp.where(last_in >= 0, or0[jnp.maximum(last_in, 0)], 0)
            upd1 = jnp.where(last_in >= 0, or1[jnp.maximum(last_in, 0)], 0)
            new = jnp.stack([masks[:, 0] | upd0, masks[:, 1] | upd1], axis=1)
            t = tot(new)
            changed = t > counts[it]
            counts = counts.at[it + 1].set(t)
            return new, counts, it + 1, changed.astype(I32)

        def cond(st):
            _, _, it, changed = st
            return (changed > 0) & (it < cap)

        counts0 = jnp.zeros(cap + 1, dtype=I32).at[0].set(tot(masks))
        masks, counts, it, _ = jax.lax.while_loop(
            cond, body, (masks, counts0, jnp.int32(0), jnp.int32(1)))
        # pad the tail of counts with the converged value
        idx = jnp.arange(cap + 1)
        counts = jnp.where(idx > it, counts[it], counts)
        return counts, masks, it

    return run(init)


def neighbourhood_function_device(csr: DeviceCSR, max_iters: int | None = None):
    """Exact NF by batches of 64 bit-parallel sources (device path of
    algo/nf.py).  Returns float64[t] cumulative pair counts."""
    n = csr.n
    cap = int(max_iters if max_iters is not None else n)
    total = np.zeros(cap + 1, dtype=np.float64)
    deepest = 0
    for base in range(0, n, 64):
        srcs = np.arange(base, min(base + 64, n))
        counts, _, it = nf64(csr, srcs, max_iters=cap)
        counts = np.asarray(counts, dtype=np.float64)
        total += counts
        deepest = max(deepest, int(it))
    return total[: deepest + 1]


def eccentricity(csr: DeviceCSR, source: int) -> int:
    """Eccentricity of `source` (max finite BFS distance) on device."""
    dist = bfs_distances(csr, source)
    return int(jnp.max(dist))
