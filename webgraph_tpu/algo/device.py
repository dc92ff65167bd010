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

import functools

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


def _bfs_program(csr: DeviceCSR, cap: int, k: int):
    """Compiled BFS program for (csr, cap, source-count), cached on the
    DeviceCSR — a fresh jit per call would RECOMPILE per invocation
    (30-90 s on a remote-compile backend; SumSweep runs ~100 sweeps)."""
    key = (cap, k)
    cache = getattr(csr, "_bfs_cache", None)
    if cache is None:
        cache = csr._bfs_cache = {}
    if key in cache:
        return cache[key]
    n, src, dst = csr.n, csr.src, csr.dst

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

        dist, _, _ = jax.lax.while_loop(cond, body,
                                        (dist, front, jnp.int32(0)))
        return dist

    cache[key] = run
    return run


def bfs_distances(csr: DeviceCSR, sources, max_levels: int | None = None):
    """Distances from `sources` (int or 1-D list) — min over sources, i.e.
    one BFS from the source set.  Returns int32[n], -1 for unreachable.

    Level-synchronous arc-parallel propagation
    (ParallelBreadthFirstVisit.java:149-181).  The compiled program is
    cached per (graph, cap, source-count): repeated sweeps (SumSweep,
    eccentricities) dispatch without re-tracing."""
    sources = jnp.atleast_1d(jnp.asarray(sources, dtype=I32))
    cap = int(max_levels if max_levels is not None else csr.n)
    run = _bfs_program(csr, cap, int(sources.shape[0]))
    return run(sources)


def _seg_or_scan(flags, seg_start):
    """Segmented OR over a uint32 value array: within each segment
    (seg_start marks the first element) the result at a segment's last
    position is the OR of the whole segment.

    Hillis-Steele doubling inside a fori_loop (log2(m) iterations of ONE
    compiled body) — `lax.associative_scan` unrolls ~2*log2(m) stages over
    the full array and its compile blew past 15 minutes on the remote
    Mosaic/XLA service for m=3.2M (r5 finding); this form compiles in
    seconds and has the same O(m log m) runtime."""
    m = flags.shape[0]
    steps = max(int(m - 1).bit_length(), 1)
    pos = jnp.arange(m, dtype=jnp.int32)

    def body(i, st):
        f, v = st
        sh = jnp.int32(1) << i
        pv = jnp.roll(v, sh)
        pf = jnp.roll(f, sh)
        valid = pos >= sh
        v2 = jnp.where((~f) & valid, v | pv, v)
        f2 = f | (pf & valid)
        return f2, v2

    _, v = jax.lax.fori_loop(0, steps, body,
                             (seg_start, flags))
    return v


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


def make_nf_batches(csr: DeviceCSR, cap: int):
    """Compile ONE program that runs `nbatch` consecutive 64-source
    bit-parallel NF batches with the batch loop INSIDE the jit (a
    `fori_loop` over batch index — n/64 host dispatches collapse to one;
    the round-4 per-batch dispatch cost ~27 ms on this backend made the
    old shape unusable).  Returns run(start_batch, nbatch) ->
    (counts int32[nbatch, cap+1], deepest int32).

    Reference decomposition: NeighbourhoodFunction.java:100/118 farms one
    BFS per source across threads; here each batch is 64 sources bit-packed
    into uint32x2 reach masks propagated arc-parallel."""
    n = csr.n
    src_by_dst, seg_start, last_in = (csr.src_by_dst, csr.seg_start,
                                      csr.last_in)
    # constant (64, 2) rows: row i sets bit i
    rows = np.zeros((64, 2), dtype=np.uint32)
    for i in range(64):
        rows[i, i // 32] = np.uint32(1) << np.uint32(i % 32)
    rows = jnp.asarray(rows)

    def popcnt(x):
        return jax.lax.population_count(x.astype(jnp.uint32)).astype(I32)

    def tot(masks):
        return jnp.sum(popcnt(masks[:, 0]) + popcnt(masks[:, 1]))

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(start_batch, nbatch):
        def one_batch(b, acc):
            counts_all, deepest = acc
            sources = (start_batch + b) * 64 + jnp.arange(64, dtype=I32)
            sources = jnp.where(sources < n, sources, n)  # OOB -> dropped
            masks = jnp.zeros((n, 2), jnp.uint32).at[sources].max(
                rows, mode="drop")

            def body(st):
                masks, counts, it, _ = st
                vals0 = masks[src_by_dst, 0]
                vals1 = masks[src_by_dst, 1]
                or0 = _seg_or_scan(vals0, seg_start)
                or1 = _seg_or_scan(vals1, seg_start)
                upd0 = jnp.where(last_in >= 0,
                                 or0[jnp.maximum(last_in, 0)], 0)
                upd1 = jnp.where(last_in >= 0,
                                 or1[jnp.maximum(last_in, 0)], 0)
                new = jnp.stack([masks[:, 0] | upd0, masks[:, 1] | upd1],
                                axis=1)
                t = tot(new)
                changed = t > counts[it]
                counts = counts.at[it + 1].set(t)
                return new, counts, it + 1, changed.astype(I32)

            def cond(st):
                _, _, it, changed = st
                return (changed > 0) & (it < cap)

            counts0 = jnp.zeros(cap + 1, dtype=I32).at[0].set(tot(masks))
            _, counts, it, _ = jax.lax.while_loop(
                cond, body, (masks, counts0, jnp.int32(0), jnp.int32(1)))
            idx = jnp.arange(cap + 1)
            counts = jnp.where(idx > it, counts[it], counts)
            return counts_all.at[b].set(counts), jnp.maximum(deepest, it)

        counts_all = jnp.zeros((nbatch, cap + 1), dtype=I32)
        return jax.lax.fori_loop(0, nbatch, one_batch,
                                 (counts_all, jnp.int32(0)))

    return run


def neighbourhood_function_device(csr: DeviceCSR, max_iters: int | None = None,
                                  batches_per_dispatch: int = 64):
    """Exact NF by 64-source bit-parallel batches, `batches_per_dispatch`
    of them per device dispatch (device path of algo/nf.py).  Returns
    float64[t] cumulative pair counts."""
    n = csr.n
    cap = int(max_iters if max_iters is not None else n)
    nbatches = -(-n // 64)
    run = make_nf_batches(csr, cap)
    total = np.zeros(cap + 1, dtype=np.float64)
    deepest = 0
    for start in range(0, nbatches, batches_per_dispatch):
        k = min(batches_per_dispatch, nbatches - start)
        counts, it = run(jnp.int32(start), k)
        total += np.asarray(counts, dtype=np.float64).sum(axis=0)
        deepest = max(deepest, int(it))
    total = total[: deepest + 1]
    while len(total) > 1 and total[-1] == total[-2]:  # drop the no-change
        total = total[:-1]                            # convergence probe
    return total


def make_geometric_batches(csr: DeviceCSR, cap: int, alpha: float = 0.5):
    """Bit-parallel device geometric centralities: one program runs
    `nbatch` 64-source reachability batches (fori inside jit) and
    accumulates, per SOURCE, the distance moments Brandes-free geometric
    centralities need (GeometricCentralities.java:70/211 runs one BFS per
    node on a thread pool; here 64 sources are bit-packed per batch):

      reach[s]    = #{y != s : d(s,y) < inf}
      sumdist[s]  = sum_y d(s,y)
      sumrecip[s] = sum_y 1/d(s,y)          (harmonic, float32)
      sumexp[s]   = sum_y alpha^d(s,y)      (exponential, float32)

    Returns run(start_batch, nbatch) -> (reach i32[nbatch*64],
    sumdist i32[nbatch*64], sumrecip f32[nbatch*64], sumexp f32[nbatch*64]).
    closeness/lin derive from these on host (algo/centralities formulas)."""
    n = csr.n
    src_by_dst, seg_start, last_in = (csr.src_by_dst, csr.seg_start,
                                      csr.last_in)
    rows = np.zeros((64, 2), dtype=np.uint32)
    for i in range(64):
        rows[i, i // 32] = np.uint32(1) << np.uint32(i % 32)
    rows = jnp.asarray(rows)

    def perbit_counts(new0, new1):
        """int32[64]: number of nodes whose bit i is set in (new0, new1)."""
        out = []
        for w, word in enumerate((new0, new1)):
            for i in range(32):
                out.append(jnp.sum(
                    ((word >> jnp.uint32(i)) & jnp.uint32(1)).astype(I32)))
        return jnp.stack(out)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(start_batch, nbatch):
        def one_batch(b, acc):
            reach_a, dist_a, recip_a, exp_a = acc
            sources = (start_batch + b) * 64 + jnp.arange(64, dtype=I32)
            sources = jnp.where(sources < n, sources, n)
            masks = jnp.zeros((n, 2), jnp.uint32).at[sources].max(
                rows, mode="drop")

            def body(st):
                masks, reach, sumd, sumr, sume, it, _ = st
                vals0 = masks[src_by_dst, 0]
                vals1 = masks[src_by_dst, 1]
                or0 = _seg_or_scan(vals0, seg_start)
                or1 = _seg_or_scan(vals1, seg_start)
                upd0 = jnp.where(last_in >= 0,
                                 or0[jnp.maximum(last_in, 0)], 0)
                upd1 = jnp.where(last_in >= 0,
                                 or1[jnp.maximum(last_in, 0)], 0)
                nb0 = upd0 & ~masks[:, 0]
                nb1 = upd1 & ~masks[:, 1]
                cnew = perbit_counts(nb0, nb1)          # per-source @ dist it+1
                d = (it + 1).astype(jnp.float32)
                cf = cnew.astype(jnp.float32)
                reach = reach + cnew
                sumd = sumd + cnew * (it + 1)
                sumr = sumr + cf / d
                sume = sume + cf * jnp.power(jnp.float32(alpha), d)
                masks = jnp.stack([masks[:, 0] | nb0, masks[:, 1] | nb1],
                                  axis=1)
                changed = jnp.sum(cnew) > 0
                return (masks, reach, sumd, sumr, sume, it + 1,
                        changed.astype(I32))

            def cond(st):
                return (st[6] > 0) & (st[5] < cap)

            z64 = jnp.zeros(64, I32)
            zf = jnp.zeros(64, jnp.float32)
            _, reach, sumd, sumr, sume, _, _ = jax.lax.while_loop(
                cond, body,
                (masks, z64, z64, zf, zf, jnp.int32(0), jnp.int32(1)))
            return (reach_a.at[b].set(reach), dist_a.at[b].set(sumd),
                    recip_a.at[b].set(sumr), exp_a.at[b].set(sume))

        acc0 = (jnp.zeros((nbatch, 64), I32), jnp.zeros((nbatch, 64), I32),
                jnp.zeros((nbatch, 64), jnp.float32),
                jnp.zeros((nbatch, 64), jnp.float32))
        reach, sumd, sumr, sume = jax.lax.fori_loop(0, nbatch, one_batch,
                                                    acc0)
        return (reach.reshape(-1), sumd.reshape(-1), sumr.reshape(-1),
                sume.reshape(-1))

    return run


def geometric_centralities_device(csr: DeviceCSR, *, alpha: float = 0.5,
                                  max_iters: int | None = None,
                                  batches_per_dispatch: int = 64):
    """Device path of algo/centralities.geometric_centralities: closeness,
    harmonic, Lin, exponential and reachable counts for every node, via
    bit-parallel 64-source BFS batches looped inside the jit.

    Returns (closeness, harmonic, lin, exponential, reachable) float64
    arrays matching the host GeometricCentralities fields exactly
    (reachable INCLUDES the source itself, the reference convention)."""
    n = csr.n
    cap = int(max_iters if max_iters is not None else n)
    run = make_geometric_batches(csr, cap, alpha)
    nbatches = -(-n // 64)
    reach = np.zeros(nbatches * 64, dtype=np.int64)
    sumd = np.zeros(nbatches * 64, dtype=np.int64)
    sumr = np.zeros(nbatches * 64, dtype=np.float64)
    sume = np.zeros(nbatches * 64, dtype=np.float64)
    for start in range(0, nbatches, batches_per_dispatch):
        k = min(batches_per_dispatch, nbatches - start)
        r, d, h, e = run(jnp.int32(start), k)
        sl = slice(start * 64, start * 64 + k * 64)
        reach[sl] = np.asarray(r)
        sumd[sl] = np.asarray(d)
        sumr[sl] = np.asarray(h)
        sume[sl] = np.asarray(e)
    reach, sumd, sumr, sume = reach[:n], sumd[:n], sumr[:n], sume[:n]
    closeness = np.where(sumd > 0, 1.0 / np.where(sumd > 0, sumd, 1), 0.0)
    harmonic = sumr
    reachable = reach + 1  # reference convention: self counts
    lin = np.where(sumd > 0, reachable.astype(np.float64) ** 2
                   / np.where(sumd > 0, sumd, 1), 1.0)
    return closeness, harmonic, lin, sume, reachable


def eccentricity(csr: DeviceCSR, source: int) -> int:
    """Eccentricity of `source` (max finite BFS distance) on device."""
    dist = bfs_distances(csr, source)
    return int(jnp.max(dist))


def make_betweenness_batches(csr: DeviceCSR, cap: int, batch: int = 16):
    """Batched device Brandes: `batch` sources per dispatch, each a
    forward arc-parallel BFS with path counting followed by a reverse
    per-level dependency accumulation (BetweennessCentrality.java:256; the
    reference farms one source per thread, :100).  Path counts and
    dependencies are float32 (exact up to 2^24 paths; the host oracle's
    uint64 + overflow check remains the exact reference).

    Returns run(start_source) -> float32[n] partial betweenness from
    sources [start_source, start_source + batch)."""
    n = csr.n
    src, dst = csr.src, csr.dst
    F32 = jnp.float32

    @jax.jit
    def run(start_source):
        sources = start_source + jnp.arange(batch, dtype=I32)
        valid = sources < n
        sclip = jnp.where(valid, sources, 0)
        B = batch
        dist = jnp.full((B, n), -1, dtype=I32)
        dist = dist.at[jnp.arange(B), sclip].set(
            jnp.where(valid, 0, -1))
        sigma = jnp.zeros((B, n), F32)
        sigma = sigma.at[jnp.arange(B), sclip].set(
            jnp.where(valid, 1.0, 0.0))

        def fwd_cond(st):
            _, _, lev, alive = st
            return (alive > 0) & (lev < cap)

        def fwd_body(st):
            dist, sigma, lev, _ = st
            on = dist[:, src] == lev                      # (B, m)
            hit = jnp.zeros((B, n), I32).at[:, dst].max(on.astype(I32))
            newf = (hit > 0) & (dist < 0)
            dist = jnp.where(newf, lev + 1, dist)
            into_next = on & (dist[:, dst] == lev + 1)
            contrib = jnp.where(into_next, sigma[:, src], 0.0)
            sigma = sigma.at[:, dst].add(contrib)
            return dist, sigma, lev + 1, jnp.sum(newf.astype(I32))

        dist, sigma, maxlev, _ = jax.lax.while_loop(
            fwd_cond, fwd_body, (dist, sigma, jnp.int32(0), jnp.int32(1)))

        def bwd_body(i, delta):
            lev = maxlev - 1 - i
            on = dist[:, src] == lev
            down = on & (dist[:, dst] == lev + 1)
            safe_sig = jnp.where(sigma[:, dst] > 0, sigma[:, dst], 1.0)
            term = jnp.where(down,
                             sigma[:, src] / safe_sig
                             * (1.0 + delta[:, dst]), 0.0)
            return delta.at[:, src].add(term)

        delta = jax.lax.fori_loop(0, jnp.maximum(maxlev, 0), bwd_body,
                                  jnp.zeros((B, n), F32))
        # exclude the source itself; sum over the batch
        delta = delta.at[jnp.arange(B), sclip].set(0.0)
        delta = jnp.where(valid[:, None], delta, 0.0)
        return jnp.sum(delta, axis=0)

    return run


def betweenness_device(csr: DeviceCSR, *, batch: int = 16,
                       max_levels: int | None = None) -> np.ndarray:
    """Betweenness centrality for every node via batched device Brandes;
    float64 accumulation on host across batches."""
    n = csr.n
    cap = int(max_levels if max_levels is not None else n)
    run = make_betweenness_batches(csr, cap, batch)
    out = np.zeros(n, dtype=np.float64)
    for start in range(0, n, batch):
        out += np.asarray(run(jnp.int32(start)), dtype=np.float64)
    return out
