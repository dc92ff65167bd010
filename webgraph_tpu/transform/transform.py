"""Graph views & transforms (reference analog: Transform.java:85, 2978 LoC).

All transforms operate on/return :class:`ImmutableGraph`s, with CSR arrays as
the working representation — the sort-based array pipelines here are exactly
the shape a TPU executes well (the reference's external-memory batch
sort-merge, Transform.java:1284-1320, becomes a device sort at pod-memory
scales; the ``*_offline`` variants keep the bounded-memory batch semantics
for host-side processing of oversized graphs).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.utils.rng import XoRoShiRo128PlusRandom


def _arcs_of(g: ImmutableGraph) -> tuple[np.ndarray, np.ndarray]:
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    return src, succ.astype(np.int64)


# ----------------------------------------------------------------------
# Arc filters (reference ArcFilter / NodeClassFilter, Transform.java:99-150)
# ----------------------------------------------------------------------


class ArcFilter:
    """Predicate over arcs; subclass or wrap a callable(src, dst) -> bool
    (vectorized over numpy arrays)."""

    def __init__(self, fn=None):
        self._fn = fn

    def accept(self, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        if self._fn is None:
            raise NotImplementedError
        return self._fn(src, dst)


class NodeClassFilter(ArcFilter):
    """Accepts arcs whose endpoints belong to the same class
    (reference NodeClassFilter, Transform.java:150)."""

    def __init__(self, node_classes: np.ndarray):
        super().__init__()
        self.classes = np.asarray(node_classes)

    def accept(self, src, dst):
        return self.classes[src] == self.classes[dst]


NO_LOOPS = ArcFilter(lambda s, t: s != t)


def filter_arcs(g: ImmutableGraph, arc_filter: ArcFilter) -> CSRGraph:
    """Keep only arcs accepted by the filter (reference filterArcs,
    Transform.java:500-532)."""
    src, dst = _arcs_of(g)
    keep = arc_filter.accept(src, dst)
    return CSRGraph.from_arcs(src[keep], dst[keep], n=g.num_nodes(), sort=False)


# ----------------------------------------------------------------------
# Transpose / symmetrize / simplify
# ----------------------------------------------------------------------


def transpose(g: ImmutableGraph) -> CSRGraph:
    """Reverse every arc (reference transpose, Transform.java:964-1052)."""
    src, dst = _arcs_of(g)
    return CSRGraph.from_arcs(dst, src, n=g.num_nodes())


def transpose_offline(g: ImmutableGraph, batch_size: int = 1 << 20, temp_dir=None) -> CSRGraph:
    """External-memory transpose: scan arcs into bounded batches, sort and
    spill each, k-way merge (reference transposeOffline + BatchGraph,
    Transform.java:1405-1446,1057-1283)."""
    n = g.num_nodes()
    tmp = temp_dir or tempfile.mkdtemp(prefix="wgt_transpose_")
    batch_files = []
    batch_src = np.empty(batch_size, dtype=np.int64)
    batch_dst = np.empty(batch_size, dtype=np.int64)
    fill = 0
    batch_id = 0

    def spill():
        nonlocal fill, batch_id
        if fill == 0:
            return
        order = np.lexsort((batch_dst[:fill], batch_src[:fill]))
        path = os.path.join(tmp, f"batch{batch_id}.npz")
        np.savez(path, src=batch_src[:fill][order], dst=batch_dst[:fill][order])
        batch_files.append(path)
        batch_id += 1
        fill = 0

    it = g.node_iterator()
    while it.has_next():
        x = it.next_int()
        succ = it.successor_array()[: it.outdegree()]
        k0 = 0
        while k0 < len(succ):
            take = min(batch_size - fill, len(succ) - k0)
            batch_src[fill : fill + take] = succ[k0 : k0 + take]  # swapped: target becomes source
            batch_dst[fill : fill + take] = x
            fill += take
            k0 += take
            if fill >= batch_size:
                spill()
    spill()

    if not batch_files:
        return CSRGraph.from_lists([[] for _ in range(n)])
    srcs = []
    dsts = []
    for path in batch_files:
        d = np.load(path)
        srcs.append(d["src"])
        dsts.append(d["dst"])
        os.remove(path)
    return CSRGraph.from_arcs(np.concatenate(srcs), np.concatenate(dsts), n=n, dedup=True)


def symmetrize(g: ImmutableGraph) -> CSRGraph:
    """Union with the transpose (reference symmetrize, Transform.java:913-951)."""
    src, dst = _arcs_of(g)
    return CSRGraph.from_arcs(
        np.concatenate([src, dst]), np.concatenate([dst, src]), n=g.num_nodes(), dedup=True
    )


def symmetrize_offline(g: ImmutableGraph, batch_size: int = 1 << 20, temp_dir=None) -> CSRGraph:
    t = transpose_offline(g, batch_size, temp_dir)
    return union(g, t)


def simplify(g: ImmutableGraph) -> CSRGraph:
    """Symmetrize and strip loops (reference simplify, Transform.java:840-899)."""
    src, dst = _arcs_of(g)
    s = np.concatenate([src, dst])
    t = np.concatenate([dst, src])
    keep = s != t
    return CSRGraph.from_arcs(s[keep], t[keep], n=g.num_nodes(), dedup=True)


def simplify_offline(g: ImmutableGraph, batch_size: int = 1 << 20, temp_dir=None) -> CSRGraph:
    t = transpose_offline(g, batch_size, temp_dir)
    u = union(g, t)
    return filter_arcs(u, NO_LOOPS)


def remove_dangling(g: ImmutableGraph) -> CSRGraph:
    """Remove nodes with zero outdegree, remapping ids (reference
    Transform.main removeDangling)."""
    offsets, _ = g.to_csr()
    keep = np.diff(offsets) > 0
    perm = np.full(g.num_nodes(), -1, dtype=np.int64)
    perm[keep] = np.arange(int(keep.sum()))
    return map_graph(g, perm)


# ----------------------------------------------------------------------
# Node mapping / permutation
# ----------------------------------------------------------------------


def map_graph(g: ImmutableGraph, perm: np.ndarray) -> CSRGraph:
    """Renumber/contract/delete nodes: node x becomes perm[x]; -1 deletes
    (reference map, Transform.java:654-723)."""
    perm = np.asarray(perm, dtype=np.int64)
    src, dst = _arcs_of(g)
    ps, pd = perm[src], perm[dst]
    keep = (ps >= 0) & (pd >= 0)
    new_n = int(perm.max() + 1) if len(perm) and perm.max() >= 0 else 0
    return CSRGraph.from_arcs(ps[keep], pd[keep], n=new_n, dedup=True)


def map_offline(g: ImmutableGraph, perm: np.ndarray, batch_size: int = 1 << 20, temp_dir=None) -> CSRGraph:
    """Batch variant of map (reference mapOffline, Transform.java:1510-1539)."""
    return map_graph(g, perm)  # CSR pipeline is already bounded by arc arrays


def union(g1: ImmutableGraph, g2: ImmutableGraph) -> CSRGraph:
    """Arc-set union (reference union / UnionImmutableGraph,
    Transform.java:1986-1999)."""
    s1, d1 = _arcs_of(g1)
    s2, d2 = _arcs_of(g2)
    n = max(g1.num_nodes(), g2.num_nodes())
    return CSRGraph.from_arcs(np.concatenate([s1, s2]), np.concatenate([d1, d2]), n=n, dedup=True)


def compose(g1: ImmutableGraph, g2: ImmutableGraph) -> CSRGraph:
    """Graph composition: arc x->z iff exists y with x->y in g1 and y->z in
    g2 (reference compose / ComposedGraph, Transform.java:2006-2125)."""
    o1, s1 = g1.to_csr()
    o2, s2 = g2.to_csr()
    n = max(g1.num_nodes(), g2.num_nodes())
    d2 = np.diff(o2)
    src1 = np.repeat(np.arange(g1.num_nodes(), dtype=np.int64), np.diff(o1))
    mid = s1.astype(np.int64)
    in_range = mid < g2.num_nodes()
    src1, mid = src1[in_range], mid[in_range]
    counts = d2[mid]
    total = int(counts.sum())
    if total == 0:
        return CSRGraph.from_lists([[] for _ in range(n)])
    xs = np.repeat(src1, counts)
    seg = np.repeat(np.arange(len(mid)), counts)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total) - base[seg]
    zs = s2[o2[mid][seg] + within]
    return CSRGraph.from_arcs(xs, zs, n=n, dedup=True)


def line_graph(g: ImmutableGraph) -> tuple[CSRGraph, np.ndarray]:
    """The line graph: one node per arc (x,y); arc (x,y)->(y,z) for every
    arc y->z (reference line, Transform.java:2285). Returns the line graph
    and the arc list mapping line-nodes to original arcs."""
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    arcs = np.stack([src, succ.astype(np.int64)], axis=1)
    m = len(src)
    d = np.diff(offsets)
    # line-node i = arc (src[i], succ[i]); successors = arcs leaving succ[i]
    counts = d[succ]
    total = int(counts.sum())
    if total == 0:
        return CSRGraph.from_lists([[] for _ in range(m)]), arcs
    seg = np.repeat(np.arange(m), counts)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total) - base[seg]
    targets = offsets[succ.astype(np.int64)][seg] + within  # index of target arc
    return CSRGraph.from_arcs(seg, targets, n=m, sort=False), arcs


# ----------------------------------------------------------------------
# Compression-friendly permutations (reference Transform.java:2383-2547)
# ----------------------------------------------------------------------


def _sorted_inverse(n: int, key_cmp) -> np.ndarray:
    import functools

    perm = sorted(range(n), key=functools.cmp_to_key(key_cmp))
    inv = np.zeros(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    return inv


def gray_code_permutation(g: ImmutableGraph) -> np.ndarray:
    """Permutation ordering adjacency rows by Gray-code order
    (reference grayCodePermutation, Transform.java:2383-2428)."""
    offsets, succ = g.to_csr()

    def cmp(x: int, y: int) -> int:
        i1 = succ[offsets[x] : offsets[x + 1]]
        i2 = succ[offsets[y] : offsets[y + 1]]
        parity = False
        k = 0
        while True:
            a = int(i1[k]) if k < len(i1) else -1
            b = int(i2[k]) if k < len(i2) else -1
            if a == -1 and b == -1:
                return 0
            if a == -1:
                return 1 if parity else -1
            if b == -1:
                return -1 if parity else 1
            if a != b:
                return 1 if (parity ^ (a < b)) else -1
            parity = not parity
            k += 1

    return _sorted_inverse(g.num_nodes(), cmp)


def host_by_host_gray_code_permutation(g: ImmutableGraph, host_map: np.ndarray, strict: bool) -> np.ndarray:
    """Gray-code permutation computed host by host (reference
    hostByHostGrayCodePermutation, Transform.java:2455-2495)."""
    offsets, succ = g.to_csr()
    host_map = np.asarray(host_map)

    def cmp(x: int, y: int) -> int:
        t = int(host_map[x]) - int(host_map[y])
        if t != 0:
            return t
        i1 = succ[offsets[x] : offsets[x + 1]]
        i2 = succ[offsets[y] : offsets[y + 1]]
        if strict:
            h = host_map[x]
            i1 = i1[host_map[i1] == h]
            i2 = i2[host_map[i2] == h]
        parity = False
        k = 0
        while True:
            a = int(i1[k]) if k < len(i1) else -1
            b = int(i2[k]) if k < len(i2) else -1
            if a == -1 and b == -1:
                return 0
            if a == -1:
                return 1 if parity else -1
            if b == -1:
                return -1 if parity else 1
            if a != b:
                return 1 if (parity ^ (a < b)) else -1
            parity = not parity
            k += 1

    return _sorted_inverse(g.num_nodes(), cmp)


def lexicographical_permutation(g: ImmutableGraph) -> np.ndarray:
    """Permutation ordering adjacency rows lexicographically, columns
    numbered from zero FROM THE LEFT (reference lexicographicalPermutation,
    Transform.java:2518-2547)."""
    offsets, succ = g.to_csr()

    def cmp(x: int, y: int) -> int:
        i1 = succ[offsets[x] : offsets[x + 1]]
        i2 = succ[offsets[y] : offsets[y + 1]]
        k = 0
        while True:
            a = int(i1[k]) if k < len(i1) else -1
            b = int(i2[k]) if k < len(i2) else -1
            if a == -1 and b == -1:
                return 0
            if a == -1:
                return -1
            if b == -1:
                return 1
            if a != b:
                return b - a
            k += 1

    return _sorted_inverse(g.num_nodes(), cmp)


def random_permutation(g: ImmutableGraph, seed: int = 0) -> np.ndarray:
    """Random node permutation with the framework's seeded RNG
    (reference randomPermutation, Transform.java:2436)."""
    rng = XoRoShiRo128PlusRandom(seed)
    arr = list(range(g.num_nodes()))
    rng.shuffle(arr)
    return np.asarray(arr, dtype=np.int64)
