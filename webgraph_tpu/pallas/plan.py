"""Host-side planning for the in-kernel (Pallas) BVGraph decoder.

The kernel processes the graph as a sequence of *node blocks* (the Pallas
grid dimension).  Each block covers a contiguous node range whose records
fit a fixed-size VMEM word window and whose output fits a fixed-size VMEM
arc pool.  The planner runs once per graph at load time (analogous to the
reference's `.obl`/`.outdegrees` caches, BVGraph.java:362-364): a vectorized
host scan of the structure codes (outdegree/reference/block-count/blocks/
interval-count) yields per-node counts, from which the block partition and
all static kernel bounds are derived.

The scan is the same phase-1 logic as the NumPy blueprint
(``formats/bvgraph_np.py``) — the scalar codec in ``bits/bitstream.py``
remains the correctness oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from webgraph_tpu.bits import vcodes as V


@dataclass
class StructureScan:
    """Per-node structural counts from the host pre-scan."""

    d: np.ndarray            # outdegree
    ref: np.ndarray          # reference (-1 = none, 0 = explicit none)
    block_count: np.ndarray  # copy-block count
    int_count: np.ndarray    # interval count
    res_count: np.ndarray    # residual count
    copied: np.ndarray       # arcs copied from the parent list
    depth: np.ndarray        # global reference-chain depth
    pos_after_ic: np.ndarray  # bit cursor after the interval-count code


def scan_structure(g) -> StructureScan:
    """Vectorized host scan of all structure codes (no residual decode)."""
    s = g.settings
    n = g.num_nodes()
    from webgraph_tpu.bits.bitstream import as_u64_words

    words = np.concatenate([as_u64_words(g._words), np.zeros(2, dtype=np.uint64)])
    if g.bit_offsets is None:
        raise ValueError("pallas decode requires the offsets index")
    pos = g.bit_offsets[:n].astype(np.int64).copy()

    read_outd = V.make_reader(s.outdegree_coding, s.zeta_k)
    read_ref = V.make_reader(s.reference_coding, s.zeta_k)
    read_bcnt = V.make_reader(s.block_count_coding, s.zeta_k)
    read_block = V.make_reader(s.block_coding, s.zeta_k)

    d, pos = read_outd(words, pos)
    nonempty = d > 0
    ref = np.full(n, -1, dtype=np.int64)
    if s.window_size > 0:
        idx = np.flatnonzero(nonempty)
        r, p = read_ref(words, pos[idx])
        ref[idx] = r
        pos[idx] = p
    has_ref = ref > 0

    block_count = np.zeros(n, dtype=np.int64)
    idx = np.flatnonzero(has_ref)
    if len(idx):
        bc, p = read_bcnt(words, pos[idx])
        block_count[idx] = bc
        pos[idx] = p

    copied = np.zeros(n, dtype=np.int64)
    total_b = np.zeros(n, dtype=np.int64)
    if len(idx):
        order = idx[np.argsort(-block_count[idx], kind="stable")]
        counts = block_count[order]
        lane_pos = pos[order].copy()
        for step in range(int(counts[0]) if len(counts) else 0):
            k = int(np.searchsorted(-counts, -step, side="left"))
            if k == 0:
                break
            b, p = read_block(words, lane_pos[:k])
            lane_pos[:k] = p
            v = b + (0 if step == 0 else 1)
            act = order[:k]
            total_b[act] += v
            if step % 2 == 0:
                copied[act] += v
        pos[order] = lane_pos
        even = np.flatnonzero(has_ref & ((block_count & 1) == 0))
        copied[even] += d[even - ref[even]] - total_b[even]

    extra = np.where(has_ref, d - copied, d)
    extra[~nonempty] = 0

    int_count = np.zeros(n, dtype=np.int64)
    interval_arcs = np.zeros(n, dtype=np.int64)
    if s.min_interval_length != 0:
        idx = np.flatnonzero(extra > 0)
        if len(idx):
            ic, p = V.read_gamma(words, pos[idx])
            int_count[idx] = ic
            pos[idx] = p
        # interval lengths: needed for residual counts -> walk intervals
        idx = np.flatnonzero(int_count > 0)
        if len(idx):
            order = idx[np.argsort(-int_count[idx], kind="stable")]
            counts = int_count[order]
            lane_pos = pos[order].copy()
            for step in range(int(counts[0])):
                k = int(np.searchsorted(-counts, -step, side="left"))
                if k == 0:
                    break
                _l, p = V.read_gamma(words, lane_pos[:k])
                ln, p2 = V.read_gamma(words, p)
                lane_pos[:k] = p2
                interval_arcs[order[:k]] += ln + s.min_interval_length
            # NOTE: pos is NOT advanced here for nodes with intervals — the
            # kernel re-reads intervals itself; pos_after_ic below is the
            # cursor right after the interval-count code.

    res_count = extra - interval_arcs

    depth = np.where(has_ref, -1, 0)
    parent = np.where(has_ref, np.arange(n) - ref, -1)
    while (depth < 0).any():
        pm = (depth < 0) & (parent >= 0) & (depth[np.maximum(parent, 0)] >= 0)
        if not pm.any():
            raise ValueError("cyclic reference chain")
        depth[pm] = depth[parent[pm]] + 1

    return StructureScan(
        d=d.astype(np.int32),
        ref=ref.astype(np.int32),
        block_count=block_count.astype(np.int32),
        int_count=int_count.astype(np.int32),
        res_count=res_count.astype(np.int32),
        copied=copied.astype(np.int32),
        depth=depth.astype(np.int32),
        pos_after_ic=pos.astype(np.int64),
    )


@dataclass
class BlockPlan:
    """Static partition + bounds for one kernel compilation.

    All bounds are maxima over blocks, padded to hardware-friendly sizes, so
    one kernel compilation serves every block of the graph.
    """

    # per-block arrays (length nb)
    node_start: np.ndarray   # first node of block
    node_count: np.ndarray   # nodes in block (<= lanes)
    word_row: np.ndarray     # window start, in 128-word (4096-bit) rows
    csr_start: np.ndarray    # CSR arc offset of the block's first node
    arc_count: np.ndarray    # arcs emitted by the block
    # static bounds
    lanes: int               # nodes per block capacity (multiple of 128)
    window_words: int        # VMEM word-window capacity (multiple of 128)
    pool_arcs: int           # VMEM output-pool capacity (block arcs)
    halo_arcs: int           # VMEM halo capacity (last `window` lists)
    extra_arcs: int          # max per-block referenced-node extras total
    runs_pairs: int          # max per-block keep-run pair total
    max_bc: int              # max copy-block count of any node
    max_ic: int              # max interval count of any node
    max_d: int               # max outdegree
    max_depth: int           # max in-block chain depth
    n: int = 0
    m: int = 0

    @property
    def num_blocks(self) -> int:
        return len(self.node_start)


def plan_blocks(
    g,
    scan: StructureScan,
    lanes: int = 1024,
    window_words: int = 4096,
    pool_arcs: int = 16384,
) -> BlockPlan:
    """Greedy partition of [0, n) into blocks obeying the VMEM bounds.

    A block [a, b) must satisfy:
      * b - a <= lanes
      * the bit span of records a..b-1 (from the row-aligned window start)
        fits the word window with a 256-word slide/peek margin
      * sum of outdegrees <= pool_arcs
    Single-node blocks always fit by construction provided window_words and
    pool_arcs exceed the largest single record / outdegree (asserted).
    """
    n = g.num_nodes()
    bo = g.bit_offsets.astype(np.int64)
    d = scan.d.astype(np.int64)
    w = g.settings.window_size

    # window start is aligned DOWN to a 128-word row; budget leaves a
    # 384-word margin (the kernel slides its 256-word tables only up to
    # (WROWS-3)*128 and peeks 2 extra words past any code)
    span_budget = (window_words - 384) * 32
    span_bits = np.diff(bo)
    max_record = int(span_bits.max()) if n else 0
    assert max_record + 4096 <= span_budget, (
        f"record of {max_record} bits exceeds window ({window_words} words)"
    )
    assert int(d.max() if n else 0) <= pool_arcs, "outdegree exceeds pool"

    csr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(d, out=csr[1:])

    node_start, node_count, word_row, csr_start, arc_count = [], [], [], [], []
    i = 0
    while i < n:
        j = min(i + lanes, n)
        # bit-span bound: record bits are relative to the aligned window row
        row0 = bo[i] >> 12
        limit_bit = (row0 << 12) + span_budget
        j = min(j, int(np.searchsorted(bo, limit_bit, side="right") - 1))
        j = max(j, i + 1)
        # arc bound
        c = csr[i + 1 : min(i + lanes, n) + 1] - csr[i]
        k = int(np.searchsorted(c, pool_arcs, side="right"))
        j = min(j, max(i + k, i + 1))
        node_start.append(i)
        node_count.append(j - i)
        word_row.append(int(row0))
        csr_start.append(int(csr[i]))
        arc_count.append(int(csr[j] - csr[i]))
        i = j

    # the halo protocol carries only the previous block's lists: every
    # non-final block must cover at least `w` nodes
    if len(node_start) > 1 and w > 0:
        small = [c for c in node_count[:-1] if c < w]
        assert not small, (
            f"block with {min(small)} < window={w} nodes; raise window_words"
        )

    # halo: max over blocks of the outdegree sum of the `w` preceding nodes
    halo = 0
    for a in node_start:
        lo = max(0, a - w)
        halo = max(halo, int(csr[a] - csr[lo]))

    # per-block EXTRAS (referenced nodes only) and RUNS (keep-run pairs)
    has_ref = scan.ref > 0
    extras = np.where(has_ref, d - scan.copied.astype(np.int64), 0)
    runs = np.where(has_ref, (scan.block_count.astype(np.int64) + 1) >> 1, 0)
    ecum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(extras, out=ecum[1:])
    rcum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(runs, out=rcum[1:])
    starts = np.asarray(node_start + [n], dtype=np.int64)
    extra_arcs = int((ecum[starts[1:]] - ecum[starts[:-1]]).max()) if n else 0
    runs_pairs = int((rcum[starts[1:]] - rcum[starts[:-1]]).max()) if n else 0

    # in-block depth (parents before the block are final => depth 0)
    depth_in = np.zeros(n, dtype=np.int64)
    max_depth = 0
    starts = np.asarray(node_start + [n])
    parent = np.where(scan.ref > 0, np.arange(n) - scan.ref, -1)
    for bi in range(len(node_start)):
        a, b = int(starts[bi]), int(starts[bi + 1])
        dep = np.where(parent[a:b] >= a, -1, 0)
        while (dep < 0).any():
            pm = (dep < 0) & (dep[np.maximum(parent[a:b] - a, 0)] >= 0)
            dep[pm] = dep[np.maximum(parent[a:b] - a, 0)][pm] + 1
        depth_in[a:b] = dep
        max_depth = max(max_depth, int(dep.max()))

    assert max(arc_count, default=0) <= pool_arcs

    return BlockPlan(
        node_start=np.asarray(node_start, np.int32),
        node_count=np.asarray(node_count, np.int32),
        word_row=np.asarray(word_row, np.int32),
        csr_start=np.asarray(csr_start, np.int32),
        arc_count=np.asarray(arc_count, np.int32),
        lanes=lanes,
        window_words=window_words,
        pool_arcs=pool_arcs,
        halo_arcs=int(max(128, ((halo + 127) // 128) * 128)),
        extra_arcs=extra_arcs,
        runs_pairs=runs_pairs,
        max_bc=int(scan.block_count.max() if n else 0),
        max_ic=int(scan.int_count.max() if n else 0),
        max_d=int(d.max() if n else 0),
        max_depth=max_depth,
        n=n,
        m=int(csr[-1]),
    )
