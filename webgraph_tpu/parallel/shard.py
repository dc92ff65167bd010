"""Node-range sharding of ONE real BVGraph stream across a device mesh.

Every shard decodes a contiguous node range of the SAME bitstream under
`shard_map` (SPMD: one compiled program, per-field-maximum static sizes).
Cross-boundary reference chains are handled exactly the way the reference
primes a mid-graph iterator window (BVGraph.java:1173-1183):

  * each shard's slice is extended BACKWARD by a ghost margin of
    ``window_size * max_chain_depth`` nodes, so every ancestor a real
    node's copy chain can touch is decoded inside the slice;
  * the outdegrees of the ``window_size`` nodes just before the slice ride
    in as a side input (``pre_d``) so implicit-tail lengths crossing the
    slice boundary resolve exactly;
  * ghosts beyond the margin decode structurally (their sizes are exact)
    but their copies are dropped — nothing real depends on them.

The decoded successor values of a slice come out uniformly shifted by the
slice start (in-record anchors are node-relative) and are re-shifted in the
SPMD body.  Reassembly slices each shard's real range out of its local CSR.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from webgraph_tpu.bits import jcodes as J
from webgraph_tpu.bits.bitstream import OutputBitStream, words_to_bytes, as_u64_words
from webgraph_tpu.formats import bvgraph_jax
from webgraph_tpu.pallas.plan import scan_structure


@dataclass
class ShardPlan:
    """Host-side plan for an SPMD node-range decode."""

    num_shards: int
    n: int
    m: int
    slice_len: int            # common padded slice length L
    starts: np.ndarray        # real range starts a_s (num_shards,)
    ends: np.ndarray          # real range ends b_s
    slice_starts: np.ndarray  # ghost-extended slice starts A_s
    margin: int               # ghost nodes per shard (w * max chain depth)
    sizes: dict               # per-field maxima (static buffer sizes)
    c_ofs: tuple              # common per-round copy-slot offsets
    e_ofs: tuple              # common per-round extras offsets
    # packed device inputs
    bit_offsets: np.ndarray   # (S, L) int32 — per-slice record offsets
    pre_d: np.ndarray         # (S, w) int32 — outdegrees before each slice
    node_base: np.ndarray     # (S,) int32 — global id of slice node 0
    words: np.ndarray         # padded uint32 word stream (+ empty record)


def _slice_depth(ref: np.ndarray) -> np.ndarray:
    """Chain depth within a slice, parents clamped at the slice start —
    mirrors the device's clamped gather semantics exactly."""
    L = len(ref)
    has_in = (ref > 0) & (np.arange(L) - ref >= 0)
    parent = np.where(has_in, np.arange(L) - ref, -1)
    depth = np.where(has_in, -1, 0)
    while (depth < 0).any():
        pm = (depth < 0) & (depth[np.maximum(parent, 0)] >= 0)
        if not pm.any():  # pragma: no cover - cycles are impossible (parent < i)
            raise ValueError("cyclic reference chain")
        depth[pm] = depth[parent[pm]] + 1
    return depth


def plan_node_shards(g, num_shards: int) -> ShardPlan:
    """Split [0, n) into ``num_shards`` contiguous ranges and compute the
    common static sizes from ONE host structure scan."""
    s = g.settings
    w = s.window_size
    n = g.num_nodes()
    scan = scan_structure(g)
    d = scan.d.astype(np.int64)
    ref = scan.ref.astype(np.int64)
    bc = scan.block_count.astype(np.int64)
    ic = scan.int_count.astype(np.int64)
    rc = scan.res_count.astype(np.int64)
    has_ref = ref > 0
    extra = np.where(has_ref, d - scan.copied.astype(np.int64), d)
    extra[d == 0] = 0
    int_arcs = extra - rc
    margin = w * (int(scan.depth.max()) if n else 0)

    bounds = np.linspace(0, n, num_shards + 1).astype(np.int64)
    starts, ends = bounds[:-1], bounds[1:]
    slice_starts = np.maximum(starts - margin, 0)
    L = int((ends - slice_starts).max()) if num_shards else 0

    bo = g.bit_offsets.astype(np.int64)

    # pad record: an outdegree-0 record appended past the stream end
    obs = OutputBitStream()
    obs.write(s.outdegree_coding, 0, s.zeta_k)
    pad_bytes = obs.to_bytes()
    stream_bytes = words_to_bytes(as_u64_words(g._words), g._bit_length)
    pad_bit = 8 * len(stream_bytes)
    full = stream_bytes + pad_bytes
    words = J.words_from_bytes(full)

    S = num_shards
    bit_offsets = np.full((S, L), pad_bit, dtype=np.int64)
    pre_d = np.zeros((S, max(w, 1)), dtype=np.int32)
    node_base = slice_starts.astype(np.int32)

    # per-shard sizes -> common maxima
    fields = {k: 0 for k in (
        "total_blocks", "m", "total_ints", "total_res", "tot_int_arcs",
        "max_depth", "P", "n_items_blocks", "n_items_ints", "n_items_res",
        "n_heavy_blocks", "n_heavy_ints", "n_heavy_res")}
    per_shard_depth = []
    per_shard_slice = []
    for sh in range(S):
        A, b = int(slice_starts[sh]), int(ends[sh])
        Lr = b - A
        bit_offsets[sh, :Lr] = bo[A:b]
        lo = max(A - w, 0)
        if A > 0 and w > 0:
            pre_d[sh, w - (A - lo):] = d[lo:A]
        sl = slice(A, b)
        dep = _slice_depth(ref[sl])
        per_shard_depth.append(dep)
        per_shard_slice.append(sl)
        # parent outdegree: ghosts whose parent precedes the slice get ZERO
        # copy slots (device _stage6_prepare uses the same semantics)
        in_sl = np.arange(Lr) - ref[sl] >= 0
        pl = np.where(has_ref[sl] & in_sl, np.arange(Lr) - ref[sl], 0)
        dp = np.where(has_ref[sl] & in_sl, d[A + pl], 0)
        fields["total_blocks"] = max(fields["total_blocks"], int(bc[sl].sum()))
        fields["m"] = max(fields["m"], int(d[sl].sum()))
        fields["total_ints"] = max(fields["total_ints"], int(ic[sl].sum()))
        fields["total_res"] = max(fields["total_res"], int(rc[sl].sum()))
        fields["tot_int_arcs"] = max(fields["tot_int_arcs"], int(int_arcs[sl].sum()))
        fields["max_depth"] = max(fields["max_depth"], int(dep.max()) if Lr else 0)
        fields["P"] = max(fields["P"], int(dp.sum()))
        fields["n_items_blocks"] = max(fields["n_items_blocks"], int((bc[sl] > 0).sum()))
        fields["n_items_ints"] = max(fields["n_items_ints"], int((ic[sl] > 0).sum()))
        fields["n_items_res"] = max(fields["n_items_res"], int((rc[sl] > 0).sum()))
        fields["n_heavy_blocks"] = max(fields["n_heavy_blocks"], int((bc[sl] > 64).sum()))
        fields["n_heavy_ints"] = max(fields["n_heavy_ints"], int((ic[sl] > 64).sum()))
        fields["n_heavy_res"] = max(fields["n_heavy_res"], int((rc[sl] > 64).sum()))

    n_rounds = fields["max_depth"] + 1
    c_max = np.zeros(n_rounds, dtype=np.int64)
    e_max = np.zeros(n_rounds, dtype=np.int64)
    for sh in range(S):
        sl, dep = per_shard_slice[sh], per_shard_depth[sh]
        Lr = sl.stop - sl.start
        in_sl = np.arange(Lr) - ref[sl] >= 0
        pl = np.where(has_ref[sl] & in_sl, np.arange(Lr) - ref[sl], 0)
        dp = np.where(has_ref[sl] & in_sl, d[sl.start + pl], 0)
        for t in range(n_rounds):
            sel = dep == t
            c_max[t] = max(c_max[t], int(dp[sel].sum()))
            e_max[t] = max(e_max[t], int(extra[sl][sel].sum()))
    c_ofs = tuple(np.concatenate([[0], np.cumsum(c_max)]).astype(int))
    e_ofs = tuple(np.concatenate([[0], np.cumsum(e_max)]).astype(int))

    return ShardPlan(
        num_shards=S, n=n, m=int(d.sum()), slice_len=L,
        starts=starts, ends=ends, slice_starts=slice_starts, margin=margin,
        sizes=fields, c_ofs=c_ofs, e_ofs=e_ofs,
        bit_offsets=bit_offsets.astype(np.int32), pre_d=pre_d,
        node_base=node_base, words=np.asarray(words),
    )


def decode_to_csr_sharded_v6(g, mesh: Mesh):
    """Node-range sharded decode through the STREAMING (v6) kernel: each
    device runs one tile of the same compiled Pallas kernel under
    ``shard_map`` (the tile planner already gives every tile common static
    shapes).  Cross-shard reference chains are handled per-lane by ancestor
    overlap — zero communication during decode (the SPMD analog of
    splitNodeIterators, ImmutableGraph.java:379-409).

    Returns ``(offsets int64[n+1], succ int32[m], tiles)``."""
    from jax import shard_map

    from webgraph_tpu.pallas import decode2 as D2
    from webgraph_tpu.pallas.plan import scan_structure as scan2

    axis = mesh.axis_names[0]
    S = mesh.devices.size
    scan = scan2(g)
    tiles = D2.plan_tiles(g, scan, num_tiles=S)
    n = g.num_nodes()
    while len(tiles) < S:  # degenerate boundaries on tiny graphs: pad
        tiles.append(D2.plan_lanes(g, scan, node_range=(n, n),
                                   slabw_fixed=tiles[0].slabw))
        tiles[-1].lw = tiles[0].lw
        tiles[-1].sb = tiles[0].sb
    worst = max(tiles, key=lambda p: p.max_steps)
    cfg = D2.make_cfg2(g, worst, scan=scan)
    interpret = jax.default_backend() == "cpu"
    fn = D2._compiled2(cfg, interpret)

    w32 = D2._u32_words(g)
    packed = [D2.pack2(g, p, w32) for p in tiles]
    meta = np.stack([mw[0] for mw in packed])          # (S, 32, 8, 128)
    words = np.stack([mw[1] for mw in packed])         # (S, 1024, lw)

    smap = shard_map(
        lambda m_, w_: fn(m_[0], w_[0])[:2],
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    slab, wp = jax.jit(smap)(jnp.asarray(meta), jnp.asarray(words))
    slab = np.asarray(slab).reshape(S, D2.LANES, cfg.slabw)
    wp = np.asarray(wp).reshape(S, -1)

    dd = scan.d.astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dd, out=offsets[1:])
    succ = np.empty(int(offsets[-1]), dtype=np.int32)
    for sh, plan in enumerate(tiles):
        exp = plan.exp_wp
        assert np.array_equal(wp[sh, : len(exp)], exp), \
            f"shard {sh} lane emission counts disagree with the plan"
        lo, hi = plan.lo, plan.hi
        if hi <= lo:
            continue
        flat = slab[sh].reshape(-1)
        base = int(offsets[lo])
        mt = int(offsets[hi]) - base
        take = np.repeat(plan.prow[: hi - lo], dd[lo:hi]) + (
            np.arange(mt) - np.repeat(offsets[lo:hi] - base, dd[lo:hi]))
        succ[base : base + mt] = flat[take]
    return offsets, succ, tiles


def decode_to_csr_sharded(g, mesh: Mesh, plan: ShardPlan | None = None):
    """Decode one BVGraph with its node range sharded over ``mesh``'s first
    axis; returns host-reassembled ``(offsets int64[n+1], succ int32[m])``
    plus the plan (for tests/benchmarks).

    Dispatch: the streaming (v6) Pallas kernel whenever it supports the
    graph's configuration (decode2.supports), else the fused-XLA work-queue
    decoder (every CompressionFlags coding)."""
    from jax import shard_map

    if plan is None:
        from webgraph_tpu.pallas import decode2 as D2

        if D2.supports(g):
            return decode_to_csr_sharded_v6(g, mesh)

    axis = mesh.axis_names[0]
    S = mesh.devices.size
    if plan is None:
        plan = plan_node_shards(g, S)
    assert plan.num_shards == S

    body = bvgraph_jax.make_shard_decode_fn(
        g.settings, plan.sizes, plan.slice_len, plan.c_ofs, plan.e_ofs)

    smap = shard_map(
        lambda wds, bos, pds, nbs: body(wds, bos[0], pds[0], nbs[0]),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )

    def run(wds, bos, pds, nbs):
        offs, succ = smap(wds, bos, pds, nbs)
        return offs, succ

    fn = jax.jit(run)
    offs, succ = fn(
        jnp.asarray(plan.words),
        jnp.asarray(plan.bit_offsets).reshape(S, -1),
        jnp.asarray(plan.pre_d).reshape(S, -1),
        jnp.asarray(plan.node_base).reshape(S, 1),
    )
    offs = np.asarray(offs).reshape(S, -1)
    succ = np.asarray(succ).reshape(S, -1)

    # host reassembly in node order
    out_off = np.zeros(plan.n + 1, dtype=np.int64)
    out_succ = np.zeros(plan.m, dtype=np.int32)
    base = 0
    for sh in range(S):
        gofs = int(plan.starts[sh] - plan.slice_starts[sh])
        cnt = int(plan.ends[sh] - plan.starts[sh])
        lo = int(offs[sh, gofs])
        hi = int(offs[sh, gofs + cnt])
        out_off[plan.starts[sh] : plan.ends[sh]] = base + (
            offs[sh, gofs : gofs + cnt].astype(np.int64) - lo)
        out_succ[base : base + (hi - lo)] = succ[sh, lo:hi]
        base += hi - lo
    out_off[plan.n] = base
    assert base == plan.m, (base, plan.m)
    return out_off, out_succ, plan
