"""Streaming lane-range BVGraph decoder — the v6 in-kernel design.

One Pallas/Mosaic kernel, ONE grid step: 1024 lanes each stream-decode a
contiguous node range of the graph (reference semantics: the per-node
record layout of BVGraph.java:139-196 and the sequential window decode of
BVGraph.java:1136-1281).  This replaces the round-3 design (370 sequential
node blocks, lockstep phases bounded by each block's slowest lane) with:

  * **Arc/bit-balanced lane ranges** — the node partition equalizes per-lane
    work (codes + emissions, both known exactly from the host pre-scan), so
    the lockstep trip count is ~(total work / 1024 / U) instead of
    Σ-blocks max-lane-work (which was ~47x the mean).
  * **Ancestor-overlap priming** — reference chains reach back at most
    `max chain reach` nodes (<= window * maxref; 21 on cnr-2000).  Each lane
    re-decodes exactly the ancestor closure of its range (3.5% redundancy on
    cnr-2000), so lanes are FULLY independent: no inter-block serialization,
    no halo protocol.  (Mirrors the window priming of
    BVGraph.java:1173-1183, but per-lane.)
  * **Per-lane streaming state machine** — each lane walks its bit range
    once, sequentially: outdegree / reference / block-count / blocks /
    interval-count / intervals are parsed into a small per-node side buffer,
    then the successor list is produced by a 3-way merge of (copies from the
    parent's already-decoded list, interval expansion, residual gap decode)
    — the reference's lazy iterator tree (BVGraph.java:1032-1133) flattened
    into vector registers.  One code decode OR one merged emission per lane
    per sub-step; U=8 sub-steps per loop trip.
  * **Register append buffers + VMEM output slab** — emissions collect in
    8-deep per-lane register buffers, are written through to a 256-slot
    staging ring each trip, and completed 128-blocks are copied to the
    (1024, SLABW) VMEM output slab with uniform dynamic slices.  The decoded
    graph is returned in this padded-by-lane CSR layout plus an exact
    per-node row pointer (a valid constant-time random-access structure;
    ~6% padding on cnr-2000).
  * **Copy resolution is lane-local** — a parent list is always the lane's
    OWN recent output (ancestors lie in the lane's range or its overlap), so
    copies are served by a 16-deep register queue fetched from the slab /
    staging ring with row-local `take_along_axis` gathers — no MXU one-hot
    traffic at all.

The scalar codec (bits/bitstream.py) remains the correctness oracle; tests
run this kernel in interpret mode against formats/bvgraph_np.decode_to_csr
and the cnr-2000 fixture.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, replace as dataclass_replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgraph_tpu.bits import codes as C
from webgraph_tpu.pallas import pcodes as P
from webgraph_tpu.pallas.decode import flat, unflat, sel_row, lane_iota

I32 = jnp.int32
U32 = jnp.uint32
LANES = 1024
GROUPS = 8
GLANES = 128
INF = 0x7FFFFFFF

# states of the per-lane record machine
S_OUTD, S_REF, S_BC, S_BLK, S_ICNT, S_INT, S_MRG, S_DONE = range(8)

_TRACE_LANE = None  # set to a lane id to debug_print its per-sub-step state
# perf-bisection probes (scripts/v6_chip.py only): disable pieces statically
_P_NOFETCH = bool(os.environ.get("D2_NOFETCH"))
_P_NOTE = bool(os.environ.get("D2_NOTE"))
_P_CAP = int(os.environ.get("D2_CAP", "0"))
_P_NOFAR = bool(os.environ.get("D2_NOFAR"))
_P_NOW = bool(os.environ.get("D2_NOW"))
_P_NOS = bool(os.environ.get("D2_NOS"))
_P_NOC = bool(os.environ.get("D2_NOC"))
_P_BODY = int(os.environ.get("D2_BODY", "9"))  # body bisection stage
_P_SINGLE = bool(os.environ.get("D2_SINGLE"))  # one inner block per trip
_P_EVERY = bool(os.environ.get("D2_EVERY"))    # serve fetches every trip
_P_NOCOND = bool(os.environ.get("D2_NOCOND"))  # fetch bodies without lax.cond
_P_CF2 = bool(os.environ.get("D2_CF2"))      # serve the copy queue mid-trip
# greedy service (DEFAULT since r5): refill queues every trip for every
# active lane (not just flagged) — eliminates the flag->serve stall latency
# that cost ~35% of all trips (sweep r5); D2_GREEDY=0 restores the
# alternate-trip flagged cadence for comparison probes
_P_GREEDY = os.environ.get("D2_GREEDY", "1") != "0"


# ----------------------------------------------------------------------
# planning
# ----------------------------------------------------------------------


@dataclass
class LanePlan:
    """Host-side partition of [0, n) into per-lane streaming ranges.

    Each lane decodes up to TWO disjoint ranges (A then B): partitioning
    into 2 * LANES ranges and pairing the largest with the smallest keeps
    the per-lane sub-step budget near the mean (contiguous 1024-way
    partitions are ~2x skewed by arc-density cliffs)."""

    gid0: np.ndarray       # (LANES,) range A first DECODED node (overlap)
    nstart: np.ndarray     # (LANES,) range A first REAL node
    cnt: np.ndarray        # (LANES,) TOTAL decoded node count (A + B)
    cnta: np.ndarray       # (LANES,) range A decoded node count
    bit0: np.ndarray       # (LANES,) A start bit within the lane word row
    bit0b: np.ndarray      # (LANES,) B start bit within the lane word row
    gid0b: np.ndarray      # (LANES,) range B first DECODED node (overlap)
    word0: np.ndarray      # (LANES,) absolute first 32-bit word of A
    d7: np.ndarray         # (7, LANES) outdegrees before gid0 (A)
    d7b: np.ndarray        # (7, LANES) outdegrees before gid0b (B)
    lw: int                # words per lane row (padded)
    slabw: int             # output slab width (per-lane arc capacity)
    sb: int                # side buffer width (max per-node bc + 2*ic, padded)
    exp_wp: np.ndarray     # (LANES,) expected emission count (validation)
    prow: np.ndarray       # (hi-lo+1,) int64 padded row pointer into the slab
    n: int = 0
    m: int = 0             # arcs of the REAL nodes in [lo, hi)
    max_steps: int = 0     # max per-lane sub-step count (trip bound)
    lo: int = 0            # first real node of this plan (tile start)
    hi: int = 0            # one past the last real node (tile end)


def plan_lanes(g, scan, lanes: int = LANES, slab_cap: int = 8192,
               node_range: tuple[int, int] | None = None,
               slabw_fixed: int | None = None) -> LanePlan:
    """Balance the nodes of ``node_range`` (default: the whole graph) into
    `lanes` contiguous ranges + ancestor overlap.

    Work model: one sub-step per code + one per emitted arc + constant
    per-node overhead — all known exactly from the host structure scan
    (the same pre-scan that backs the round-3 planner; analogous to the
    reference's `.obl`/`.outdegrees` load-time caches, BVGraph.java:362-364).

    Graphs too large for one invocation are decoded as a sequence of tiles
    (``decode_to_csr`` plans each tile with ``node_range`` and a common
    ``slabw_fixed`` so every tile runs the same compiled kernel) — the
    unbounded-size analog of the reference's sequential/offline decode
    (BVGraph.java:1136-1281, 1268-1277).
    """
    n = g.num_nodes()
    node_lo, node_hi = node_range if node_range is not None else (0, n)
    bo = g.bit_offsets.astype(np.int64)
    d = scan.d.astype(np.int64)
    ref = scan.ref.astype(np.int64)
    bc = scan.block_count.astype(np.int64)
    ic = scan.int_count.astype(np.int64)
    res = scan.res_count.astype(np.int64)
    extra = np.where(ref > 0, d - scan.copied.astype(np.int64), d)
    extra[d == 0] = 0
    mi = g.settings.min_interval_length

    ncodes = (
        np.ones(n, dtype=np.int64)
        + (d > 0)
        + (ref > 0) * (1 + bc)
        + ((extra > 0) & (mi != 0)) * (1 + 2 * ic)
        + res
    )
    # sub-steps per node: every code is one sub-step; copy/interval
    # emissions are one each; residual decode+emit share a sub-step
    work = ncodes + (d - res) + 3
    csr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(d, out=csr[1:])

    # ancestor reach (min ancestor id per node) for overlap priming
    parent = np.where(ref > 0, np.arange(n) - ref, np.arange(n))
    minanc = np.arange(n)
    cur = parent.copy()
    maxdep = int(scan.depth.max()) if n else 0
    for _ in range(maxdep + 1):
        minanc = np.minimum(minanc, cur)
        cur = parent[cur]
    reach = int((np.arange(n) - minanc).max(initial=0))

    wc = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(work, out=wc[1:])

    # NOTE (round-5 finding): cut placement cannot beat the minimax bound —
    # a heavy reference chain (e.g. cnr-2000 nodes 38997-39009, 7454 steps)
    # is decoded contiguously by whichever lane owns its tail, wherever the
    # cuts land; the bound is the largest ancestor-closure span, and the
    # remaining levers are per-trip cost and stall elimination.

    def partition(T: int, balance: bool = False):
        """Greedy: close a lane when its sub-step budget T or the slab arc
        cap is hit.  Returns (starts, bounds) or None if > `lanes` ranges
        are needed (T too small).

        ``balance`` caps each lane at the REMAINING average too, spreading
        the leftover instead of front-loading it (a front-loaded partition
        at budget T leaves the tail lanes empty — 27% of cnr-2000's lanes,
        40% of all lane-substeps idle per the r5 stall counters — and
        concentrates flush contention on the loaded ones)."""
        starts = np.zeros(lanes, dtype=np.int64)
        bounds = np.zeros(lanes, dtype=np.int64)
        a = node_lo
        for l in range(lanes):
            starts[l] = a
            if a >= node_hi:
                bounds[l] = a
                continue
            # budget from the overlap start (a heavy node re-decoded as
            # an ancestor-overlap must count against the lane's budget)
            amin = max(a - reach, 0)
            Tl = T
            if balance:
                rem = int(wc[node_hi] - wc[amin])
                Tl = min(T, max(rem // (lanes - l) + 1,
                                int(work[amin:amin + 1].max(initial=1))))
            b1 = int(np.searchsorted(wc, wc[amin] + Tl, side="right")) - 1
            b2 = int(np.searchsorted(csr, csr[amin] + slab_cap,
                                     side="right")) - 1
            b = max(a + 1, min(b1, b2, node_hi))
            bounds[l] = b
            a = b
        return (starts, bounds) if a >= node_hi else None

    # binary-search the smallest feasible per-lane budget; try growing
    # slab caps (the arc cap consumes lanes in arc-dense regions, forcing
    # the step budget up elsewhere) and keep the best trade
    base_cap = slab_cap

    tile_work = int(wc[node_hi] - wc[node_lo])

    def search(cap):
        nonlocal slab_cap
        slab_cap = cap
        lo = max(int(work[node_lo:node_hi].max(initial=1)),
                 tile_work // lanes)
        hi = max(int(wc[-1]), lo + 1)
        best = None
        while lo < hi:
            mid = (lo + hi) // 2
            got = partition(mid)
            if got is not None:
                best = (mid, got)
                hi = mid
            else:
                lo = mid + 1
        if best is None:
            got = partition(hi)
            if got is None:
                return None
            best = (hi, got)
        # re-cut at the winning budget with leftover balancing (tail lanes
        # get ~average work instead of nothing)
        bal = partition(best[0], balance=True)
        if bal is not None:
            best = (best[0], bal)
        return best

    cand = [search(c) for c in
            {base_cap, base_cap + 4096, base_cap + 8192}]
    cand = [c for c in cand if c is not None]
    nr = 2 * lanes  # partition twice as fine, then pair large with small
    save_lanes = lanes

    def search2(cap):
        nonlocal slab_cap, lanes
        lanes = nr
        try:
            return search(cap)
        finally:
            lanes = save_lanes

    if not cand:
        raise ValueError(
            f"node range too large for a single streaming-kernel "
            f"invocation ({int(csr[node_hi] - csr[node_lo])} arcs > "
            f"~{lanes * (slab_cap + 4096)} slab capacity); decode it "
            f"tile-wise (decode_to_csr does this automatically)")
    cand2 = [search2(c) for c in
             {base_cap // 2, base_cap // 2 + 1024, base_cap // 2 + 2048}]
    cand2 = [c for c in cand2 if c is not None]
    if not cand2:
        cand2 = [(1 << 60, cand[0][1])]
    T2, (starts2, bounds2) = min(cand2, key=lambda x: x[0])

    def range_data(starts_, bounds_, k):
        g0 = np.empty(k, dtype=np.int64)
        for l in range(k):
            a, b = starts_[l], bounds_[l]
            g0[l] = a if b <= a else min(a, int(minanc[a:b].min()))
        return g0

    # pair ranges: sort by sub-step weight, largest with smallest
    g2 = range_data(starts2, bounds2, nr)
    steps2 = wc[bounds2] - wc[g2]
    order = np.argsort(-steps2, kind="stable")
    pairA = order[:lanes]
    pairB = order[nr - 1 : lanes - 1 : -1]
    pair_steps = steps2[pairA] + steps2[pairB]
    arcs2 = csr[bounds2] - csr[g2]
    pair_arcs = arcs2[pairA] + arcs2[pairB]

    # fall back to the single-range partition if pairing didn't help
    T1, (starts1, bounds1) = min(cand, key=lambda x: x[0])
    if int(pair_steps.max(initial=1)) < T1:
        iA, iB = pairA, pairB
        startsA, boundsA = starts2[iA], bounds2[iA]
        startsB, boundsB = starts2[iB], bounds2[iB]
        gid0 = g2[iA]
        gid0b = g2[iB]
        lane_arcs = pair_arcs
        max_steps = int(pair_steps.max(initial=1))
    else:
        startsA, boundsA = starts1, bounds1
        startsB = boundsB = np.full(lanes, node_hi, dtype=np.int64)
        gid0 = range_data(starts1, bounds1, lanes)
        gid0b = np.full(lanes, node_hi, dtype=np.int64)
        lane_arcs = csr[boundsA] - csr[gid0]
        max_steps = int((wc[boundsA] - wc[gid0]).max(initial=1))

    slabw = int(lane_arcs.max(initial=0))
    slabw = max(256, -(-slabw // 128) * 128)
    if slabw_fixed is not None:
        assert slabw_fixed >= slabw, (slabw_fixed, slabw)
        slabw = slabw_fixed

    # lane word rows: range A words, then range B words appended
    word0 = bo[gid0] >> 5
    wlenA = ((bo[boundsA] + 31) >> 5) - word0 + 1
    word0b = bo[gid0b] >> 5
    wlenB = np.where(boundsB > startsB,
                     ((bo[boundsB] + 31) >> 5) - word0b + 1, 0)
    bit0 = (bo[gid0] - (word0 << 5)).astype(np.int64)
    # B's bit cursor is relative to its position wlenA inside the lane row
    bit0b = ((wlenA << 5) + (bo[gid0b] - (word0b << 5))).astype(np.int64)
    lw = int((wlenA + wlenB).max(initial=1)) + 2
    lw = max(128, -(-lw // 128) * 128)

    def d7_of(g0):
        out = np.zeros((7, lanes), dtype=np.int64)
        for j in range(7):
            idx = g0 - 1 - j
            ok = (idx >= 0) & (idx < n)
            out[j, ok] = d[idx[ok]]
        return out

    d7 = d7_of(gid0)
    d7b = d7_of(np.clip(gid0b, 0, n))

    arcsA = csr[boundsA] - csr[gid0]
    arcsB = np.where(boundsB > startsB, csr[boundsB] - csr[gid0b], 0)
    prow = np.zeros(node_hi - node_lo + 1, dtype=np.int64)
    for l in range(lanes):
        a, b = int(startsA[l]), int(boundsA[l])
        if b > a:
            prow[a - node_lo : b - node_lo] = (
                l * slabw + (csr[a:b] - csr[gid0[l]]))
        a2, b2 = int(startsB[l]), int(boundsB[l])
        if b2 > a2:
            prow[a2 - node_lo : b2 - node_lo] = (
                l * slabw + arcsA[l] + (csr[a2:b2] - csr[gid0b[l]]))
    # sentinel; use prow[x - lo] + d[x] for row ends
    prow[node_hi - node_lo] = int(csr[node_hi] - csr[node_lo])

    sb = int((bc + 2 * ic).max(initial=0))
    sb = max(128, -(-(sb + 8) // 128) * 128)

    return LanePlan(
        gid0=gid0.astype(np.int64),
        nstart=startsA.astype(np.int64),
        cnt=(boundsA - gid0 + np.maximum(boundsB - gid0b, 0)).astype(
            np.int64),
        cnta=(boundsA - gid0).astype(np.int64),
        bit0=bit0,
        bit0b=bit0b,
        gid0b=np.clip(gid0b, 0, n).astype(np.int64),
        word0=word0,
        d7=d7,
        d7b=d7b,
        lw=lw,
        slabw=slabw,
        sb=sb,
        exp_wp=(arcsA + arcsB).astype(np.int64),
        prow=prow,
        n=n,
        m=int(csr[node_hi] - csr[node_lo]),
        max_steps=max_steps,
        lo=node_lo,
        hi=node_hi,
    )


# ----------------------------------------------------------------------
# kernel configuration
# ----------------------------------------------------------------------


AP = int(os.environ.get("D2_AP", "8"))    # append-group depth (emission
#   bandwidth = 1 arc/sub-step needs the dump cadence (every AP sub-steps)
#   to match the group depth)


@dataclass(frozen=True)
class Cfg2:
    skey: tuple            # (outd, ref, bcnt, blk, res, zeta_k, window, minint)
    lw: int                # words per lane row
    slabw: int             # slab width (multiple of 128)
    sb: int                # side buffer width (multiple of 128)
    need_bits: int         # window bits required before decoding any code
    trip_cap: int          # hard trip bound (hang safety)
    unroll: int = 32
    uin: int = 1           # python-unrolled sub-steps per fori iteration
    debug_counters: bool = False
    greedy: bool = True    # refill queues every trip for active lanes
    #   (throughput decode); False = flagged alternate-trip cadence
    #   (latency workloads: batched random access, query2)
    ap: int = AP           # append-group depth: 8 suits copy-heavy webgraph
    #   structure (copies surface in midT sooner), 16 suits
    #   emission-dominated balanced graphs (half the dump events)


def make_cfg2(g, plan: LanePlan, *, debug_counters: bool = False,
              scan=None) -> Cfg2:
    s = g.settings
    n = plan.n
    vbits = max(int(max(n, 2)).bit_length() + 1, 2)
    need = min(64, 2 * vbits + 1)
    # append-group depth by structure: 8 for copy-heavy graphs (copies
    # surface in midT sooner), 16 for emission-dominated balanced graphs
    # (half the dump events; +27% on er-200k, r5 measurement)
    ap = AP
    if "D2_AP" not in os.environ and scan is not None and plan.m > 0:
        copied_frac = float(scan.copied.sum()) / max(plan.m, 1)
        ap = 8 if copied_frac > 0.15 else 16
    U = int(os.environ.get("D2_U", "16"))
    cap = 4 * (plan.max_steps // U + 1) + 2048
    if _P_CAP:
        cap = _P_CAP
    uin = int(os.environ.get("D2_UIN", str(U)))
    return Cfg2(
        skey=(
            s.outdegree_coding,
            s.reference_coding,
            s.block_count_coding,
            s.block_coding,
            s.residual_coding,
            s.zeta_k,
            s.window_size,
            s.min_interval_length,
        ),
        lw=plan.lw,
        slabw=plan.slabw,
        sb=plan.sb,
        need_bits=need,
        trip_cap=cap,
        unroll=U,
        uin=uin,
        debug_counters=debug_counters,
        ap=ap,
    )


# ----------------------------------------------------------------------
# small helpers
# ----------------------------------------------------------------------


def _any(x):
    return jnp.max(x.astype(I32))


def _all(x):
    return jnp.min(x.astype(I32))


def gather_chunks(buf_ref, idx128, ncols: int):
    """Per-lane own-row gather: out[l, c] = buf[l, idx128[l, c]].

    idx128 is (1024, 128) — full-width queries match the 128-aligned block
    loads (sub-128 REF slicing forces lane rotations and is ruinously slow
    in Mosaic), and a 128-wide gather costs the same as a narrow one
    (~0.35 us per chunk, per-op overhead dominated)."""
    out = jnp.zeros(idx128.shape, I32)
    for c in range(ncols // 128):
        blk = buf_ref[:, c * 128 : (c + 1) * 128]
        g = jnp.take_along_axis(blk, jnp.clip(idx128 - c * 128, 0, 127),
                                axis=1)
        out = jnp.where((idx128 >> 7) == c, g, out)
    return out


def place8(vals8, pos8T, width: int, k: int = 8):
    """Scatter an (1024, k) value group to per-lane k-aligned offsets of a
    (1024, width) tile: zero-pad to width, then a log-composed lane roll by
    k * posT (static shifts + per-lane selects), returning (tile, colmask).
    Used for every sub-128-granularity VMEM update: the caller RMWs a full
    aligned block with the returned mask."""
    B = jnp.concatenate(
        [vals8, jnp.zeros((LANES, width - k), I32)], axis=1)
    nbits = (width // k).bit_length() - 1
    for j in range(nbits):
        rolled = pltpu.roll(B, k << j, 1)
        B = jnp.where((posT_bit := pos8T >> j) & 1 > 0, rolled, B)
    ci = jax.lax.broadcasted_iota(I32, (LANES, width), 1)
    s0 = pos8T * k
    mask = (ci >= s0) & (ci < s0 + k)
    return B, mask


def iotaq(q: int):
    return jax.lax.broadcasted_iota(I32, (LANES, q), 1)


def to_regs(mat, q: int):
    """(1024, >=q) -> q (8,128) registers (row-major lane order)."""
    t = mat[:, :q].T  # (q, 1024)
    return [t[k : k + 1, :].reshape(GROUPS, GLANES) for k in range(q)]


def stage_read(stage_ref, idx):
    """stage[l, idx_l] per lane from a (1024, 128) VMEM stage: broadcast
    the per-lane index to full width (Mosaic's gather needs idx.shape ==
    src.shape), gather, and take column 0."""
    idxT = jnp.clip(flat(idx).T, 0, 127)
    idxB = jnp.broadcast_to(idxT, (LANES, 128))
    g = jnp.take_along_axis(stage_ref[:, :], idxB, axis=1)
    return g[:, :1].T.reshape(GROUPS, GLANES)


def ring_sel(rows, idx):
    """rows[idx_l] per lane over a 7-entry ring (idx clipped to [0, 6])."""
    i = jnp.clip(idx, 0, 6)
    a = jnp.where((i & 1) > 0, rows[1], rows[0])
    b = jnp.where((i & 1) > 0, rows[3], rows[2])
    c = jnp.where((i & 1) > 0, rows[5], rows[4])
    ab = jnp.where((i & 2) > 0, b, a)
    cc = jnp.where((i & 2) > 0, rows[6], c)
    return jnp.where((i & 4) > 0, cc, ab)


def win_append(w0, w1, w2, avail, nw, word, on):
    """Append one 32-bit word to the 96-bit window where `on`.

    Negative avail encodes alignment debt (bit cursor & 31) from a reset:
    the first appended word is pre-shifted so the cursor lands at the window
    front (same convention as decode.py's win_refill)."""
    w = word.astype(U32)
    debt = jnp.maximum(-avail, 0).astype(U32) & U32(31)
    w = jnp.where(avail < 0, w << debt, w)
    a0 = jnp.clip(avail, 0, None)
    sh = a0.astype(U32) & U32(31)
    ssh = (U32(32) - sh) & U32(31)
    hi_part = jnp.where(sh > 0, w >> sh, w)
    lo_part = jnp.where(sh > 0, w << ssh, U32(0))
    slot = a0 >> 5
    w0 = jnp.where(on & (slot == 0), w0 | hi_part, w0)
    w1 = jnp.where(on & (slot == 0), w1 | lo_part,
                   jnp.where(on & (slot == 1), w1 | hi_part, w1))
    w2 = jnp.where(on & (slot == 1), w2 | lo_part,
                   jnp.where(on & (slot == 2), w2 | hi_part, w2))
    avail = jnp.where(on, avail + 32, avail)
    nw = jnp.where(on, nw + 1, nw)
    return w0, w1, w2, avail, nw


def win_drop(w0, w1, w2, avail, length, on):
    """Drop `length` (<= 64) bits from the window front where `on`."""
    ln = jnp.where(on, length, 0)
    nword = ln >> 5
    a = jnp.where(nword >= 1, w1, w0)
    b = jnp.where(nword >= 1, w2, w1)
    c = jnp.where(nword >= 1, U32(0), w2)
    a = jnp.where(nword >= 2, c, a)
    b = jnp.where(nword >= 2, U32(0), b)
    r = (ln & 31).astype(U32) & U32(31)
    rs = (U32(32) - r) & U32(31)
    a2 = jnp.where(r > 0, (a << r) | (b >> rs), a)
    b2 = jnp.where(r > 0, (b << r) | (c >> rs), b)
    c2 = jnp.where(r > 0, c << r, c)
    return a2, b2, c2, avail - ln


# ----------------------------------------------------------------------
# kernel builder
# ----------------------------------------------------------------------

WQ = int(os.environ.get("D2_WQ", "32"))   # word-queue depth (registers)
CQ = int(os.environ.get("D2_CQ", "32"))   # copy-queue depth (registers)
SQ = 8    # run-boundary / interval-pair queue depth

# loop-carry field names, in order (all (8,128) int32 unless noted)
def _fields_for(ap: int):
    return (
        "w0 w1 w2 avail nw st loc gid d rf dp pb bcleft bctot cum copied "
        "iarcs icnt il lastleft ptop firsti sp sdump em crem cp ri kst ken "
        "kld iidx ileft icur irem rv rvlast rvok remr rdleft firstr "
        "wp wb ap flp wqb cqb cqlim rqb rqn iqb iqn "
        "wflag cflag rflag iflag rdlim "
        "xw xc xs2 xo xf xd xa xn "
        "dr0 dr1 dr2 dr3 dr4 dr5 dr6 fb0 fb1 fb2 fb3 fb4 fb5 fb6 "
        + " ".join(f"a{j}" for j in range(ap)) + " "
        + " ".join(f"s{j}" for j in range(8)) + " "
        + " ".join(f"wq{j}" for j in range(WQ)) + " "
        + " ".join(f"cq{j}" for j in range(CQ)) + " "
        + " ".join(f"rq{j}" for j in range(SQ)) + " "
        + " ".join(f"iq{j}" for j in range(SQ))
    ).split()


_FIELDS = _fields_for(AP)


_DUMP_FIELDS = (
    "st em d crem cp kst ken kld ri rqb rqn iqb iqn ileft irem remr "
    "rvok rdleft avail sp sdump bctot icnt wp ap wb flp cqb cqlim loc "
    "nw iidx xw xc xs2 xo xf xd xa xn").split()


def build_kernel2(cfg: Cfg2):
    (outd_c, ref_c, bcnt_c, blk_c, res_c, zeta_k, window, minint) = cfg.skey
    greedy = _P_GREEDY and cfg.greedy
    AP = cfg.ap
    _FIELDS = _fields_for(AP)
    if window > 7:
        raise ValueError("decode2 supports window_size <= 7")
    NEED = cfg.need_bits
    LW, SLABW, SB = cfg.lw, cfg.slabw, cfg.sb
    U = cfg.unroll

    codings = {}
    for st_id, coding in ((S_OUTD, outd_c), (S_REF, ref_c), (S_BC, bcnt_c),
                          (S_BLK, blk_c), (S_ICNT, C.GAMMA), (S_INT, C.GAMMA),
                          (S_MRG, res_c)):
        codings.setdefault(coding, []).append(st_id)
    readers = {cd: P.make_window_reader(cd, zeta_k) for cd in codings}

    def kernel(meta_ref, words_ref, slab_ref, wp_ref, dbg_ref, dump_ref,
               midt_ref, ring_ref, side_ref, smem_ref):
        z = jnp.zeros((GROUPS, GLANES), I32)
        zu = jnp.zeros((GROUPS, GLANES), U32)

        gid0 = meta_ref[0]
        cntv = meta_ref[1]        # TOTAL nodes (range A + range B)
        bit0 = meta_ref[2]
        d7 = [meta_ref[3 + j] for j in range(7)]
        gid0b = meta_ref[10]
        cnta = meta_ref[11]       # nodes in range A (switch point)
        bit0b = meta_ref[12]      # B bit cursor, lane-word-row relative
        d7b = [meta_ref[13 + j] for j in range(7)]

        # a CONCRETE (memory-derived) zero: splat-constant initial carries
        # get a replicated vector layout that Mosaic cannot relayout to the
        # concrete layouts the fetch branches produce
        zc = jnp.minimum(jnp.abs(gid0), 0)
        st0 = {f: zc for f in _FIELDS}
        for f in ("w0", "w1", "w2"):
            st0[f] = zc.astype(U32)
        st0["st"] = jnp.where(cntv > 0, S_OUTD, S_DONE)
        st0["gid"] = gid0
        st0["avail"] = -(bit0 & 31)
        st0["nw"] = bit0 >> 5
        st0["wqb"] = zc - (1 << 20)
        st0["cqb"] = zc + INF
        st0["wflag"] = jnp.where(cntv > 0, 1, 0)
        for j in range(7):
            st0[f"dr{j}"] = d7[j]
        state0 = tuple(st0[f] for f in _FIELDS)

        def unpack(t):
            return dict(zip(_FIELDS, t))

        def sideq_read(S, base):
            """Side entries [base, base+8) as 8 regs: sidebuf for dumped
            entries, the ab_side registers for the undumped tail."""
            bT = flat(base).T
            idx = jnp.clip(bT + iotaq(128), 0, SB - 1)
            got = gather_chunks(side_ref, idx, SB)
            regs = to_regs(got, SQ)
            sregs = [S[f"s{j}"] for j in range(8)]
            out = []
            for k in range(SQ):
                e = base + k
                ov = ring_sel(sregs[:7], e & 7)
                ov = jnp.where((e & 7) == 7, sregs[7], ov)
                out.append(jnp.where(e >= S["sdump"], ov, regs[k]))
            return out

        def substep(S):
            st = S["st"]
            in_mrg = st == S_MRG
            alive = st != S_DONE

            # ---- window append (one word per sub-step, from the queue) ---
            widx = S["nw"] - S["wqb"]
            w_ok = (widx >= 0) & (widx < WQ)
            app_need = alive & (S["avail"] < NEED) & (S["avail"] <= 64)
            app = app_need & w_ok
            # refill BEFORE exhaustion (the fetch lands at the next trip
            # boundary, so a wide margin hides the latency entirely)
            wflag = (S["wflag"] > 0) | (alive & (widx >= WQ - 10))
            word = sel_row([S[f"wq{j}"] for j in range(WQ)],
                           jnp.clip(widx, 0, WQ - 1))
            w0, w1, w2, avail, nw = win_append(
                S["w0"], S["w1"], S["w2"], S["avail"], S["nw"], word, app)

            # ---- decode one code where wanted ---------------------------
            res_need = in_mrg & (S["rvok"] == 0) & (S["rdleft"] > 0)
            side_free = (S["sp"] - S["sdump"]) < 8
            want = (
                ((st == S_OUTD) | (st == S_REF) | (st == S_BC)
                 | (st == S_ICNT))
                | (((st == S_BLK) | (st == S_INT)) & side_free)
                | res_need)
            ready = want & (avail >= NEED)

            v = z
            ln = z
            for cd, st_ids in codings.items():
                rv_, rl_ = readers[cd](w0, w1)
                m = jnp.zeros_like(st, dtype=bool)
                for sid in st_ids:
                    if sid == S_MRG:
                        m = m | res_need
                    else:
                        m = m | (st == sid)
                v = jnp.where(m, rv_.astype(I32), v)
                ln = jnp.where(m, rl_, ln)
            w0, w1, w2, avail = win_drop(w0, w1, w2, avail, ln, ready)

            if _P_BODY < 2:
                out = dict(S)
                out.update(w0=w0, w1=w1, w2=w2, avail=avail, nw=nw,
                           wflag=wflag.astype(I32),
                           st=jnp.where(ready, (st + v) & 7, st))
                return out
            # ---- side queues: run-boundary pairs + interval pairs -------
            ri, kld, bctot, dp = S["ri"], S["kld"], S["bctot"], S["dp"]
            rqrows = [S[f"rq{j}"] for j in range(SQ)]
            iqrows = [S[f"iq{j}"] for j in range(SQ)]

            def rq_at(j):
                k = j - S["rqb"]
                ok = (k >= 0) & (k < S["rqn"])
                return sel_row(rqrows, jnp.clip(k, 0, SQ - 1)), ok

            def iq_at(j):
                k = j - S["iqb"]
                ok = (k >= 0) & (k < S["iqn"])
                return sel_row(iqrows, jnp.clip(k, 0, SQ - 1)), ok

            # port A: next keep-run pair [kst, ken)
            pa_need = in_mrg & (kld == 0) & (S["crem"] > 0)
            b0, ok0 = rq_at(ri - 1)
            b1, ok1 = rq_at(ri)
            need0 = ri > 0
            need1 = ri < bctot
            pa_ok = (~need0 | ok0) & (~need1 | ok1)
            kst_new = jnp.where(need0, b0, 0)
            ken_new = jnp.where(need1, b1,
                                jnp.where((bctot & 1) == 0, dp, 0))
            pa_on = pa_need & pa_ok
            kst = jnp.where(pa_on, kst_new, S["kst"])
            ken = jnp.where(pa_on, ken_new, S["ken"])
            kld = jnp.where(pa_on, 1, kld)
            rflag = (S["rflag"] > 0) | (pa_need & ~pa_ok)

            # port B: next interval pair (left, len)
            pb_need = in_mrg & (S["irem"] == 0) & (S["ileft"] > 0)
            iv0, iok0 = iq_at(S["iidx"])
            iv1, iok1 = iq_at(S["iidx"] + 1)
            pb_ok = iok0 & iok1
            pb_on = pb_need & pb_ok
            icur = jnp.where(pb_on, iv0, S["icur"])
            irem = jnp.where(pb_on, iv1, S["irem"])
            iidx = jnp.where(pb_on, S["iidx"] + 2, S["iidx"])
            ileft = jnp.where(pb_on, S["ileft"] - 1, S["ileft"])
            iflag = (S["iflag"] > 0) | (pb_need & ~pb_ok)

            if _P_BODY < 3:
                out = dict(S)
                out.update(w0=w0, w1=w1, w2=w2, avail=avail, nw=nw,
                           kst=kst, ken=ken, kld=kld, icur=icur, irem=irem,
                           iidx=iidx, ileft=ileft,
                           wflag=wflag.astype(I32),
                           st=jnp.where(ready, (st + v) & 7, st))
                return out
            # ---- state transitions --------------------------------------
            d, rf, pb_ = S["d"], S["rf"], S["pb"]
            bcleft, cum, copied = S["bcleft"], S["cum"], S["copied"]
            iarcs, icnt, il = S["iarcs"], S["icnt"], S["il"]
            lastleft, ptop, firsti = S["lastleft"], S["ptop"], S["firsti"]
            sp, sdump = S["sp"], S["sdump"]
            em, crem, cp = S["em"], S["crem"], S["cp"]
            rvv, rvlast, rvok = S["rv"], S["rvlast"], S["rvok"]
            remr, rdleft, firstr = S["remr"], S["rdleft"], S["firstr"]
            gid = S["gid"]
            nst = st
            sval = z
            son = jnp.zeros_like(st, dtype=bool)
            minit = jnp.zeros_like(st, dtype=bool)

            # OUTD (node start: clear per-node accumulators)
            t_outd = ready & (st == S_OUTD)
            d = jnp.where(t_outd, v, d)
            icnt = jnp.where(t_outd, 0, icnt)
            iarcs = jnp.where(t_outd, 0, iarcs)
            bctot = jnp.where(t_outd, 0, bctot)
            adv0 = t_outd & (v == 0)
            go_extras = jnp.zeros_like(st, dtype=bool)
            if window > 0:
                nst = jnp.where(t_outd & (v > 0), S_REF, nst)
            else:
                go_extras = go_extras | (t_outd & (v > 0))

            # REF
            if window > 0:
                t_ref = ready & (st == S_REF)
                rf = jnp.where(t_ref, v, rf)
                hasr = t_ref & (v > 0)
                dregs = [S[f"dr{j}"] for j in range(7)]
                fregs = [S[f"fb{j}"] for j in range(7)]
                dp = jnp.where(hasr, ring_sel(dregs, v - 1), dp)
                pb_ = jnp.where(hasr, ring_sel(fregs, v - 1), pb_)
                nst = jnp.where(hasr, S_BC, nst)
                go_extras = go_extras | (t_ref & (v == 0))
                # prefetch the copy queue: the trip-boundary fetch runs
                # while this lane still parses blocks/intervals
                cp = jnp.where(hasr, 0, cp)

            # BC
            t_bc = ready & (st == S_BC)
            bctot = jnp.where(t_bc, v, bctot)
            bcleft = jnp.where(t_bc, v, bcleft)
            cum = jnp.where(t_bc, 0, cum)
            copied = jnp.where(t_bc, 0, copied)
            nst = jnp.where(t_bc & (v > 0), S_BLK, nst)
            blkdone = t_bc & (v == 0)

            # BLK
            t_blk = ready & (st == S_BLK)
            k = bctot - bcleft
            bval = jnp.where(k > 0, v + 1, v)
            cum = jnp.where(t_blk, cum + bval, cum)
            copied = jnp.where(t_blk & ((k & 1) == 0), copied + bval, copied)
            sval = jnp.where(t_blk, cum, sval)
            son = son | t_blk
            bcleft = jnp.where(t_blk, bcleft - 1, bcleft)
            blkdone = blkdone | (t_blk & (bcleft == 0))

            # blocks done: implicit tail, then extras
            tail_on = blkdone & ((bctot & 1) == 0)
            copied = jnp.where(tail_on, copied + jnp.maximum(dp - cum, 0),
                               copied)
            go_extras = go_extras | blkdone

            extra = d - jnp.where(rf > 0, copied, 0)
            if minint != 0:
                nst = jnp.where(go_extras & (extra > 0), S_ICNT, nst)
                minit = minit | (go_extras & (extra <= 0))
            else:
                minit = minit | go_extras

            # ICNT
            if minint != 0:
                t_ic = ready & (st == S_ICNT)
                icnt = jnp.where(t_ic, v, icnt)
                il = jnp.where(t_ic, 2 * v, il)
                firsti = jnp.where(t_ic, 1, firsti)
                nst = jnp.where(t_ic & (v > 0), S_INT, nst)
                minit = minit | (t_ic & (v == 0))

                # INT: alternating left / len codes, resolved immediately
                t_in = ready & (st == S_INT)
                is_left = t_in & ((il & 1) == 0)
                is_len = t_in & ((il & 1) == 1)
                leftv = jnp.where(firsti > 0,
                                  gid + P.nat2int_u(v.astype(U32)),
                                  ptop + 1 + v)
                lastleft = jnp.where(is_left, leftv, lastleft)
                firsti = jnp.where(is_left, 0, firsti)
                lenv = v + minint
                ptop = jnp.where(is_len, lastleft + lenv, ptop)
                iarcs = jnp.where(is_len, iarcs + lenv, iarcs)
                sval = jnp.where(is_left, leftv, jnp.where(is_len, lenv, sval))
                son = son | t_in
                il = jnp.where(t_in, il - 1, il)
                minit = minit | (t_in & (il == 0))

            # merge init + side-queue priming from the ab_side registers
            em = jnp.where(minit, 0, em)
            crem = jnp.where(minit, jnp.where(rf > 0, copied, 0), crem)
            cp = jnp.where(minit, 0, cp)
            ri = jnp.where(minit, 0, ri)
            kld = jnp.where(minit, 0, kld)
            iidx = jnp.where(minit, bctot, iidx)
            ileft = jnp.where(minit, icnt, ileft)
            irem = jnp.where(minit, 0, irem)
            rvok = jnp.where(minit, 0, rvok)
            firstr = jnp.where(minit, 1, firstr)
            rescnt = jnp.maximum(d - jnp.where(rf > 0, copied, 0) - iarcs, 0)
            rdleft = jnp.where(minit, rescnt, rdleft)
            remr = jnp.where(minit, rescnt, remr)
            nst = jnp.where(minit, S_MRG, nst)
            # prime run/interval queues when every side entry is still in
            # registers (sdump == 0, the p90+ case); spilled nodes flag a
            # trip-level fetch instead
            in_regs = minit & (sdump == 0)
            sregs0 = [S[f"s{j}"] for j in range(8)]
            rqb = jnp.where(minit, 0, S["rqb"])
            rqn = jnp.where(minit, jnp.where(in_regs, jnp.minimum(sp, 8), 0),
                            S["rqn"])
            iqb = jnp.where(minit, bctot, S["iqb"])
            iqn = jnp.where(minit,
                            jnp.where(in_regs,
                                      jnp.clip(jnp.minimum(sp, 8) - bctot,
                                               0, SQ), 0),
                            S["iqn"])
            rq2 = list(rqrows)
            iq2 = list(iqrows)
            for kq in range(SQ):
                rq2[kq] = jnp.where(in_regs, sregs0[kq], rq2[kq])
                iq2[kq] = jnp.where(
                    in_regs, ring_sel(sregs0[:7], jnp.clip(bctot + kq, 0, 7)),
                    iq2[kq])
                iq2[kq] = jnp.where(in_regs & ((bctot + kq) == 7),
                                    sregs0[7], iq2[kq])

            # residual decode (decode-ahead of one)
            t_res = ready & res_need
            rnew = jnp.where(firstr > 0, gid + P.nat2int_u(v.astype(U32)),
                             rvlast + 1 + v)
            rvv = jnp.where(t_res, rnew, rvv)
            rvlast = jnp.where(t_res, rnew, rvlast)
            firstr = jnp.where(t_res, 0, firstr)
            rvok = jnp.where(t_res, 1, rvok)
            rdleft = jnp.where(t_res, rdleft - 1, rdleft)

            if _P_BODY < 4:
                out = dict(S)
                out.update(
                    w0=w0, w1=w1, w2=w2, avail=avail, nw=nw, st=nst, d=d,
                    rf=rf, dp=dp, pb=pb_, bcleft=bcleft, bctot=bctot,
                    cum=cum, copied=copied, iarcs=iarcs, icnt=icnt, il=il,
                    lastleft=lastleft, ptop=ptop, firsti=firsti, sp=sp,
                    em=em, crem=crem, cp=cp, ri=ri, kst=kst, ken=ken,
                    kld=kld, iidx=iidx, ileft=ileft, icur=icur, irem=irem,
                    rv=rvv, rvlast=rvlast, rvok=rvok, remr=remr,
                    rdleft=rdleft, firstr=firstr,
                    wflag=wflag.astype(I32))
                return out
            # ---- merge emission -----------------------------------------
            mrg = in_mrg
            radv = mrg & (kld == 1) & (S["crem"] > 0) & (cp >= ken)
            ri = jnp.where(radv, ri + 2, ri)
            kld = jnp.where(radv, 0, kld)
            cp = jnp.where(mrg & (kld == 1) & (cp < kst), kst, cp)

            cneed = mrg & (crem > 0)
            pos_ok = (kld == 1) & (cp >= kst) & (cp < ken)
            cqi = pb_ + cp
            # cqi >= wp only happens for non-ancestor overlap (junk) nodes
            # whose values are never used: accept garbage instead of
            # stalling forever (a real parent always finished emitting
            # before its child starts — the lane is sequential)
            junk_read = cqi >= S["wp"]
            q_ok = ((cqi >= S["cqb"]) & (cqi < S["cqb"] + CQ)
                    & ((cqi < S["cqlim"]) | junk_read))
            ch = jnp.where(cneed & pos_ok & q_ok,
                           sel_row([S[f"cq{j}"] for j in range(CQ)],
                                   jnp.clip(cqi - S["cqb"], 0, CQ - 1)),
                           INF)
            cflag = (S["cflag"] > 0) | (cneed & pos_ok & ~q_ok)
            if window > 0:
                cflag = cflag | (ready & (st == S_REF) & (v > 0))

            ih = jnp.where(irem > 0, icur, INF)
            rh = jnp.where((rvok > 0) & (remr > 0), rvv, INF)

            c_ready = (crem == 0) | (pos_ok & q_ok)
            i_ready = (irem > 0) | (ileft == 0)
            r_ready = (remr == 0) | (rvok > 0)
            stall_out = (S["wb"] - S["flp"] * 128) >= 256 - AP - 8
            can = (mrg & (em < d) & c_ready & i_ready & r_ready
                   & (S["ap"] < AP) & ~stall_out)

            emit = jnp.minimum(ch, jnp.minimum(ih, rh))
            is_c = can & (ch <= ih) & (ch <= rh)
            is_i = can & ~is_c & (ih <= rh)
            is_r = can & ~is_c & ~is_i

            ap = S["ap"]
            ab = [S[f"a{j}"] for j in range(AP)]
            for j in range(AP):
                ab[j] = jnp.where(can & (ap == j), emit, ab[j])
            ap = jnp.where(can, ap + 1, ap)
            wpv = jnp.where(can, S["wp"] + 1, S["wp"])

            crem = jnp.where(is_c, crem - 1, crem)
            cp = jnp.where(is_c, cp + 1, cp)
            irem = jnp.where(is_i, irem - 1, irem)
            icur = jnp.where(is_i, icur + 1, icur)
            rvok = jnp.where(is_r, 0, rvok)
            remr = jnp.where(is_r, remr - 1, remr)
            em = jnp.where(can, em + 1, em)

            # ---- side append --------------------------------------------
            sregs2 = list(sregs0)
            for j in range(8):
                sregs2[j] = jnp.where(son & ((sp & 7) == j), sval, sregs2[j])
            sp = jnp.where(son, sp + 1, sp)

            # ---- node advance -------------------------------------------
            adv = adv0 | (mrg & (em == d) & (d > 0))
            loc = jnp.where(adv, S["loc"] + 1, S["loc"])
            nst = jnp.where(adv,
                            jnp.where(loc >= cntv, S_DONE, S_OUTD), nst)
            gid = jnp.where(adv, gid + 1, gid)
            # range switch: jump the stream cursor to range B, re-prime the
            # outdegree ring from host data, and invalidate the queues
            # (fb-ring points at wp: reads come back as junk-safe)
            sw = adv & (loc == cnta) & (loc < cntv)
            gid = jnp.where(sw, gid0b, gid)
            newfb = wpv - d
            drs = [S[f"dr{j}"] for j in range(7)]
            fbs = [S[f"fb{j}"] for j in range(7)]
            for j in range(6, 0, -1):
                drs[j] = jnp.where(adv, drs[j - 1], drs[j])
                fbs[j] = jnp.where(adv, fbs[j - 1], fbs[j])
            drs[0] = jnp.where(adv, d, drs[0])
            fbs[0] = jnp.where(adv, newfb, fbs[0])
            for j in range(7):
                drs[j] = jnp.where(sw, d7b[j], drs[j])
                fbs[j] = jnp.where(sw, wpv, fbs[j])
            w0 = jnp.where(sw, U32(0), w0)
            w1 = jnp.where(sw, U32(0), w1)
            w2 = jnp.where(sw, U32(0), w2)
            avail = jnp.where(sw, -(bit0b & 31), avail)
            nw = jnp.where(sw, bit0b >> 5, nw)
            wflag = wflag | sw
            sp = jnp.where(adv, 0, sp)
            sdump = jnp.where(adv, 0, sdump)
            rf = jnp.where(adv, 0, rf)
            cflag = cflag & ~adv
            rflag = rflag & ~adv
            iflag = iflag & ~adv

            # ---- stall accounting (sweep diagnosis; 8 vector adds) ------
            xw = S["xw"] + (app_need & ~w_ok).astype(I32)
            xc = S["xc"] + (cneed & pos_ok & ~q_ok).astype(I32)
            xs2 = S["xs2"] + ((pa_need & ~pa_ok)
                              | (pb_need & ~pb_ok)).astype(I32)
            xo = S["xo"] + (mrg & (em < d) & stall_out).astype(I32)
            xf = S["xf"] + ((((st == S_BLK) | (st == S_INT)) & ~side_free)
                            ).astype(I32)
            xd = S["xd"] + (st == S_DONE).astype(I32)
            # window-fill substeps (decode wanted, window short post-append)
            xa = S["xa"] + (want & ~ready & alive).astype(I32)
            # catch-all: alive and NOTHING advanced this substep
            acted = (ready | can | app | pa_on | pb_on | son
                     | adv | minit)
            xn = S["xn"] + (alive & ~acted).astype(I32)

            if _TRACE_LANE is not None:
                li = lane_iota()

                def scal(vec):
                    return jnp.sum(jnp.where(li == _TRACE_LANE, vec, 0))

                pl.debug_print(
                    "st={} loc={} d={} rf={} dp={} em={} crem={} cp={} "
                    "dr0={} dr1={} adv={} v={} rdy={} rescnt={}",
                    scal(st), scal(loc), scal(d), scal(rf), scal(dp),
                    scal(em), scal(crem), scal(cp), scal(drs[0]),
                    scal(drs[1]), scal(adv.astype(I32)), scal(v),
                    scal(ready.astype(I32)), scal(remr))

            out = dict(S)
            out.update(
                w0=w0, w1=w1, w2=w2, avail=avail, nw=nw, st=nst, loc=loc,
                gid=gid, d=d, rf=rf, dp=dp, pb=pb_, bcleft=bcleft,
                bctot=bctot, cum=cum, copied=copied, iarcs=iarcs, icnt=icnt,
                il=il, lastleft=lastleft, ptop=ptop, firsti=firsti, sp=sp,
                sdump=sdump, em=em, crem=crem, cp=cp, ri=ri, kst=kst,
                ken=ken, kld=kld, iidx=iidx, ileft=ileft, icur=icur,
                irem=irem, rv=rvv, rvlast=rvlast, rvok=rvok, remr=remr,
                rdleft=rdleft, firstr=firstr, wp=wpv, ap=ap,
                rqb=rqb, rqn=rqn, iqb=iqb, iqn=iqn,
                wflag=wflag.astype(I32), cflag=cflag.astype(I32),
                rflag=rflag.astype(I32), iflag=iflag.astype(I32),
                xw=xw, xc=xc, xs2=xs2, xo=xo, xf=xf, xd=xd, xa=xa, xn=xn)
            for j in range(AP):
                out[f"a{j}"] = ab[j]
            for j in range(8):
                out[f"s{j}"] = sregs2[j]
            for j in range(7):
                out[f"dr{j}"] = drs[j]
                out[f"fb{j}"] = fbs[j]
            for j in range(SQ):
                out[f"rq{j}"] = rq2[j]
                out[f"iq{j}"] = iq2[j]
            return out

        def trip(carry):
            S = unpack(carry[0])
            trips = carry[1]
            # fetch-serve cadence: word/side fetches on even trips, copy
            # fetches on odd trips (halves the per-trip fetch-body cost);
            # D2_EVERY=1 serves every trip (cadence experiment)
            always = _P_EVERY or _P_NOCOND or greedy
            even_t = ((trips & 1) == 0) | jnp.bool_(always)
            odd_t = ((trips & 1) == 1) | jnp.bool_(always)
            # fetches are served on the FIRST sub-step of each trip and
            # dumps/flushes on the LAST: flagged lanes stall at most U-1
            # sub-steps, and lockstep "any lane needs it" amplification is
            # bounded at one event per trip instead of one per sub-step

            # ---- word-queue refill (flagged lanes) ----------------------
            def do_wfetch(args):
                qr, wqb = args
                if greedy:
                    need = S["st"] != S_DONE
                else:
                    need = S["wflag"] > 0
                base = jnp.where(need, S["nw"], wqb)
                idx = jnp.clip(flat(base).T + iotaq(128), 0, LW - 1)
                got = gather_chunks(words_ref, idx, LW)
                newq = to_regs(got, WQ)
                outq = tuple(jnp.where(need, newq[kq], qr[kq])
                             for kq in range(WQ))
                return outq, jnp.where(need, base, wqb)

            # fires nearly every trip: calling directly avoids lax.cond's
            # per-evaluation operand marshalling of the whole queue tuple
            qrw = tuple(S[f"wq{j}"] for j in range(WQ))
            if _P_NOFETCH or _P_NOW:
                wqb = S["wqb"]
            elif _P_NOCOND:
                qrw, wqb = do_wfetch((qrw, S["wqb"]))
            else:
                qrw, wqb = jax.lax.cond(
                    even_t, do_wfetch, lambda a: a,
                    (qrw, S["wqb"]))
            for j in range(WQ):
                S[f"wq{j}"] = qrw[j]
            if cfg.debug_counters:
                smem_ref[4] = smem_ref[4] + _any(S["wflag"])
            S["wqb"] = wqb
            S["wflag"] = jnp.where(even_t, 0, S["wflag"])

            # ---- side-queue refills (spilled nodes / long runs) ---------
            def do_sfetch(args):
                rq, iq, rqb, rqn, iqb, iqn = args
                rneed = S["rflag"] > 0
                ineed = S["iflag"] > 0
                rbase = jnp.where(rneed, jnp.maximum(S["ri"] - 1, 0), rqb)
                ibase = jnp.where(ineed, S["iidx"], iqb)
                newr = sideq_read(S, rbase)
                newi = sideq_read(S, ibase)
                rq = tuple(jnp.where(rneed, newr[kq], rq[kq])
                           for kq in range(SQ))
                iq = tuple(jnp.where(ineed, newi[kq], iq[kq])
                           for kq in range(SQ))
                rqn = jnp.where(rneed, SQ, rqn)
                iqn = jnp.where(ineed, SQ, iqn)
                return rq, iq, rbase, rqn, ibase, iqn

            qrr = tuple(S[f"rq{j}"] for j in range(SQ))
            qri = tuple(S[f"iq{j}"] for j in range(SQ))
            # side fetches are RARE (nodes with > 8 run/interval entries;
            # zero side spills at all on cnr-2000): serve on demand, not on
            # cadence — the two sideq_read gathers cost real time per trip
            s_need = (_any(S["rflag"]) > 0) | (_any(S["iflag"]) > 0)
            if _P_NOFETCH or _P_NOS:
                rqb, rqn, iqb, iqn = (S["rqb"], S["rqn"], S["iqb"],
                                      S["iqn"])
            elif _P_NOCOND:
                qrr, qri, rqb, rqn, iqb, iqn = do_sfetch(
                    (qrr, qri, S["rqb"], S["rqn"], S["iqb"], S["iqn"]))
            else:
                qrr, qri, rqb, rqn, iqb, iqn = jax.lax.cond(
                    even_t & s_need, do_sfetch, lambda a: a,
                    (qrr, qri, S["rqb"], S["rqn"], S["iqb"], S["iqn"]))
            if cfg.debug_counters:
                smem_ref[5] = smem_ref[5] + (
                    (_any(S["rflag"]) > 0) | (_any(S["iflag"]) > 0)).astype(I32)
            for j in range(SQ):
                S[f"rq{j}"] = qrr[j]
                S[f"iq{j}"] = qri[j]
            S["rqb"], S["rqn"], S["iqb"], S["iqn"] = rqb, rqn, iqb, iqn
            S["rflag"] = jnp.where(even_t, 0, S["rflag"])
            S["iflag"] = jnp.where(even_t, 0, S["iflag"])

            # ---- copy-queue fetch ---------------------------------------
            def serve_cfetch(S, serve_pred):
              def do_cfetch(args):
                qr, cqb, cqlim = args
                if greedy:
                    need = (S["cflag"] > 0) | (
                        (S["st"] == S_MRG) & (S["crem"] > 0)
                        & (S["kld"] == 1))
                else:
                    need = S["cflag"] > 0
                base = jnp.where(need, S["pb"] + S["cp"], cqb)
                bT = flat(base).T
                idxQ = jnp.clip(bT + iotaq(128), 0, INF)
                # three sources by recency:
                #   midT  — entries [wb - 248, wp) (the current 8-group's
                #           write-through cols alias the oldest 8)
                #   ring  — the last 8 flushed 128-blocks,
                #           [(flp - 8) * 128, flp * 128)
                #   slab  — anything older (rare; ~0.7% of copied arcs on
                #           cnr-2000 reach past the ring)
                wbT = flat(S["wb"]).T
                use_mid = idxQ >= (wbT - (256 - AP))
                rloT = flat((S["flp"] - 8) * 128).T
                use_ring = ~use_mid & (idxQ >= rloT)
                midv = gather_chunks(midt_ref, idxQ & 255, 256)
                ringv = gather_chunks(ring_ref, idxQ & 1023, 1024)

                def far(_):
                    # bounded cond-free chunk walk: a lane's 32-slot query
                    # spans <= 2 slab chunks (copy sources are contiguous),
                    # so [cmin, cmax] is tiny; the round-4 full-width walk
                    # (58 chunks x per-chunk lax.cond over the 128-vreg
                    # accumulator) cost ~46 us PER FIRE = 26% of the whole
                    # decode (sweep r5: base 47.7 vs nofar 35.8 us/trip)
                    idxF = jnp.clip(idxQ, 0, SLABW - 1)
                    needF = needT & ~use_mid & ~use_ring
                    nchunks = SLABW // 128
                    cmin = jnp.min(jnp.where(needF, idxF >> 7, nchunks - 1))
                    cmax = jnp.max(jnp.where(needF, idxF >> 7, 0))

                    def body(c, acc):
                        inc = (idxF >> 7) == c
                        sl = slab_ref[:, pl.ds(c * 128, 128)]
                        g = jnp.take_along_axis(
                            sl, jnp.clip(idxF - c * 128, 0, 127), axis=1)
                        return jnp.where(inc, g, acc)

                    return jax.lax.fori_loop(cmin, cmax + 1, body, midv)

                needT = flat(need.astype(I32)).T > 0
                any_far = _any((needT & ~use_mid & ~use_ring)
                               .astype(I32)) > 0
                if cfg.debug_counters:
                    smem_ref[6] = smem_ref[6] + any_far.astype(I32)
                # the no-far branch returns midv (concrete layout — a zero
                # splat's replicated layout cannot join the gather branch);
                # its value is unused because mid/ring cover every slot then
                if _P_NOFAR:
                    slabv = midv
                else:
                    slabv = jax.lax.cond(any_far, far, lambda _: midv, 0)
                newq = to_regs(jnp.where(
                    use_mid, midv, jnp.where(use_ring, ringv, slabv)), CQ)
                outq = tuple(jnp.where(need, newq[kq], qr[kq])
                             for kq in range(CQ))
                ncqb = jnp.where(need, base, cqb)
                ncql = jnp.where(need, S["rdlim"], cqlim)
                return outq, ncqb, ncql

              qrc = tuple(S[f"cq{j}"] for j in range(CQ))
              if _P_NOFETCH or _P_NOC:
                  cqb, cqlim = S["cqb"], S["cqlim"]
              elif _P_NOCOND:
                  qrc, cqb, cqlim = do_cfetch((qrc, S["cqb"], S["cqlim"]))
              else:
                  qrc, cqb, cqlim = jax.lax.cond(
                      serve_pred, do_cfetch, lambda a: a,
                      (qrc, S["cqb"], S["cqlim"]))
              for j in range(CQ):
                  S[f"cq{j}"] = qrc[j]
              if cfg.debug_counters:
                  smem_ref[3] = smem_ref[3] + _any(S["cflag"])
              S["cqb"] = cqb
              S["cqlim"] = cqlim
              S["cflag"] = jnp.where(serve_pred, 0, S["cflag"])
              return S

            S = serve_cfetch(S, odd_t)

            # ---- U sub-steps via an inner fori (near-zero carry cost):
            # the expensive big-operand lax.conds above are evaluated ONCE
            # per trip instead of once per sub-step, while the compiled
            # body stays single-substep-sized.  The inner block runs TWICE
            # per trip (2*U sub-steps) so each fetch kind, served on
            # alternate trips, fires once per 4*U sub-steps ----------------
            UIN = cfg.uin

            def inner(i, carry):
                S2 = unpack(carry)

                def group_dump(S2, g8):
                    # write-through of the AP-deep append group + side dump.
                    # The dump cadence MUST equal the group depth or the
                    # ap<AP emission gate caps arc bandwidth below
                    # 1/sub-step (the r5 idle-no-action counter caught
                    # exactly that: an 8-deep group dumped once per 16
                    # sub-steps halved every emission-bound lane)
                    @pl.when(jnp.bool_(g8) & (not _P_NOTE))
                    def _():
                        abM = jnp.concatenate(
                            [flat(S2[f"a{j}"]) for j in range(AP)], 0)
                        abT = abM.T
                        posA = flat((S2["wb"] // AP) & (256 // AP - 1)).T
                        tile, mask = place8(abT, posA, 256, AP)
                        midt_ref[:, :] = jnp.where(mask, tile,
                                                   midt_ref[:, :])

                    sfull = (S2["sp"] - S2["sdump"]) == 8

                    @pl.when(jnp.bool_(g8) & (_any(sfull.astype(I32)) > 0)
                             & (not _P_NOTE))
                    def _():
                        sM = jnp.concatenate(
                            [flat(S2[f"s{j}"]) for j in range(8)], 0)
                        sT = sM.T
                        posS = flat(S2["sdump"] >> 3).T
                        sfT = flat(sfull.astype(I32)).T > 0
                        tile, mask = place8(sT, posS, SB)
                        side_ref[:, :] = jnp.where(sfT & mask, tile,
                                                   side_ref[:, :])

                    full = g8 & (S2["ap"] == AP)
                    S2["wb"] = jnp.where(full, S2["wb"] + AP, S2["wb"])
                    S2["ap"] = jnp.where(full, 0, S2["ap"])
                    S2["rdlim"] = jnp.where(g8, S2["wp"], S2["rdlim"])
                    S2["sdump"] = jnp.where(g8 & sfull, S2["sdump"] + 8,
                                            S2["sdump"])
                    return S2

                if UIN >= AP:
                    for _g in range(UIN // AP):
                        for _u in range(AP):
                            S2 = substep(S2)
                        S2 = group_dump(S2, True)
                else:
                    for _u in range(UIN):
                        S2 = substep(S2)
                    S2 = group_dump(S2, ((i + 1) * UIN & (AP - 1)) == 0)
                return tuple(S2[f] for f in _FIELDS)

            for _blk in range(1 if _P_SINGLE else 2):
                if _blk > 0 and _P_CF2:
                    # mid-trip copy-queue service: halves the worst-case
                    # merge-start -> service stall latency
                    S = serve_cfetch(S, odd_t | jnp.bool_(_P_CF2))
                S = unpack(jax.lax.fori_loop(
                    0, U // UIN, inner, tuple(S[f] for f in _FIELDS)))

            # ---- flush completed 128-blocks midT -> slab (trip end) -----
            # serve a 4-wide band of block indices from the global minimum:
            # the uniform dynamic slab slice means only lanes whose pending
            # block equals a served index flush this trip, and a 2-wide band
            # left arc-heavy lanes (58 blocks) flush-starved behind light
            # ones (12% of all lane-substeps were out-backpressure stalls,
    # r5 stall counters)
            # served block values: a band from the global MINIMUM pending
            # block plus the two MAXIMUM pending values — arc-heavy lanes
            # (58 blocks on cnr-2000) live at the high end and were the
    # kernel's critical path once emission ran at full bandwidth
            # (16% of lane-substeps were flush backpressure, r5 counters)
            pnd = (S["wb"] >> 7) > S["flp"]
            bmin = jnp.min(jnp.where(pnd, S["flp"], INF))
            bmax = jnp.max(jnp.where(pnd, S["flp"], -1))
            flpv = S["flp"]
            vals = [bmin + j for j in range(6)] + [bmax - 1, bmax]
            fl_sel = [pnd & (flpv == v) for v in vals]

            @pl.when((_any(pnd) > 0) & (not _P_NOTE))
            def _():
                lo = midt_ref[:, 0:128]
                hi = midt_ref[:, 128:256]
                for j, v in enumerate(vals):
                    B = jnp.clip(v, 0, SLABW // 128 - 1)
                    src = jnp.where((B & 1) == 1, hi, lo)
                    selT = flat(fl_sel[j].astype(I32)).T > 0
                    cur = slab_ref[:, pl.ds(B * 128, 128)]
                    slab_ref[:, pl.ds(B * 128, 128)] = jnp.where(
                        selT, src, cur)
                    rc = (B & 7) * 128
                    curR = ring_ref[:, pl.ds(rc, 128)]
                    ring_ref[:, pl.ds(rc, 128)] = jnp.where(selT, src, curR)

            # a lane's flp matches at most one bmin+j, but may ALSO match
            # a bmax value: advance exactly once per served lane
            served = fl_sel[0]
            for m_ in fl_sel[1:]:
                served = served | m_
            S["flp"] = jnp.where(served, S["flp"] + 1, S["flp"])

            if cfg.debug_counters:
                smem_ref[0] = smem_ref[0] + 1
                smem_ref[2] = smem_ref[2] + _any(pnd)

            return (tuple(S[f] for f in _FIELDS), trips + 1)

        def cond(carry):
            S = unpack(carry[0])
            running = _any(S["st"] != S_DONE) > 0
            return running & (carry[1] < cfg.trip_cap)

        if cfg.debug_counters:
            for i in range(8):
                smem_ref[i] = 0
        final, trips = jax.lax.while_loop(
            cond, trip, (state0, jnp.int32(0)))
        S = unpack(final)

        # ---- final drain: remaining midT blocks + partial block ---------
        abM = jnp.concatenate([flat(S[f"a{j}"]) for j in range(AP)], 0)
        abT = abM.T
        posA = flat((S["wb"] // AP) & (256 // AP - 1)).T
        tile, mask = place8(abT, posA, 256, AP)
        midt_ref[:, :] = jnp.where(mask, tile, midt_ref[:, :])
        lo = midt_ref[:, 0:128]
        hi = midt_ref[:, 128:256]
        wpT = flat(S["wp"]).T
        flpT = flat(S["flp"]).T
        for B in range(SLABW // 128):
            src = hi if (B & 1) else lo
            sel = (flpT <= B) & (B * 128 < wpT)
            cur = slab_ref[:, B * 128 : (B + 1) * 128]
            slab_ref[:, B * 128 : (B + 1) * 128] = jnp.where(sel, src, cur)

        wp_ref[:] = S["wp"]
        # final machine state per lane (stall diagnosis; cheap: 128 KB)
        for i, nm in enumerate(_DUMP_FIELDS):
            dump_ref[i] = S[nm]
        if cfg.debug_counters:
            li = lane_iota()
            dv = jnp.zeros((GROUPS, GLANES), I32)
            for i in range(8):
                dv = jnp.where(li == i, smem_ref[i], dv)
            dbg_ref[:] = jnp.where(li == 8, trips, dv)
        else:
            dbg_ref[:] = jnp.broadcast_to(trips, (GROUPS, GLANES))

    return kernel


# ----------------------------------------------------------------------
# host wrapper
# ----------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _compiled2(cfg: Cfg2, interpret: bool):
    if interpret and cfg.uin != 1:
        # unrolling only trades compile time for spill amortization on the
        # chip; keep interpret-mode (CPU test) compiles fast
        cfg = dataclass_replace(cfg, uin=1)
    kernel = build_kernel2(cfg)
    fn = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((LANES, cfg.slabw), I32),   # slab
            jax.ShapeDtypeStruct((GROUPS, GLANES), I32),     # wp
            jax.ShapeDtypeStruct((GROUPS, GLANES), I32),     # dbg
            jax.ShapeDtypeStruct((40, GROUPS, GLANES), I32),  # state dump
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # meta
            pl.BlockSpec(memory_space=pltpu.VMEM),           # words
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((LANES, 256), I32),                   # midT
            pltpu.VMEM((LANES, 1024), I32),                  # ring
            pltpu.VMEM((LANES, cfg.sb), I32),                # sidebuf
            pltpu.SMEM((8,), I32),                           # counters
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )
    return jax.jit(fn)


def _u32_words(g) -> np.ndarray:
    from webgraph_tpu.bits.bitstream import as_u64_words

    w64 = as_u64_words(g._words)
    w32 = np.empty(2 * len(w64), dtype=np.uint32)
    w32[0::2] = (w64 >> np.uint64(32)).astype(np.uint32)
    w32[1::2] = (w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return w32


def pack2(g, plan: LanePlan, w32: np.ndarray | None = None):
    """Pack the (meta, words_lane) device inputs for one planned tile."""
    if w32 is None:
        w32 = _u32_words(g)
    bo = g.bit_offsets.astype(np.int64)
    words_lane = np.zeros((LANES, plan.lw), dtype=np.uint32)
    for l in range(LANES):
        a = int(plan.word0[l])
        la = (int(plan.bit0b[l]) >> 5) if plan.cnta[l] < plan.cnt[l] \
            else plan.lw
        la = min(la, plan.lw)
        b = min(a + la, len(w32))
        if b > a:
            words_lane[l, : b - a] = w32[a:b]
        if plan.cnta[l] < plan.cnt[l]:
            a2 = int(bo[plan.gid0b[l]] >> 5)
            span = plan.lw - la
            b2 = min(a2 + span, len(w32))
            if b2 > a2:
                words_lane[l, la : la + (b2 - a2)] = w32[a2:b2]
    words_lane = words_lane.view(np.int32)

    meta = np.zeros((32, GROUPS, GLANES), dtype=np.int32)
    meta[0] = plan.gid0.reshape(GROUPS, GLANES)
    meta[1] = plan.cnt.reshape(GROUPS, GLANES)
    meta[2] = plan.bit0.reshape(GROUPS, GLANES)
    for j in range(7):
        meta[3 + j] = plan.d7[j].reshape(GROUPS, GLANES)
    meta[10] = plan.gid0b.reshape(GROUPS, GLANES)
    meta[11] = plan.cnta.reshape(GROUPS, GLANES)
    meta[12] = plan.bit0b.reshape(GROUPS, GLANES)
    for j in range(7):
        meta[13 + j] = plan.d7b[j].reshape(GROUPS, GLANES)
    return meta, words_lane


def prepare2(g, *, slab_cap: int = 8192, debug_counters: bool = False):
    """Plan + pack device inputs for a single-invocation streaming decode.

    Returns (cfg, plan, meta, words_lane).  Planning mirrors the load-time
    index builds of the reference (.obl / .outdegrees, BVGraph.java:362-364)
    and is not part of the timed decode."""
    from webgraph_tpu.pallas.plan import scan_structure

    scan = scan_structure(g)
    plan = plan_lanes(g, scan, slab_cap=slab_cap)
    cfg = make_cfg2(g, plan, debug_counters=debug_counters, scan=scan)
    meta, words_lane = pack2(g, plan)
    return cfg, plan, meta, words_lane


def plan_tiles(g, scan, *, slab_cap: int = 8192,
               tile_arcs: int | None = None,
               num_tiles: int | None = None) -> list[LanePlan]:
    """Split [0, n) into node tiles that each fit one kernel invocation and
    plan them with a COMMON (slabw, lw, sb, trip bound) so every tile runs
    the same compiled kernel.  Cross-tile reference chains need no protocol:
    each lane re-decodes its own ancestor overlap, which may reach into the
    previous tile (the per-lane analog of the reference's mid-graph window
    priming, BVGraph.java:1173-1183)."""
    n = g.num_nodes()
    d = scan.d.astype(np.int64)
    csr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(d, out=csr[1:])
    m = int(csr[-1])
    if num_tiles is None:
        cap = tile_arcs if tile_arcs else LANES * (slab_cap // 2)
        num_tiles = max(1, -(-m // cap))
    # boundaries at arc quantiles (arc-balanced tiles)
    targets = (np.arange(1, num_tiles) * m) // num_tiles
    bounds = np.concatenate(
        [[0], np.searchsorted(csr, targets, side="left"), [n]])
    bounds = np.unique(bounds)
    plans = [
        plan_lanes(g, scan, slab_cap=slab_cap,
                   node_range=(int(a), int(b)))
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    slabw = max(p.slabw for p in plans)
    lw = max(p.lw for p in plans)
    sb = max(p.sb for p in plans)
    out = []
    for p, (a, b) in zip(plans, zip(bounds[:-1], bounds[1:])):
        if p.slabw != slabw:  # re-plan with the common slab width (prow
            p = plan_lanes(g, scan, slab_cap=slab_cap,  # depends on it)
                           node_range=(int(a), int(b)), slabw_fixed=slabw)
        p.lw = lw
        p.sb = sb
        out.append(p)
    return out


def decode_to_slab(g, *, interpret: bool | None = None,
                   slab_cap: int = 8192, debug_counters: bool = False):
    """Run the streaming kernel; returns (plan, slab, wp, dbg)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cfg, plan, meta, words = prepare2(
        g, slab_cap=slab_cap, debug_counters=debug_counters)
    fn = _compiled2(cfg, bool(interpret))
    slab, wp, dbg, dump = fn(jnp.asarray(meta), jnp.asarray(words))
    return plan, np.asarray(slab), np.asarray(wp).reshape(-1), (
        np.asarray(dbg), np.asarray(dump))


def decode_to_csr(g, *, interpret: bool | None = None,
                  slab_cap: int = 8192, tile_arcs: int | None = None):
    """Decode via the streaming kernel; return (offsets int64[n+1],
    successors int32[m]) identical to bvgraph_np.decode_to_csr.

    Graphs whose output exceeds one invocation's VMEM slab are decoded as
    a sequence of node tiles through ONE compiled kernel (plan_tiles) —
    the unbounded-size analog of the reference's sequential decode
    (BVGraph.java:1136-1281).  The flat-CSR compaction is a host-side
    convenience for tests; the kernel's native output (slab + plan.prow)
    is itself a constant-time random-access representation."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from webgraph_tpu.pallas.plan import scan_structure

    scan = scan_structure(g)
    if tile_arcs is None:
        try:
            tiles = [plan_lanes(g, scan, slab_cap=slab_cap)]
        except ValueError:
            tiles = plan_tiles(g, scan, slab_cap=slab_cap)
    else:
        tiles = plan_tiles(g, scan, slab_cap=slab_cap, tile_arcs=tile_arcs)
    worst = max(tiles, key=lambda p: p.max_steps)
    cfg = make_cfg2(g, worst, scan=scan)
    fn = _compiled2(cfg, bool(interpret))

    n = g.num_nodes()
    dd = scan.d.astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dd, out=offsets[1:])
    succ = np.empty(int(offsets[-1]), dtype=np.int32)
    w32 = _u32_words(g)
    for plan in tiles:
        meta, words = pack2(g, plan, w32)
        slab, wp, dbg, dump = fn(jnp.asarray(meta), jnp.asarray(words))
        wp = np.asarray(wp).reshape(-1)
        exp = plan.exp_wp
        if not np.array_equal(wp[: len(exp)], exp):
            bad = np.flatnonzero(wp[: len(exp)] != exp)[:8]
            raise AssertionError(
                f"lane emission counts off at lanes {bad} "
                f"(tile [{plan.lo}, {plan.hi})): {wp[bad]} vs {exp[bad]}")
        flat = np.asarray(slab).reshape(-1)
        lo, hi = plan.lo, plan.hi
        base = int(offsets[lo])
        mt = int(offsets[hi]) - base
        # vectorized ragged gather: node x's row lives at slab[prow[x-lo]…]
        take = np.repeat(plan.prow[: hi - lo], dd[lo:hi]) + (
            np.arange(mt) - np.repeat(offsets[lo:hi] - base, dd[lo:hi]))
        succ[base : base + mt] = flat[take]
    return offsets, succ


def supports(g, *, max_reach: int = 256) -> bool:
    """Whether the streaming kernel can decode ``g``: every coding must
    have a window reader (GAMMA/DELTA/ZETA/UNARY — GOLOMB and NIBBLE fall
    back, BVGraph.java:791-849), window <= 7, and reference-chain reach
    bounded (unbounded maxref chains collapse the per-lane overlap)."""
    s = g.settings
    ok_codings = all(c in (C.GAMMA, C.DELTA, C.ZETA, C.UNARY) for c in (
        s.outdegree_coding, s.reference_coding, s.block_count_coding,
        s.block_coding, s.residual_coding))
    if not (ok_codings and s.window_size <= 7):
        return False
    # no size limit: graphs beyond one invocation's VMEM slab are decoded
    # as a sequence of node tiles (plan_tiles / decode_to_csr)
    if s.max_ref_count >= 0 and s.window_size * max(s.max_ref_count, 1) \
            <= max_reach:
        return True
    # unbounded or large maxref: check the ACTUAL chain reach
    from webgraph_tpu.pallas.plan import scan_structure

    scan = scan_structure(g)
    n = g.num_nodes()
    ref = scan.ref.astype(np.int64)
    parent = np.where(ref > 0, np.arange(n) - ref, np.arange(n))
    minanc = np.arange(n)
    cur = parent.copy()
    for _ in range(int(scan.depth.max(initial=0)) + 1):
        minanc = np.minimum(minanc, cur)
        cur = parent[cur]
    return int((np.arange(n) - minanc).max(initial=0)) <= max_reach


def decode_to_csr_auto(g, *, interpret: bool | None = None):
    """Decode with the best available in-kernel path: the streaming
    lane-range kernel when it supports the graph's configuration, else the
    round-3 block-phase kernel (window <= 7, no GOLOMB/NIBBLE), else the
    fused-XLA decoder (every CompressionFlags coding — the reference
    decodes all codings in all paths, BVGraph.java:791-849)."""
    if supports(g):
        return decode_to_csr(g, interpret=interpret)
    s = g.settings
    from webgraph_tpu.pallas import decode as D1

    ok1 = s.window_size <= 7 and all(
        c in (C.GAMMA, C.DELTA, C.ZETA, C.UNARY) for c in (
            s.outdegree_coding, s.reference_coding, s.block_count_coding,
            s.block_coding, s.residual_coding))
    if ok1:
        return D1.decode_to_csr(g, interpret=interpret)
    from webgraph_tpu.formats import bvgraph_np

    return bvgraph_np.decode_to_csr(g)
