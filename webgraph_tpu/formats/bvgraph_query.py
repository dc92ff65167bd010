"""Device-batched random-access successor queries (BVGraph).

The reference answers ``successors(x)`` with a lazy iterator tree whose
copy part *recursively* random-accesses the parent list
(``BVGraph.java:1032-1133``, chain resolution at ``:1110-1121``).  The
TPU-native formulation batches Q queries and resolves chains as a fixed
number of *levels*: the ancestor closure (level l+1 = parents of level l,
chain depth is bounded by the graph's maximal reference-chain depth) is
decoded as ONE flat slot batch by the existing XLA work-queue stages, and
lists are then assembled bottom-up — level l's lists = sort-merge of the
parent level's kept values (copy-block masks) with the level's own
interval+residual extras.

Adjacency queries (``SpeedTest.java:123-156``'s skipTo loop analog)
reduce to a vectorized membership test over the decoded rows.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from webgraph_tpu.bits import jcodes as J
from webgraph_tpu.formats import bvgraph_jax as B

I32 = jnp.int32
INF = jnp.int32(2**30)


class BatchQuery:
    """Compiled batched random-access engine for one loaded BVGraph.

    ``query(nodes[Q]) -> (counts[Q], rows[Q, W])``: row i holds the sorted
    successors of ``nodes[i]`` in its first ``counts[i]`` slots, INF-padded.
    Build cost is one host structure scan (the same artifact class as the
    reference's offsets/.obl caches); each query batch is one XLA program.
    """

    def __init__(self, g, batch_size: int = 256):
        from webgraph_tpu.bits.bitstream import words_to_bytes
        from webgraph_tpu.pallas.plan import scan_structure

        s = g.settings
        self.Q = Q = int(batch_size)
        self.skey = (
            s.outdegree_coding, s.reference_coding, s.block_count_coding,
            s.block_coding, s.residual_coding, s.zeta_k, s.window_size,
            s.min_interval_length,
        )
        scan = scan_structure(g)
        self.n = g.num_nodes()
        self.L = int(scan.depth.max()) if self.n else 0
        self.W = int(scan.d.max()) if self.n else 1
        self.W = max(self.W, 1)
        S_tot = Q * (self.L + 1)

        # static batch bounds: the closure may contain the SAME node many
        # times (queries sharing ancestors, self-propagated chain tails),
        # so per-batch totals are bounded by S_tot x the per-node maximum —
        # a top-S_tot sum of distinct nodes under-bounds duplicated slots
        def cap(a):
            a = np.asarray(a, dtype=np.int64)
            return int(S_tot * (a.max() if len(a) else 0))

        d64 = scan.d.astype(np.int64)
        extra = np.where(scan.ref > 0, d64 - scan.copied, np.where(d64 > 0, d64, 0))
        int_arcs = extra - scan.res_count
        self.sizes = {
            "total_blocks": cap(scan.block_count),
            "total_ints": cap(scan.int_count),
            "total_res": cap(scan.res_count),
            "tot_int_arcs": cap(int_arcs),
        }

        data = words_to_bytes(np.asarray(g._words), g._bit_length)
        self.words = jnp.asarray(J.words_from_bytes(data))
        self.bit_offsets = jnp.asarray(g.bit_offsets[: self.n].astype(np.int64))
        self.ref = jnp.asarray(scan.ref.astype(np.int32))
        self._fn = None

    def query(self, nodes):
        nodes = jnp.asarray(np.asarray(nodes, dtype=np.int32))
        assert nodes.shape == (self.Q,), f"batch must be {self.Q} nodes"
        if self._fn is None:
            self._fn = functools.partial(
                _query_batch, Q=self.Q, L=self.L, W=self.W, skey=self.skey,
                **{k: int(v) for k, v in self.sizes.items()},
            )
        return self._fn(self.words, self.bit_offsets, self.ref, nodes)

    def adjacency(self, src, dst):
        """Vectorized membership test: is (src[i] -> dst[i]) an arc?"""
        counts, rows = self.query(src)
        dst = jnp.asarray(np.asarray(dst, dtype=np.int32))
        col = jnp.arange(rows.shape[1], dtype=I32)[None, :]
        hit = (rows == dst[:, None]) & (col < counts[:, None])
        return jnp.any(hit, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("Q", "L", "W", "skey", "total_blocks", "total_ints",
                     "total_res", "tot_int_arcs"),
)
def _query_batch(words, bit_offsets, ref_full, nodes, *, Q, L, W, skey,
                 total_blocks, total_ints, total_res, tot_int_arcs):
    lanes = B.DEFAULT_LANES
    # ---- ancestor closure: level l+1 = parents of level l --------------
    levels = [nodes]
    for _ in range(L):
        cur = levels[-1]
        r = ref_full[cur]
        levels.append(jnp.where(r > 0, cur - r, cur))
    slots = jnp.concatenate(levels)  # (S_tot,) global node ids
    S_tot = Q * (L + 1)

    pos = bit_offsets[slots].astype(I32)
    d, ref, block_count, pos, _, _ = B._stage1(words, pos, skey)
    # parent outdegree: the parent of slot i lives at slot i + Q
    if L > 0:
        dp_parent = jnp.concatenate([d[Q:], jnp.zeros(Q, I32)])
    else:
        dp_parent = jnp.zeros(S_tot, I32)
    dp_full = jnp.where(ref > 0, dp_parent, 0)

    (blocks_flat, block_start, pos, copied, extra_count, int_count, _) = B._stage2_blocks(
        words, pos, block_count, d, ref, skey, lanes, total_blocks,
        n_items=S_tot, dp_full=dp_full,
    )
    lefts, lens, int_start, pos, residual_count, _, _ = B._stage3_intervals(
        words, pos, int_count, extra_count, skey, lanes, total_ints,
        n_items=S_tot, node_gid=slots,
    )
    residuals, res_start = B._stage4_residuals(
        words, pos, residual_count, skey, lanes, total_res,
        n_items=S_tot, node_gid=slots,
    )
    extra_nodes, extra_vals = B._stage5_extras(
        lefts, lens, int_count, residuals, residual_count, res_start,
        tot_int_arcs, 0, total_ints, total_res,
    )

    # ---- extras -> INF-padded per-slot rows ----------------------------
    E = extra_nodes.shape[0]
    ranks = jnp.arange(E, dtype=I32) - B._group_first(extra_nodes)
    en = jnp.minimum(extra_nodes, S_tot)
    flatE = jnp.full(S_tot * W, INF, I32).at[en * W + jnp.minimum(ranks, W - 1)].set(
        extra_vals, mode="drop")
    Erows = flatE.reshape(S_tot, W)

    # ---- copy keep-masks over parent positions -------------------------
    # boundaries at cumulative block sums; parity == runs of keep/skip
    col = jnp.arange(W, dtype=I32)[None, :]
    if total_blocks > 0:
        slot_ids = jnp.arange(S_tot, dtype=I32)
        b_node = jnp.repeat(slot_ids, block_count, total_repeat_length=total_blocks)
        b_valid = jnp.arange(total_blocks, dtype=I32) < jnp.sum(block_count)
        cs_all = jnp.cumsum(blocks_flat, dtype=I32)
        seg_first = block_start[jnp.clip(b_node, 0, S_tot - 1)]
        excl = jnp.where(seg_first > 0, cs_all[jnp.maximum(seg_first - 1, 0)], 0)
        b_cum = cs_all - excl
        bn = jnp.minimum(b_node, S_tot)
        tgt = jnp.where(b_valid & (b_cum < W), bn * W + b_cum, S_tot * W)
        flags = jnp.zeros(S_tot * W, I32).at[tgt].add(1, mode="drop")
        runs = jnp.cumsum(flags.reshape(S_tot, W), axis=1)
    else:
        runs = jnp.zeros((S_tot, W), I32)
    keep = ((runs & 1) == 0) & (col < dp_full[:, None]) & (ref > 0)[:, None]

    # ---- bottom-up level merge ----------------------------------------
    rows = Erows  # level-L slots have no references (depth 0 ancestors)
    for lev in range(L - 1, -1, -1):
        lo = lev * Q
        parent_rows = jax.lax.dynamic_slice_in_dim(rows, lo + Q, Q, 0)
        k = jax.lax.dynamic_slice_in_dim(keep, lo, Q, 0)
        e = jax.lax.dynamic_slice_in_dim(Erows, lo, Q, 0)
        copies = jnp.where(k, parent_rows, INF)
        merged = jnp.sort(jnp.concatenate([copies, e], axis=1), axis=1)[:, :W]
        rows = jax.lax.dynamic_update_slice_in_dim(rows, merged, lo, 0)

    return d[:Q], rows[:Q]
