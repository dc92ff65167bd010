"""BVGraph bulk decoder on device (JAX/XLA, TPU-targeted, device-resident).

Mirrors the phase structure of the NumPy blueprint (``bvgraph_np.py``) with
fixed-shape, jit-compiled stages:

* **structure pass** — full-width lane-parallel decode of outdegree /
  reference / block count for every node, one fused vector step each;
* **work-queue kernels** — the ragged loops (copy blocks, intervals,
  residuals) run as ``lax.while_loop`` work queues: L lanes each own one
  node's cursor, decode one code per trip, and pull the next node from a
  shared queue when theirs is exhausted.  This is the TPU analog of the
  reference's arc-balanced dynamic load balancing (HyperBall's
  EliasFanoCumulativeOutdegreeList.skipTo chunking, HyperBall.java:849-873);
* **assembly** — segmented interval expansion and two-key ``lax.sort``
  merges;
* **chain rounds** — copy-block masks by run-length parity, full-width
  masked rounds up to the maximum reference-chain depth.

Everything is int32/uint32 (no x64), and — crucially for this machine, where
device->host transfers are catastrophically slow — **all bulk data stays on
device**; only per-stage buffer sizes (a handful of scalars) ever cross back
to the host, to fix the static shapes of the next stage.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from webgraph_tpu.bits import jcodes as J

I32 = jnp.int32
U32 = jnp.uint32

DEFAULT_LANES = 32768
HEAVY_UNROLL = 32  # deep chains: fewer trips, each amortizing fixed op cost


@dataclass
class DeviceGraph:
    """A BVGraph shard resident on device: uint32 bitstream + int32 offsets."""

    words: jnp.ndarray
    bit_offsets: jnp.ndarray  # int32[n+1]
    n: int
    settings: object  # BVGraphSettings

    @classmethod
    def from_host(cls, g) -> "DeviceGraph":
        from webgraph_tpu.bits.bitstream import words_to_bytes

        from webgraph_tpu.bits.bitstream import as_u64_words

        data = words_to_bytes(as_u64_words(g._words), g._bit_length)
        words = jnp.asarray(J.words_from_bytes(data))
        if g.bit_offsets is None:
            raise ValueError("device decode requires the offsets index")
        if int(g.bit_offsets[-1]) >= 2**31:
            raise ValueError("shard bitstream exceeds 2^31 bits; shard it first")
        return cls(
            words=words,
            bit_offsets=jnp.asarray(g.bit_offsets.astype(np.int32)),
            n=g.num_nodes(),
            settings=g.settings,
        )

    def settings_key(self):
        s = self.settings
        return (
            s.outdegree_coding,
            s.reference_coding,
            s.block_count_coding,
            s.block_coding,
            s.residual_coding,
            s.zeta_k,
            s.window_size,
            s.min_interval_length,
        )


# ----------------------------------------------------------------------
# Stage 1: structure pass + block-queue scheduling (device)
# ----------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("skey",))
def _stage1(words, start_pos, skey):
    from webgraph_tpu.bits import codes as C

    (outd_c, ref_c, bcnt_c, _blk_c, _res_c, zeta_k, window_size, _minint) = skey
    read_outd = J.make_reader(outd_c, zeta_k)
    # references are bounded by the window, so their unary never refills
    if ref_c == C.UNARY and window_size < 64:
        read_ref = J.read_unary_short
    else:
        read_ref = J.make_reader(ref_c, zeta_k)
    read_bcnt = J.make_reader(bcnt_c, zeta_k)

    wrows = J.window_rows(words) if words.ndim == 1 else words
    d, pos = read_outd(wrows, start_pos)
    nonempty = d > 0
    if window_size > 0:
        r, p2 = read_ref(wrows, pos)
        ref = jnp.where(nonempty, r, -1)
        pos = jnp.where(nonempty, p2, pos)
    else:
        ref = jnp.full_like(d, -1)
    has_ref = ref > 0
    bc, p3 = read_bcnt(wrows, pos)
    block_count = jnp.where(has_ref, bc, 0)
    pos = jnp.where(has_ref, p3, pos)
    total_blocks = jnp.sum(block_count)
    m = jnp.sum(d)
    return d, ref, block_count, pos, total_blocks, m


# ----------------------------------------------------------------------
# Work-queue driver (shared)
# ----------------------------------------------------------------------


def _queue_loop(lo, hi, init_lane, step_fn, apply_fn, pull_fn, carry_init, lanes, unroll=1):
    """Work-queue driver over items [lo, hi): each while_loop trip runs
    ``unroll`` decode steps per lane, applies all their writes in ONE
    batched scatter per output array, then retires finished lanes and pulls
    new items.

    Two backend facts shape this design: (1) on this machine every XLA op
    inside a while_loop costs tens of microseconds of launch overhead
    regardless of operand size, so writes are batched across the unroll
    (op count, not bytes, is the currency); (2) a handful of very deep
    items would serialize wide lanes for hundreds of trips, so callers
    split the workload into a narrow heavy tier and a wide bulk tier (the
    TPU analog of the reference's arc-balanced chunking,
    HyperBall.java:849-873)."""

    def cond(st):
        head, state, carry = st
        return (head < hi) | jnp.any(state["remaining"] > 0)

    def body(st):
        head, state, carry = st
        writes = []
        for _ in range(unroll):
            state, w = step_fn(state)
            writes.append(w)
        carry = apply_fn(carry, writes)
        finished = (state["remaining"] == 0) & state["live"]
        ranks = jnp.cumsum(finished.astype(I32)) - finished.astype(I32)
        new_item = head + ranks
        valid = finished & (new_item < hi)
        state = pull_fn(state, new_item, valid)
        state["live"] = (state["live"] & (state["remaining"] > 0)) | valid
        head = head + jnp.sum(finished.astype(I32))
        return head, state, carry

    lane_ids = lo + jnp.arange(lanes, dtype=I32)
    state0 = init_lane(lane_ids)
    head0 = jnp.minimum(jnp.int32(lo + lanes), jnp.int32(hi))
    _, state, carry = jax.lax.while_loop(cond, body, (head0, state0, carry_init))
    return carry


def _item_state(i, hi, starts, counts, bases, nodes, gids=None):
    in_range = i < hi
    ii = jnp.where(in_range, i, 0)
    st = {
        "item": ii,
        "pos": jnp.where(in_range, starts[ii], 0),
        "remaining": jnp.where(in_range, counts[ii], 0),
        "base": jnp.where(in_range, bases[ii], 0),
        "off": jnp.zeros_like(i),
        "prev": jnp.zeros_like(i),
        "node": jnp.where(in_range, nodes[ii], 0),
        # zero-count items must start live so they retire (and trigger a
        # pull) on the first trip — otherwise the queue deadlocks.
        "live": in_range,
    }
    if gids is not None:
        # value anchor when the item index space is NOT the node id space
        # (batched random access decodes a closure of slots)
        st["gid"] = jnp.where(in_range, gids[ii], 0)
    return st


def _pull(state, new_item, valid, hi, starts, counts, bases, nodes, gids=None):
    ii = jnp.where(valid, jnp.minimum(new_item, hi - 1), 0)
    state = dict(state)
    state["item"] = jnp.where(valid, ii, state["item"])
    state["pos"] = jnp.where(valid, starts[ii], state["pos"])
    state["remaining"] = jnp.where(valid, counts[ii], state["remaining"])
    state["base"] = jnp.where(valid, bases[ii], state["base"])
    state["off"] = jnp.where(valid, 0, state["off"])
    state["prev"] = jnp.where(valid, 0, state["prev"])
    state["node"] = jnp.where(valid, nodes[ii], state["node"])
    if gids is not None:
        state["gid"] = jnp.where(valid, gids[ii], state["gid"])
    return state


def _heavy_lanes(n_heavy: int) -> int:
    """Lane count for the heavy tier: just enough to host every heavy item
    at once (rounded up to the 128-lane vector width)."""
    return max(128, ((n_heavy + 127) // 128) * 128)


def _run_tiers(n_items, n_heavy, lanes, unroll, init_for, step, apply_fn, pull_for, carry):
    """Run the narrow heavy tier (items [0, n_heavy), largest first) then
    the wide bulk tier (items [n_heavy, n_items)).  ``init_for(hi)`` /
    ``pull_for(hi)`` build the closures bounded to each tier's item range."""
    if n_heavy > 0:
        hl = min(_heavy_lanes(n_heavy), lanes)
        carry = _queue_loop(
            0, n_heavy, init_for(n_heavy), step, apply_fn, pull_for(n_heavy), carry, hl,
            max(unroll, HEAVY_UNROLL),
        )
    if n_items > n_heavy:
        carry = _queue_loop(
            n_heavy, n_items, init_for(n_items), step, apply_fn, pull_for(n_items), carry, lanes, unroll
        )
    return carry


# ----------------------------------------------------------------------
# Stage 2: copy blocks (work queue, device)
# ----------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("skey", "lanes", "total_out", "n_items", "unroll", "n_heavy")
)
def _stage2_blocks(
    words, pos, block_count, d, ref, skey, lanes, total_out, n_items=None, unroll=4, n_heavy=0,
    pre_d=None, dp_full=None,
):
    """Decode all copy-block lists; returns (blocks_flat, block_start,
    pos_after, copied, extra_count, interval-gated cursor updates).

    ``pre_d`` (optional, window-size array): outdegrees of the nodes just
    BEFORE this node range, so reference tails crossing a shard boundary
    resolve exactly (node-range sharding; reference window priming analog,
    BVGraph.java:1173-1183)."""
    (_o, _r, _bc, blk_c, _res, zeta_k, _w, minint) = skey
    n = pos.shape[0]
    if n_items is None:
        n_items = n
    read_blk = J.make_reader(blk_c, zeta_k)
    wrows = J.window_rows(words) if words.ndim == 1 else words

    order = jnp.argsort(-block_count)[:n_items].astype(I32)
    counts = block_count[order]
    block_start = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(block_count, dtype=I32)])
    starts = pos[order]
    bases = block_start[order]

    def init_for(hi):
        return lambda i: _item_state(i, hi, starts, counts, bases, order)

    def step(state):
        active = state["remaining"] > 0
        v, newpos = read_blk(wrows, state["pos"])
        val = v + (state["off"] > 0).astype(I32)
        # sink = total_out + 1 is out of bounds for the (total_out + 1)-sized
        # buffer, so inactive lanes are dropped (never written, never dup)
        tgt = jnp.where(active, state["base"] + state["off"], total_out + 1)
        state = dict(state)
        state["pos"] = jnp.where(active, newpos, state["pos"])
        state["remaining"] = jnp.where(active, state["remaining"] - 1, 0)
        state["off"] = jnp.where(active, state["off"] + 1, state["off"])
        done_now = active & (state["remaining"] == 0)
        etgt = jnp.where(done_now, state["node"], n)
        return state, (tgt, val, etgt, state["pos"])

    def apply_fn(carry, writes):
        out, end_pos = carry
        tgts = jnp.concatenate([w[0] for w in writes])
        vals = jnp.concatenate([w[1] for w in writes])
        out = out.at[tgts].set(vals, mode="drop", unique_indices=True)
        etgts = jnp.concatenate([w[2] for w in writes])
        eposs = jnp.concatenate([w[3] for w in writes])
        end_pos = end_pos.at[etgts].set(eposs, mode="drop", unique_indices=True)
        return out, end_pos

    def pull_for(hi):
        return lambda state, new_item, valid: _pull(
            state, new_item, valid, hi, starts, counts, bases, order
        )

    if n_items > 0:
        out0 = jnp.zeros(total_out + 1, dtype=I32)
        endpos0 = jnp.zeros(n, dtype=I32)
        blocks_flat, end_pos = _run_tiers(
            n_items, n_heavy, lanes, unroll, init_for, step, apply_fn, pull_for, (out0, endpos0)
        )
        blocks_flat = blocks_flat[:total_out]
    else:
        blocks_flat = jnp.zeros(total_out, dtype=I32)
        end_pos = jnp.zeros(n, dtype=I32)

    pos_after = jnp.where(block_count > 0, end_pos, pos)

    # copied counts: segment sums of even-indexed blocks + implicit tail
    node_ids = jnp.arange(n, dtype=I32)
    if total_out > 0:
        seg_node = jnp.repeat(node_ids, block_count, total_repeat_length=total_out)
        within = jnp.arange(total_out, dtype=I32) - block_start[seg_node]
        even = (within & 1) == 0
        copied = jnp.zeros(n, I32).at[seg_node].add(jnp.where(even, blocks_flat, 0))
        total_b_node = jnp.zeros(n, I32).at[seg_node].add(blocks_flat)
    else:
        copied = jnp.zeros(n, I32)
        total_b_node = jnp.zeros(n, I32)
    has_ref = ref > 0
    if dp_full is not None:
        # batched random access: the caller supplies each slot's parent
        # outdegree directly (parents live at fixed slot offsets, not at
        # node_ids - ref in this index space)
        dp = dp_full
    else:
        parent = jnp.where(has_ref, node_ids - ref, 0)
        dp = d[jnp.clip(parent, 0, None)]
        if pre_d is not None:
            w = pre_d.shape[0]
            dp = jnp.where(parent >= 0, dp, pre_d[jnp.clip(w + parent, 0, w - 1)])
    tail = jnp.where(has_ref & ((block_count & 1) == 0), dp - total_b_node, 0)
    copied = copied + tail
    extra_count = jnp.where(has_ref, d - copied, d)
    extra_count = jnp.where(d > 0, extra_count, 0)

    # interval counts (vector step, gated)
    if minint != 0:
        ic, p_ic = J.read_gamma(wrows, pos_after)
        gate = extra_count > 0
        int_count = jnp.where(gate, ic, 0)
        pos_after = jnp.where(gate, p_ic, pos_after)
    else:
        int_count = jnp.zeros(n, dtype=I32)
    return (
        blocks_flat,
        block_start,
        pos_after,
        copied,
        extra_count,
        int_count,
        jnp.sum(int_count),
    )


# ----------------------------------------------------------------------
# Stage 3: intervals (work queue, device)
# ----------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("skey", "lanes", "total_out", "n_items", "unroll", "n_heavy")
)
def _stage3_intervals(
    words, pos, int_count, extra_count, skey, lanes, total_out, n_items=None, unroll=2, n_heavy=0,
    node_gid=None,
):
    (_o, _r, _bc, _blk, _res, zeta_k, _w, minint) = skey
    n = pos.shape[0]
    if n_items is None:
        n_items = n
    wrows = J.window_rows(words) if words.ndim == 1 else words
    order = jnp.argsort(-int_count)[:n_items].astype(I32)
    counts = int_count[order]
    int_start = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(int_count, dtype=I32)])
    starts = pos[order]
    bases = int_start[order]
    gids = node_gid[order] if node_gid is not None else None

    def init_for(hi):
        return lambda i: _item_state(i, hi, starts, counts, bases, order, gids)

    def step(state):
        active = state["remaining"] > 0
        lraw, p = J.read_gamma_u(wrows, state["pos"])
        first = state["off"] == 0
        anchor = state["gid"] if gids is not None else state["node"]
        left = jnp.where(
            first, anchor + J.nat2int_u(lraw), state["prev"] + 1 + lraw.astype(I32)
        )
        ln_raw, p2 = J.read_gamma(wrows, p)
        ln = ln_raw + minint
        tgt = jnp.where(active, state["base"] + state["off"], total_out + 1)
        state = dict(state)
        state["pos"] = jnp.where(active, p2, state["pos"])
        state["remaining"] = jnp.where(active, state["remaining"] - 1, 0)
        state["off"] = jnp.where(active, state["off"] + 1, state["off"])
        state["prev"] = jnp.where(active, left + ln, state["prev"])
        done_now = active & (state["remaining"] == 0)
        etgt = jnp.where(done_now, state["node"], n)
        return state, (tgt, left, ln, etgt, state["pos"])

    def apply_fn(carry, writes):
        lefts, lens, end_pos = carry
        tgts = jnp.concatenate([w[0] for w in writes])
        lefts = lefts.at[tgts].set(jnp.concatenate([w[1] for w in writes]), mode="drop", unique_indices=True)
        lens = lens.at[tgts].set(jnp.concatenate([w[2] for w in writes]), mode="drop", unique_indices=True)
        etgts = jnp.concatenate([w[3] for w in writes])
        eposs = jnp.concatenate([w[4] for w in writes])
        end_pos = end_pos.at[etgts].set(eposs, mode="drop", unique_indices=True)
        return lefts, lens, end_pos

    def pull_for(hi):
        return lambda state, new_item, valid: _pull(
            state, new_item, valid, hi, starts, counts, bases, order, gids
        )

    if n_items > 0:
        lefts0 = jnp.zeros(total_out + 1, dtype=I32)
        lens0 = jnp.zeros(total_out + 1, dtype=I32)
        endpos0 = jnp.zeros(n, dtype=I32)
        lefts, lens, end_pos = _run_tiers(
            n_items, n_heavy, lanes, unroll, init_for, step, apply_fn, pull_for,
            (lefts0, lens0, endpos0),
        )
        lefts, lens = lefts[:total_out], lens[:total_out]
    else:
        lefts = jnp.zeros(total_out, dtype=I32)
        lens = jnp.zeros(total_out, dtype=I32)
        end_pos = jnp.zeros(n, dtype=I32)

    pos_after = jnp.where(int_count > 0, end_pos, pos)
    node_ids = jnp.arange(n, dtype=I32)
    if total_out > 0:
        seg_node = jnp.repeat(node_ids, int_count, total_repeat_length=total_out)
        interval_arcs = jnp.zeros(n, I32).at[seg_node].add(lens)
        tot_int_arcs = jnp.sum(lens)
    else:
        interval_arcs = jnp.zeros(n, I32)
        tot_int_arcs = jnp.int32(0)
    residual_count = extra_count - interval_arcs
    return lefts, lens, int_start, pos_after, residual_count, jnp.sum(residual_count), tot_int_arcs


# ----------------------------------------------------------------------
# Stage 4: residuals (the hot kernel, device)
# ----------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("skey", "lanes", "total_out", "n_items", "unroll", "n_heavy")
)
def _stage4_residuals(
    words, pos, residual_count, skey, lanes, total_out, n_items=None, unroll=8, n_heavy=0,
    node_gid=None,
):
    (_o, _r, _bc, _blk, res_c, zeta_k, _w, _mi) = skey
    n = pos.shape[0]
    if n_items is None:
        n_items = n
    read_u = J.make_reader_u(res_c, zeta_k)
    wrows = J.window_rows(words) if words.ndim == 1 else words
    order = jnp.argsort(-residual_count)[:n_items].astype(I32)
    counts = residual_count[order]
    res_start = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(residual_count, dtype=I32)])
    starts = pos[order]
    bases = res_start[order]
    gids = node_gid[order] if node_gid is not None else None

    def init_for(hi):
        return lambda i: _item_state(i, hi, starts, counts, bases, order, gids)

    def step(state):
        active = state["remaining"] > 0
        v, newpos = read_u(wrows, state["pos"])
        first = state["off"] == 0
        anchor = state["gid"] if gids is not None else state["node"]
        val = jnp.where(first, anchor + J.nat2int_u(v), state["prev"] + v.astype(I32) + 1)
        tgt = jnp.where(active, state["base"] + state["off"], total_out + 1)
        state = dict(state)
        state["pos"] = jnp.where(active, newpos, state["pos"])
        state["remaining"] = jnp.where(active, state["remaining"] - 1, 0)
        state["off"] = jnp.where(active, state["off"] + 1, state["off"])
        state["prev"] = jnp.where(active, val, state["prev"])
        return state, (tgt, val)

    def apply_fn(out, writes):
        tgts = jnp.concatenate([w[0] for w in writes])
        vals = jnp.concatenate([w[1] for w in writes])
        return out.at[tgts].set(vals, mode="drop", unique_indices=True)

    def pull_for(hi):
        return lambda state, new_item, valid: _pull(
            state, new_item, valid, hi, starts, counts, bases, order, gids
        )

    if n_items > 0:
        out0 = jnp.zeros(total_out + 1, dtype=I32)
        residuals = _run_tiers(
            n_items, n_heavy, lanes, unroll, init_for, step, apply_fn, pull_for, out0
        )
        residuals = residuals[:total_out]
    else:
        residuals = jnp.zeros(total_out, dtype=I32)
    return residuals, res_start


# ----------------------------------------------------------------------
# Stage 5: assembly + chain rounds (device)
# ----------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tot_int_arcs", "m", "total_ints", "total_res"))
def _stage5_extras(
    lefts, lens, int_count, residuals, residual_count, res_start, tot_int_arcs, m, total_ints, total_res
):
    """Merge interval expansion + residuals into per-node sorted extras."""
    n = int_count.shape[0]
    SINK = jnp.int32(2**30)
    node_ids = jnp.arange(n, dtype=I32)
    # buffers are sized by static maxima; when the actual totals are smaller
    # (padded SPMD shards), jnp.repeat clamps pads onto the LAST element --
    # mask them to a sink node so they never alias a real node's extras
    if total_ints > 0 and tot_int_arcs > 0:
        seg = jnp.repeat(jnp.arange(total_ints, dtype=I32), lens, total_repeat_length=tot_int_arcs)
        len_base = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(lens, dtype=I32)])
        within = jnp.arange(tot_int_arcs, dtype=I32) - len_base[seg]
        int_vals = lefts[seg] + within
        node_of_interval = jnp.repeat(node_ids, int_count, total_repeat_length=total_ints)
        iv = jnp.arange(tot_int_arcs, dtype=I32) < jnp.sum(lens)
        int_nodes = jnp.where(iv, node_of_interval[seg], SINK)
        int_vals = jnp.where(iv, int_vals, 0)
    else:
        int_vals = jnp.zeros(0, dtype=I32)
        int_nodes = jnp.zeros(0, dtype=I32)
    res_nodes = jnp.repeat(node_ids, residual_count, total_repeat_length=total_res)
    rv = jnp.arange(total_res, dtype=I32) < jnp.sum(residual_count)
    res_nodes = jnp.where(rv, res_nodes, SINK)
    extra_nodes = jnp.concatenate([int_nodes, res_nodes])
    extra_vals = jnp.concatenate([int_vals, jnp.where(rv, residuals, 0)])
    extra_nodes, extra_vals = jax.lax.sort((extra_nodes, extra_vals), num_keys=2)
    return extra_nodes, extra_vals


@jax.jit
def _chain_depth(ref):
    n = ref.shape[0]
    node_ids = jnp.arange(n, dtype=I32)
    # a parent BEFORE the node range (node-range sharding ghosts) resolves
    # nothing locally: treat as depth 0 (its copies are dropped anyway)
    has_ref = (ref > 0) & (node_ids - ref >= 0)
    parent = jnp.where(has_ref, node_ids - ref, 0)
    depth = jnp.where(has_ref, -1, 0)

    def cond(st):
        return jnp.any(st < 0)

    def body(st):
        pd = st[parent]
        return jnp.where((st < 0) & (pd >= 0), pd + 1, st)

    depth = jax.lax.while_loop(cond, body, depth)
    return depth, jnp.max(depth)


@functools.partial(jax.jit, static_argnames=("m", "total_blocks", "P", "E"))
def _stage6_prepare(d, ref, block_count, blocks_flat, block_start, extra_count, m, total_blocks, P, E):
    """Precompute the copy-arc machinery for the chain rounds:
    per copy-arc (node, parent CSR position, keep flag) and per-node
    target slots."""
    n = d.shape[0]
    node_ids = jnp.arange(n, dtype=I32)
    offsets = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(d, dtype=I32)])
    has_ref = ref > 0
    # node-range sharding: a ghost whose parent precedes the slice has no
    # parent data — give it ZERO copy slots (its copies are dropped; the
    # host plan in parallel/shard.py uses the same dp semantics), and clip
    # the gather so device indexing matches the host model
    parent_ok = has_ref & (node_ids - ref >= 0)
    parent = jnp.where(parent_ok, node_ids - ref, 0)
    dp = jnp.where(parent_ok, d[parent], 0)

    # flat copy-arc space: for each ref node, dp slots; pad slots (static
    # maxima > actual totals under SPMD sharding) are masked out of `keep`
    # and routed to a sink class by _stage6_schedule_padded via `seg_valid`
    seg_node = jnp.repeat(node_ids, dp, total_repeat_length=P)  # node of each slot
    seg_valid = jnp.arange(P, dtype=I32) < jnp.sum(dp)
    dp_base = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(dp, dtype=I32)])
    within = jnp.arange(P, dtype=I32) - dp_base[seg_node]
    parent_pos = offsets[parent[seg_node]] + within

    # keep mask by run parity: boundaries at cumulative block sums
    flags = jnp.zeros(P + 1, dtype=I32)
    if total_blocks > 0:
        b_node = jnp.repeat(node_ids, block_count, total_repeat_length=total_blocks)
        b_within = jnp.arange(total_blocks, dtype=I32) - block_start[b_node]
        # segmented cumsum of blocks within node
        cs_all = jnp.cumsum(blocks_flat, dtype=I32)
        seg_first = block_start[b_node]  # index of node's first block
        excl = jnp.where(seg_first > 0, cs_all[jnp.maximum(seg_first - 1, 0)], 0)
        b_cum = cs_all - excl
        bpos = dp_base[b_node] + b_cum
        valid = (b_cum < dp[b_node]) & (
            jnp.arange(total_blocks, dtype=I32) < jnp.sum(block_count))
        flags = flags.at[jnp.where(valid, bpos, P)].add(1, mode="drop")
    cs = jnp.cumsum(flags[:P], dtype=I32)
    seg_excl = cs[dp_base[seg_node]] - flags[dp_base[seg_node]]
    runs = cs - seg_excl
    keep = ((runs & 1) == 0) & seg_valid

    # rank of each KEPT slot within its node = its position in the merged
    # output among copies (merged with extras later by value sort per round)
    return offsets, seg_node, parent_pos, keep, seg_valid


def _counting_rank(keys, n_keys: int):
    """Stable counting-sort rank for small key universes (replaces argsort:
    chain depths take at most max_depth+1 values, so a few masked cumsums
    beat a full 32-bit sort by a wide margin on TPU)."""
    m = keys.shape[0]
    rank = jnp.zeros(m, I32)
    base = jnp.int32(0)
    for b in range(n_keys):
        is_b = keys == b
        cnt = jnp.cumsum(is_b.astype(I32))
        rank = jnp.where(is_b, base + cnt - 1, rank)
        base = base + cnt[-1] if m else base
    return rank


@functools.partial(jax.jit, static_argnames=("n_rounds",))
def _stage6_schedule(depth, seg_node, parent_pos, keep, extra_nodes, n_rounds):
    """Order copy-arcs and extras by the chain depth of their node so each
    round processes a contiguous slice (every arc is touched in exactly one
    round).  Returns the reordered arrays and the per-round histograms.
    Depth has at most n_rounds distinct values -> counting sort."""
    cd = depth[seg_node]
    P = seg_node.shape[0]
    c_rank = _counting_rank(cd, n_rounds)
    seg_node_r = jnp.zeros(P, I32).at[c_rank].set(seg_node, mode="drop", unique_indices=True)
    parent_pos_r = jnp.zeros(P, I32).at[c_rank].set(parent_pos, mode="drop", unique_indices=True)
    keep_r = jnp.zeros(P, bool).at[c_rank].set(keep, mode="drop", unique_indices=True)
    c_hist = jnp.bincount(cd, length=n_rounds)
    ed = depth[extra_nodes]
    E = extra_nodes.shape[0]
    e_rank = _counting_rank(ed, n_rounds)
    e_order = jnp.zeros(E, I32).at[e_rank].set(
        jnp.arange(E, dtype=I32), mode="drop", unique_indices=True
    )
    e_hist = jnp.bincount(ed, length=n_rounds)
    return seg_node_r, parent_pos_r, keep_r, e_order, c_hist, e_hist


def _counting_rank_within(keys, n_keys: int):
    """Stable rank of each element within its key class (counting pass)."""
    m = keys.shape[0]
    rank = jnp.zeros(m, I32)
    for b in range(n_keys):
        is_b = keys == b
        cnt = jnp.cumsum(is_b.astype(I32))
        rank = jnp.where(is_b, cnt - 1, rank)
    return rank


@functools.partial(jax.jit, static_argnames=("n_rounds", "c_ofs", "e_ofs"))
def _stage6_schedule_padded(depth, seg_node, parent_pos, keep, slot_valid,
                            extra_nodes, n_rounds, c_ofs, e_ofs):
    """SPMD variant of _stage6_schedule for node-range sharding: each
    round's entries land at STATIC common offsets (``c_ofs``/``e_ofs``,
    per-round maxima over shards), padded with sink entries, so one program
    serves every shard under shard_map.

    Pad slots (``~slot_valid`` copy slots; ``extra_nodes >= n`` sink
    extras) must NOT consume ranks inside a real depth class — the static
    buffers clamp them onto the last real node, which would overflow the
    per-round regions and overwrite real entries.  They are routed to a
    dedicated sink class whose positions start at the end of the padded
    buffer, so ``mode="drop"`` discards them with unique indices."""
    SINK = jnp.int32(2**30)
    n = depth.shape[0]
    P = seg_node.shape[0]
    E = extra_nodes.shape[0]
    P_pad = int(c_ofs[-1])
    E_pad = int(e_ofs[-1])
    c_base = jnp.asarray(np.asarray(c_ofs[:-1], dtype=np.int32))
    e_base = jnp.asarray(np.asarray(e_ofs[:-1], dtype=np.int32))
    c_pad = ~slot_valid
    cd = jnp.where(c_pad, n_rounds, depth[jnp.clip(seg_node, 0, n - 1)])
    cpos_real = c_base[jnp.minimum(cd, n_rounds - 1)] + _counting_rank_within(
        cd, n_rounds)
    cpos = jnp.where(c_pad, P_pad + jnp.arange(P, dtype=I32), cpos_real)
    seg_node_r = jnp.full(P_pad, SINK, I32).at[cpos].set(
        seg_node, mode="drop", unique_indices=True)
    parent_pos_r = jnp.zeros(P_pad, I32).at[cpos].set(
        parent_pos, mode="drop", unique_indices=True)
    keep_r = jnp.zeros(P_pad, bool).at[cpos].set(
        keep, mode="drop", unique_indices=True)
    e_pad = extra_nodes >= n
    ed = jnp.where(e_pad, n_rounds, depth[jnp.clip(extra_nodes, 0, n - 1)])
    epos_real = e_base[jnp.minimum(ed, n_rounds - 1)] + _counting_rank_within(
        ed, n_rounds)
    epos = jnp.where(e_pad, E_pad + jnp.arange(E, dtype=I32), epos_real)
    e_order = jnp.full(E_pad, E, I32).at[epos].set(
        jnp.arange(E, dtype=I32), mode="drop", unique_indices=True)
    return seg_node_r, parent_pos_r, keep_r, e_order


def _group_first(sorted_keys):
    """Index of the first occurrence of each element's key in a sorted key
    array — dense boundary+cummax instead of a gather-heavy searchsorted."""
    k = sorted_keys.shape[0]
    idx = jnp.arange(k, dtype=I32)
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), sorted_keys[1:] != sorted_keys[:-1]]
    ) if k else jnp.ones(0, bool)
    return jax.lax.cummax(jnp.where(boundary, idx, 0))


@jax.jit
def _round0_commit(out, extra_slice_nodes, extra_slice_vals, offsets):
    """Round 0: depth-0 nodes' lists are exactly their extras (already
    sorted by (node, value)); scatter straight into the CSR slots."""
    m = out.shape[0] - 1
    k = extra_slice_nodes.shape[0]
    ranks = jnp.arange(k, dtype=I32)
    grp_first = _group_first(extra_slice_nodes)
    tgt = offsets[extra_slice_nodes] + (ranks - grp_first)
    return out.at[tgt].set(extra_slice_vals, mode="drop", unique_indices=True)


@jax.jit
def _roundt_commit(out, c_nodes, c_parent_pos, c_keep, e_nodes, e_vals, offsets):
    """Round t>0: gather parent values for this round's copy-arcs, mask,
    merge with this round's extras by two-key sort, scatter."""
    m = out.shape[0] - 1
    kept_vals = out[c_parent_pos]
    copy_nodes = jnp.where(c_keep, c_nodes, jnp.int32(2**30))
    all_nodes = jnp.concatenate([copy_nodes, e_nodes])
    all_vals = jnp.concatenate([kept_vals, e_vals])
    all_nodes, all_vals = jax.lax.sort((all_nodes, all_vals), num_keys=2)
    is_real = all_nodes < jnp.int32(2**30)
    ranks = jnp.arange(all_nodes.shape[0], dtype=I32)
    grp_first = _group_first(all_nodes)
    within = ranks - grp_first
    nmax = offsets.shape[0] - 1
    tgt = jnp.where(is_real, offsets[jnp.minimum(all_nodes, nmax - 1)] + within, out.shape[0])
    return out.at[tgt].set(all_vals, mode="drop", unique_indices=True)


# ----------------------------------------------------------------------
# Orchestration
# ----------------------------------------------------------------------


def make_decode_fn(settings, sizes: dict, n: int, lanes: int = DEFAULT_LANES):
    """Build a single jittable end-to-end decode function for a graph whose
    static buffer sizes are known (from a prior :func:`decode_to_csr`).

    Returns ``fn(words, bit_offsets) -> (csr_offsets, successors)`` — one
    XLA program, no host synchronization inside.
    """
    s = settings
    skey = (
        s.outdegree_coding,
        s.reference_coding,
        s.block_count_coding,
        s.block_coding,
        s.residual_coding,
        s.zeta_k,
        s.window_size,
        s.min_interval_length,
    )

    def fn(words, bit_offsets, pre_d=None):
        d, ref, block_count, pos, _, _ = _stage1(words, bit_offsets[:n], skey)
        (blocks_flat, block_start, pos, copied, extra_count, int_count, _) = _stage2_blocks(
            words, pos, block_count, d, ref, skey, lanes, sizes["total_blocks"],
            n_items=sizes["n_items_blocks"], n_heavy=sizes.get("n_heavy_blocks", 0),
            pre_d=pre_d,
        )
        lefts, lens, int_start, pos, residual_count, _, _ = _stage3_intervals(
            words, pos, int_count, extra_count, skey, lanes, sizes["total_ints"],
            n_items=sizes["n_items_ints"], n_heavy=sizes.get("n_heavy_ints", 0),
        )
        residuals, res_start = _stage4_residuals(
            words, pos, residual_count, skey, lanes, sizes["total_res"],
            n_items=sizes["n_items_res"], n_heavy=sizes.get("n_heavy_res", 0),
        )
        extra_nodes, extra_vals = _stage5_extras(
            lefts, lens, int_count, residuals, residual_count, res_start,
            sizes["tot_int_arcs"], sizes["m"], sizes["total_ints"], sizes["total_res"],
        )
        depth, _ = _chain_depth(ref)
        offsets, seg_node, parent_pos, keep, _ = _stage6_prepare(
            d, ref, block_count, blocks_flat, block_start, extra_count,
            sizes["m"], sizes["total_blocks"], sizes["P"], 0,
        )
        n_rounds = sizes["max_depth"] + 1
        seg_node_r, parent_pos_r, keep_r, e_order, _, _ = _stage6_schedule(
            depth, seg_node, parent_pos, keep, extra_nodes, n_rounds
        )
        e_nodes_r = extra_nodes[e_order]
        e_vals_r = extra_vals[e_order]
        c_ofs = np.concatenate([[0], np.cumsum(sizes["c_hist"])]).astype(int)
        e_ofs = np.concatenate([[0], np.cumsum(sizes["e_hist"])]).astype(int)
        out = jnp.zeros(sizes["m"] + 1, dtype=I32)
        out = _round0_commit(out, e_nodes_r[: e_ofs[1]], e_vals_r[: e_ofs[1]], offsets)
        for t in range(1, n_rounds):
            out = _roundt_commit(
                out,
                seg_node_r[c_ofs[t] : c_ofs[t + 1]],
                parent_pos_r[c_ofs[t] : c_ofs[t + 1]],
                keep_r[c_ofs[t] : c_ofs[t + 1]],
                e_nodes_r[e_ofs[t] : e_ofs[t + 1]],
                e_vals_r[e_ofs[t] : e_ofs[t + 1]],
                offsets,
            )
        return offsets, out[: sizes["m"]]

    return jax.jit(fn)


def make_shard_decode_fn(settings, sizes: dict, n: int, c_ofs, e_ofs,
                         lanes: int = DEFAULT_LANES):
    """Jittable decode of one NODE-RANGE SHARD of a BVGraph (SPMD body for
    shard_map; reference analog: window priming at BVGraphNodeIterator(from),
    BVGraph.java:1173-1183, and the per-thread splitNodeIterators ranges).

    The shard decodes its slice with LOCAL node ids; since every in-record
    anchor is relative to the node id, the decoded successors come out
    uniformly shifted by -node_base and are re-shifted at the end.  ``pre_d``
    carries the outdegrees of the window_size nodes preceding the slice so
    implicit tails crossing the boundary resolve exactly; ghost records
    whose ancestors precede the slice decode structurally but their copies
    are dropped (see _stage6_prepare) -- callers include a ghost margin of
    window_size * max_chain_depth nodes so all REAL nodes decode exactly.

    ``sizes``/``c_ofs``/``e_ofs`` are per-field maxima over shards so one
    compiled program serves all of them."""
    s = settings
    skey = (
        s.outdegree_coding,
        s.reference_coding,
        s.block_count_coding,
        s.block_coding,
        s.residual_coding,
        s.zeta_k,
        s.window_size,
        s.min_interval_length,
    )
    n_rounds = sizes["max_depth"] + 1
    c_ofs = tuple(int(x) for x in c_ofs)
    e_ofs = tuple(int(x) for x in e_ofs)

    def fn(words, bit_offsets, pre_d, node_base):
        d, ref, block_count, pos, _, _ = _stage1(words, bit_offsets[:n], skey)
        (blocks_flat, block_start, pos, copied, extra_count, int_count, _) = _stage2_blocks(
            words, pos, block_count, d, ref, skey, lanes, sizes["total_blocks"],
            n_items=sizes["n_items_blocks"], n_heavy=sizes.get("n_heavy_blocks", 0),
            pre_d=pre_d,
        )
        lefts, lens, int_start, pos, residual_count, _, _ = _stage3_intervals(
            words, pos, int_count, extra_count, skey, lanes, sizes["total_ints"],
            n_items=sizes["n_items_ints"], n_heavy=sizes.get("n_heavy_ints", 0),
        )
        residuals, res_start = _stage4_residuals(
            words, pos, residual_count, skey, lanes, sizes["total_res"],
            n_items=sizes["n_items_res"], n_heavy=sizes.get("n_heavy_res", 0),
        )
        extra_nodes, extra_vals = _stage5_extras(
            lefts, lens, int_count, residuals, residual_count, res_start,
            sizes["tot_int_arcs"], sizes["m"], sizes["total_ints"], sizes["total_res"],
        )
        depth, _ = _chain_depth(ref)
        offsets, seg_node, parent_pos, keep, seg_valid = _stage6_prepare(
            d, ref, block_count, blocks_flat, block_start, extra_count,
            sizes["m"], sizes["total_blocks"], sizes["P"], 0,
        )
        seg_node_r, parent_pos_r, keep_r, e_order = _stage6_schedule_padded(
            depth, seg_node, parent_pos, keep, seg_valid, extra_nodes,
            n_rounds, c_ofs, e_ofs,
        )
        E = extra_nodes.shape[0]
        ev = e_order < E
        eo = jnp.minimum(e_order, E - 1)
        e_nodes_r = jnp.where(ev, extra_nodes[eo], jnp.int32(2**30))
        e_vals_r = jnp.where(ev, extra_vals[eo], 0)
        out = jnp.zeros(sizes["m"] + 1, dtype=I32)
        out = _round0_commit(out, e_nodes_r[: e_ofs[1]], e_vals_r[: e_ofs[1]], offsets)
        for t in range(1, n_rounds):
            out = _roundt_commit(
                out,
                seg_node_r[c_ofs[t] : c_ofs[t + 1]],
                parent_pos_r[c_ofs[t] : c_ofs[t + 1]],
                keep_r[c_ofs[t] : c_ofs[t + 1]],
                e_nodes_r[e_ofs[t] : e_ofs[t + 1]],
                e_vals_r[e_ofs[t] : e_ofs[t + 1]],
                offsets,
            )
        # local ids shift every anchored value by -node_base: undo uniformly
        return offsets, out[: sizes["m"]] + node_base

    return fn


def decode_to_csr(dg: DeviceGraph, lanes: int = DEFAULT_LANES, sizes: dict | None = None):
    """Full device decode; returns (offsets[int32 n+1], successors[int32 m])
    as DEVICE arrays (pulling them to the host is the caller's choice).

    ``sizes`` — optional dict of the static buffer sizes (from a previous
    :func:`decode_sizes` call on the same graph) so the steady-state decode
    performs no device->host synchronization at all.
    """
    s = dg.settings
    skey = dg.settings_key()
    n = dg.n
    words = dg.words

    d, ref, block_count, pos, total_blocks_dev, m_dev = _stage1(words, dg.bit_offsets[:n], skey)
    sizes = dict(sizes) if sizes else {}
    total_blocks = sizes.get("total_blocks") or int(total_blocks_dev)
    m = sizes.get("m") or int(m_dev)
    nb = sizes.get("n_items_blocks")
    if nb is None:
        nb = int(jnp.sum((block_count > 0).astype(I32)))
    if "n_heavy_blocks" not in sizes:
        sizes["n_heavy_blocks"] = int(jnp.sum((block_count > 64).astype(I32)))

    (blocks_flat, block_start, pos, copied, extra_count, int_count, total_ints_dev) = _stage2_blocks(
        words, pos, block_count, d, ref, skey, lanes, total_blocks, n_items=nb,
        n_heavy=sizes.get("n_heavy_blocks", 0),
    )
    total_ints = sizes.get("total_ints")
    if total_ints is None:
        total_ints = int(total_ints_dev)
    ni = sizes.get("n_items_ints")
    if ni is None:
        ni = int(jnp.sum((int_count > 0).astype(I32)))
    if "n_heavy_ints" not in sizes:
        sizes["n_heavy_ints"] = int(jnp.sum((int_count > 64).astype(I32)))

    lefts, lens, int_start, pos, residual_count, total_res_dev, tot_int_arcs_dev = _stage3_intervals(
        words, pos, int_count, extra_count, skey, lanes, total_ints, n_items=ni,
        n_heavy=sizes.get("n_heavy_ints", 0),
    )
    total_res = sizes.get("total_res")
    if total_res is None:
        total_res = int(total_res_dev)
    tot_int_arcs = sizes.get("tot_int_arcs")
    if tot_int_arcs is None:
        tot_int_arcs = int(tot_int_arcs_dev)
    nr = sizes.get("n_items_res")
    if nr is None:
        nr = int(jnp.sum((residual_count > 0).astype(I32)))
    if "n_heavy_res" not in sizes:
        sizes["n_heavy_res"] = int(jnp.sum((residual_count > 64).astype(I32)))

    residuals, res_start = _stage4_residuals(
        words, pos, residual_count, skey, lanes, total_res, n_items=nr,
        n_heavy=sizes.get("n_heavy_res", 0),
    )

    extra_nodes, extra_vals = _stage5_extras(
        lefts, lens, int_count, residuals, residual_count, res_start, tot_int_arcs, m, total_ints, total_res
    )

    depth, max_depth_dev = _chain_depth(ref)
    max_depth = sizes.get("max_depth")
    if max_depth is None:
        max_depth = int(max_depth_dev)

    P = sizes.get("P")
    if P is None:
        P = int(jnp.sum(jnp.where(ref > 0, d[jnp.maximum(jnp.arange(n, dtype=I32) - ref, 0)], 0)))

    offsets, seg_node, parent_pos, keep, _ = _stage6_prepare(
        d, ref, block_count, blocks_flat, block_start, extra_count, m, total_blocks, P, 0
    )
    n_rounds = max_depth + 1
    seg_node_r, parent_pos_r, keep_r, e_order, c_hist_dev, e_hist_dev = _stage6_schedule(
        depth, seg_node, parent_pos, keep, extra_nodes, n_rounds
    )
    c_hist = sizes.get("c_hist")
    if c_hist is None:
        c_hist = tuple(int(x) for x in np.asarray(c_hist_dev))
    e_hist = sizes.get("e_hist")
    if e_hist is None:
        e_hist = tuple(int(x) for x in np.asarray(e_hist_dev))
    e_nodes_r = extra_nodes[e_order]
    e_vals_r = extra_vals[e_order]

    out = jnp.zeros(m + 1, dtype=I32)
    c_ofs = np.concatenate([[0], np.cumsum(c_hist)]).astype(int)
    e_ofs = np.concatenate([[0], np.cumsum(e_hist)]).astype(int)
    out = _round0_commit(out, e_nodes_r[: e_ofs[1]], e_vals_r[: e_ofs[1]], offsets)
    for t in range(1, n_rounds):
        out = _roundt_commit(
            out,
            seg_node_r[c_ofs[t] : c_ofs[t + 1]],
            parent_pos_r[c_ofs[t] : c_ofs[t + 1]],
            keep_r[c_ofs[t] : c_ofs[t + 1]],
            e_nodes_r[e_ofs[t] : e_ofs[t + 1]],
            e_vals_r[e_ofs[t] : e_ofs[t + 1]],
            offsets,
        )

    return offsets, out[:m], {
        "c_hist": c_hist,
        "e_hist": e_hist,
        "total_blocks": total_blocks,
        "m": m,
        "total_ints": total_ints,
        "total_res": total_res,
        "tot_int_arcs": tot_int_arcs,
        "max_depth": max_depth,
        "P": P,
        "n_items_blocks": nb,
        "n_items_ints": ni,
        "n_items_res": nr,
        "n_heavy_blocks": sizes.get("n_heavy_blocks", 0),
        "n_heavy_ints": sizes.get("n_heavy_ints", 0),
        "n_heavy_res": sizes.get("n_heavy_res", 0),
    }
