#!/usr/bin/env python
"""Per-stage TPU timing of the device decode pipeline on cnr-2000.

axon executes asynchronously (block_until_ready lies), so each stage is
timed by fetching a salted in-program scalar reduction of its outputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from webgraph_tpu.bits import jcodes as J
from webgraph_tpu.bits.bitstream import words_to_bytes
from webgraph_tpu.formats import bvgraph_jax, bvgraph_np
from webgraph_tpu.formats.bvgraph import BVGraph

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"


def fetch(x):
    return int(jnp.sum(x.astype(jnp.uint32), dtype=jnp.uint32))


def timeit(name, fn, *args, reps=3):
    # warmup/compile
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    s = fetch(leaves[0])
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        _ = fetch(leaves[0] + jnp.asarray(r + 1, leaves[0].dtype))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.1f} ms")
    return out, best


def main():
    bv = BVGraph.load(CNR)
    sizes = bvgraph_np.compute_sizes(bv)
    print("sizes:", sizes)
    n = bv.num_nodes()
    s = bv.settings
    skey = (
        s.outdegree_coding, s.reference_coding, s.block_count_coding,
        s.block_coding, s.residual_coding, s.zeta_k, s.window_size,
        s.min_interval_length,
    )
    lanes = bvgraph_jax.DEFAULT_LANES

    data = words_to_bytes(np.asarray(bv._words), bv._bit_length)
    words = jnp.asarray(J.words_from_bytes(data))
    bit_offsets = jnp.asarray(bv.bit_offsets.astype(np.int32))

    # overhead
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(5):
        int(triv(jnp.uint32(i)))
    print(f"dispatch+fetch overhead      {(time.perf_counter()-t0)/5*1e3:9.1f} ms")

    st1 = jax.jit(lambda w, p: bvgraph_jax._stage1(w, p, skey))
    (d, ref, block_count, pos1, _, _), t1 = timeit("stage1 structure", st1, words, bit_offsets[:n])

    st2 = jax.jit(lambda w, p, bc, dd, rr: bvgraph_jax._stage2_blocks(
        w, p, bc, dd, rr, skey, lanes, sizes["total_blocks"], n_items=sizes["n_items_blocks"]))
    (blocks_flat, block_start, pos2, copied, extra_count, int_count, _), t2 = timeit(
        "stage2 blocks", st2, words, pos1, block_count, d, ref)

    st3 = jax.jit(lambda w, p, ic, ec: bvgraph_jax._stage3_intervals(
        w, p, ic, ec, skey, lanes, sizes["total_ints"], n_items=sizes["n_items_ints"]))
    (lefts, lens, int_start, pos3, residual_count, _, _), t3 = timeit(
        "stage3 intervals", st3, words, pos2, int_count, extra_count)

    st4 = jax.jit(lambda w, p, rc: bvgraph_jax._stage4_residuals(
        w, p, rc, skey, lanes, sizes["total_res"], n_items=sizes["n_items_res"]))
    (residuals, res_start), t4 = timeit("stage4 residuals", st4, words, pos3, residual_count)

    st5 = jax.jit(lambda a, b, c, dd, e, f: bvgraph_jax._stage5_extras(
        a, b, c, dd, e, f, sizes["tot_int_arcs"], sizes["m"], sizes["total_ints"], sizes["total_res"]))
    (extra_nodes, extra_vals), t5 = timeit(
        "stage5 extras sort", st5, lefts, lens, int_count, residuals, residual_count, res_start)

    (depth, _), tcd = timeit("chain depth", jax.jit(bvgraph_jax._chain_depth), ref)

    st6p = jax.jit(lambda dd, rr, bc, bf, bs, ec: bvgraph_jax._stage6_prepare(
        dd, rr, bc, bf, bs, ec, sizes["m"], sizes["total_blocks"], sizes["P"], 0))
    (offsets, seg_node, parent_pos, keep), t6p = timeit(
        "stage6 prepare", st6p, d, ref, block_count, blocks_flat, block_start, extra_count)

    n_rounds = sizes["max_depth"] + 1
    st6s = jax.jit(lambda dp, sn, pp, kp, en: bvgraph_jax._stage6_schedule(
        dp, sn, pp, kp, en, n_rounds))
    (seg_node_r, parent_pos_r, keep_r, e_order, _, _), t6s = timeit(
        "stage6 schedule", st6s, depth, seg_node, parent_pos, keep, extra_nodes)

    e_nodes_r = extra_nodes[e_order]
    e_vals_r = extra_vals[e_order]
    c_ofs = np.concatenate([[0], np.cumsum(sizes["c_hist"])]).astype(int)
    e_ofs = np.concatenate([[0], np.cumsum(sizes["e_hist"])]).astype(int)
    print("rounds:", n_rounds, "c_hist:", sizes["c_hist"], "e_hist:", sizes["e_hist"])

    out = jnp.zeros(sizes["m"] + 1, dtype=jnp.int32)
    (out, tr0) = timeit("round0 commit", jax.jit(bvgraph_jax._round0_commit),
                        out, e_nodes_r[: e_ofs[1]], e_vals_r[: e_ofs[1]], offsets)
    tot_rounds = 0.0
    for t in range(1, n_rounds):
        rc = jax.jit(bvgraph_jax._roundt_commit)
        out, trt = timeit(f"round{t} commit (c={c_ofs[t+1]-c_ofs[t]},e={e_ofs[t+1]-e_ofs[t]})",
                          rc, out,
                          seg_node_r[c_ofs[t]: c_ofs[t + 1]],
                          parent_pos_r[c_ofs[t]: c_ofs[t + 1]],
                          keep_r[c_ofs[t]: c_ofs[t + 1]],
                          e_nodes_r[e_ofs[t]: e_ofs[t + 1]],
                          e_vals_r[e_ofs[t]: e_ofs[t + 1]],
                          offsets)
        tot_rounds += trt

    total = t1 + t2 + t3 + t4 + t5 + tcd + t6p + t6s + tr0 + tot_rounds
    print(f"{'TOTAL (sum of stages)':28s} {total*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
