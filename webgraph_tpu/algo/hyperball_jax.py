"""HyperBall on device (JAX/XLA): the gather/segment-max formulation.

The reference's hot loop — per node, per successor, broadword register max
(HyperBall.java:907-914) with arc-balanced thread chunks — becomes exactly
two primitives on TPU: a row gather of successors' registers and a
``segment_max`` by source node, both full-width VPU work. The systolic
sparsification (:981-991) is a mask over rows.

Multi-chip: registers are sharded by node range over a mesh axis; each
iteration all-gathers the (small, uint8) register block of the frontier —
see :func:`make_sharded_step`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from webgraph_tpu.algo.hll import HyperLogLogCounterArray, estimate_rows
from webgraph_tpu.graph.csr import CSRGraph


@functools.partial(jax.jit, static_argnames=("n",))
def hyperball_step(regs, arc_src, arc_dst, n):
    """One HyperBall iteration: regs'[x] = max(regs[x], max_{y in succ(x)}
    regs[y]), arcs given as (src, dst) arrays."""
    gathered = regs[arc_dst]
    red = jax.ops.segment_max(gathered, arc_src, num_segments=n)
    new = jnp.maximum(regs, red)
    changed = jnp.any(new != regs, axis=1)
    return new, changed


class HyperBallJax:
    """Device-resident HyperBall; mirrors the host :class:`HyperBall` API
    and produces bit-identical registers (same init, same max schedule)."""

    def __init__(self, graph, log2m: int = 6, seed: int = 0):
        g = CSRGraph.from_graph(graph)
        self.n = g.num_nodes()
        self.log2m = log2m
        offsets, succ = g.to_csr()
        self.arc_src = jnp.asarray(
            np.repeat(np.arange(self.n, dtype=np.int32), np.diff(offsets))
        )
        self.arc_dst = jnp.asarray(succ.astype(np.int32))
        host = HyperLogLogCounterArray(self.n, log2m, seed)
        self.alpha_mm = host.alpha_mm
        self.registers = jnp.asarray(host.registers)
        self.neighbourhood_function = [float(jnp.sum(estimate_rows(self.registers, self.alpha_mm, 1 << log2m)))]
        self.iteration = 0
        self.modified = jnp.ones(self.n, dtype=bool)

    def iterate(self) -> None:
        self.registers, self.modified = hyperball_step(
            self.registers, self.arc_src, self.arc_dst, self.n
        )
        self.iteration += 1
        self.neighbourhood_function.append(
            float(jnp.sum(estimate_rows(self.registers, self.alpha_mm, 1 << self.log2m)))
        )

    def modified_counters(self) -> int:
        return int(jnp.sum(self.modified))

    def run(self, upper_bound: int = 2**31 - 1) -> list[float]:
        for _ in range(min(upper_bound, self.n)):
            self.iterate()
            if self.modified_counters() == 0:
                break
        return self.neighbourhood_function


def make_sharded_step(mesh, n_per_shard: int, n_total: int):
    """Build a shard_map'ped HyperBall step over ``mesh`` axis "nodes":
    registers sharded by node range; each device owns its arcs (sources in
    its range) and all-gathers the full register array for the destination
    gather, then reduces locally. Returns
    ``step(regs_sharded, arc_src_local, arc_dst_local) -> regs_sharded``.

    (For pod-scale graphs the all-gather is replaced by a halo exchange of
    only the remotely-referenced rows; at dryrun sizes the full gather keeps
    the program simple and still exercises the collective.)"""
    from jax.sharding import PartitionSpec as P

    def step(regs_blk, src_blk, dst_blk):
        # regs_blk: (n_per_shard, m); arcs local with global dst ids
        full = jax.lax.all_gather(regs_blk, axis_name="nodes", tiled=True)  # (n_total, m)
        gathered = full[dst_blk[0]]
        red = jax.ops.segment_max(gathered, src_blk[0], num_segments=n_per_shard)
        return jnp.maximum(regs_blk, red)

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P("nodes", None), P("nodes", None), P("nodes", None)),
            out_specs=P("nodes", None),
            check_vma=False,
        )
    )
