"""HyperBall on device (JAX/XLA): the gather/segment-max formulation.

The reference's hot loop — per node, per successor, broadword register max
(HyperBall.java:907-914) with arc-balanced thread chunks — becomes exactly
two primitives on TPU: a row gather of successors' registers and a
``segment_max`` by source node, both full-width VPU work.

Parity with the host :class:`webgraph_tpu.algo.hyperball.HyperBall`
(reference HyperBall.java:222):

* register evolution is bit-identical (same init, same max schedule);
* per-iteration centrality accumulators — sum of distances (closeness),
  sum of inverse distances (harmonic), arbitrary discount functions
  (HyperBall.java:949-968) — and node weights (:259);
* systolic sparsification (:981-991): when few counters changed, arcs
  whose destination did not change are masked out of the reduction (their
  contribution is provably absorbed by the ``maximum`` with the previous
  registers), mirroring the reference's must-scan set;
* multi-chip: registers sharded by node range over a mesh axis with a
  static HALO EXCHANGE — each device receives only the register rows its
  arcs reference remotely (traffic ∝ cut size), not a full all-gather —
  see :func:`plan_halo` / :func:`make_sharded_step`.
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


@functools.partial(jax.jit, static_argnames=("n",))
def hyperball_step_systolic(regs, arc_src, arc_dst, modified, n):
    """Systolic variant: only arcs whose DESTINATION counter changed last
    iteration can change a source counter (HyperBall.java:981-991); all
    other arcs are routed to a sink segment.  Produces exactly the same
    registers as the dense step."""
    live = modified[arc_dst]
    src = jnp.where(live, arc_src, n)
    gathered = regs[arc_dst]
    red = jax.ops.segment_max(gathered, src, num_segments=n + 1)[:n]
    new = jnp.maximum(regs, red)
    changed = jnp.any(new != regs, axis=1)
    return new, changed


class HyperBallJax:
    """Device-resident HyperBall; mirrors the host :class:`HyperBall` API
    and produces bit-identical registers (same init, same max schedule).

    ``transpose`` enables systolic masking (the reference needs it for the
    must-scan set; here the mask is by destination, so any graph works —
    the flag simply gates the mode like the reference's gt == null check).
    """

    def __init__(self, graph, transpose=None, log2m: int = 6, seed: int = 0,
                 weights=None, do_sum_of_distances: bool = False,
                 do_sum_of_inverse_distances: bool = False,
                 discount_functions=None, systolic_threshold: float = 0.25):
        g = CSRGraph.from_graph(graph)
        self.n = g.num_nodes()
        self.log2m = log2m
        self.seed = seed
        offsets, succ = g.to_csr()
        self.arc_src = jnp.asarray(
            np.repeat(np.arange(self.n, dtype=np.int32), np.diff(offsets))
        )
        self.arc_dst = jnp.asarray(succ.astype(np.int32))
        self.systolic = transpose is not None
        self.systolic_threshold = systolic_threshold
        self.discount_functions = list(discount_functions or [])
        # device accumulators run in float32 (JAX default); the host
        # HyperBall accumulates in float64, so weighted NF/centrality parity
        # with the host path holds to f32 precision only (registers are
        # still bit-identical — see tests/test_hyperball_jax.py)
        self.weights = (jnp.asarray(np.asarray(weights, dtype=np.float32))
                        if weights is not None else jnp.ones(self.n))
        self.do_sum_of_distances = do_sum_of_distances
        self.do_sum_of_inverse_distances = do_sum_of_inverse_distances
        host = HyperLogLogCounterArray(self.n, log2m, seed)
        self.alpha_mm = host.alpha_mm
        self.registers = jnp.asarray(host.registers)
        self._current = estimate_rows(self.registers, self.alpha_mm, 1 << log2m)
        self.neighbourhood_function = [float(jnp.sum(self._current * self.weights))]
        self.iteration = 0
        self.modified = jnp.ones(self.n, dtype=bool)
        self.last_systolic = False
        zeros = jnp.zeros(self.n, dtype=self._current.dtype)
        self.sum_of_distances = zeros if do_sum_of_distances else None
        self.sum_of_inverse_distances = zeros if do_sum_of_inverse_distances else None
        self.discounted_centralities = [zeros for _ in self.discount_functions]

    def iterate(self) -> None:
        frac = float(jnp.sum(self.modified)) / max(self.n, 1)
        if self.systolic and frac < self.systolic_threshold:
            self.last_systolic = True
            self.registers, self.modified = hyperball_step_systolic(
                self.registers, self.arc_src, self.arc_dst, self.modified,
                self.n)
        else:
            self.last_systolic = False
            self.registers, self.modified = hyperball_step(
                self.registers, self.arc_src, self.arc_dst, self.n
            )
        self.iteration += 1
        t = self.iteration
        new_counts = estimate_rows(self.registers, self.alpha_mm, 1 << self.log2m)
        inc = new_counts - self._current
        if self.sum_of_distances is not None:
            self.sum_of_distances = self.sum_of_distances + t * inc
        if self.sum_of_inverse_distances is not None:
            self.sum_of_inverse_distances = self.sum_of_inverse_distances + inc / t
        self.discounted_centralities = [
            acc + fn(t) * inc
            for fn, acc in zip(self.discount_functions, self.discounted_centralities)
        ]
        self._current = new_counts
        self.neighbourhood_function.append(
            float(jnp.sum(new_counts * self.weights)))

    def modified_counters(self) -> int:
        return int(jnp.sum(self.modified))

    def run(self, upper_bound: int = 2**31 - 1, threshold: float = -1.0) -> list[float]:
        for _ in range(min(upper_bound, self.n)):
            self.iterate()
            if self.modified_counters() == 0:
                break
            if threshold >= 0 and len(self.neighbourhood_function) >= 2:
                prev, curr = self.neighbourhood_function[-2:]
                if prev != 0 and (curr - prev) / prev < threshold:
                    break
        return self.neighbourhood_function

    # -- derived outputs (HyperBall.java:271-279) -----------------------

    def closeness_centrality(self):
        if self.sum_of_distances is None:
            raise RuntimeError("run with do_sum_of_distances=True")
        s = np.asarray(self.sum_of_distances)
        with np.errstate(divide="ignore"):
            c = 1.0 / s
        c[~np.isfinite(c)] = 0.0
        return c

    def harmonic_centrality(self):
        if self.sum_of_inverse_distances is None:
            raise RuntimeError("run with do_sum_of_inverse_distances=True")
        return np.asarray(self.sum_of_inverse_distances).copy()

    def reachable_nodes(self):
        return np.asarray(self._current).copy()


# ----------------------------------------------------------------------
# Sharded step: node-range sharding + static halo exchange
# ----------------------------------------------------------------------


class HaloPlan:
    """Static exchange plan for node-range-sharded HyperBall.

    Shard s owns register rows [s*B, (s+1)*B).  For every ordered pair
    (receiver r, shift k), ``send_ids[k][s]`` lists (locally-indexed, padded
    with -1) the rows shard s must send to shard (s+k) mod S at ring step k;
    the receiver scatters them into its ghost table at fixed positions, so
    ``arc_dst`` can be remapped once to local+ghost indices.  Total traffic
    is Σ_s |remote rows referenced by shard s| = the register cut."""

    def __init__(self, n: int, num_shards: int, arc_src, arc_dst):
        S = num_shards
        B = (n + S - 1) // S
        self.n, self.S, self.B = n, S, B
        src_shard = np.asarray(arc_src) // B
        dst = np.asarray(arc_dst)
        dst_shard = dst // B
        # ghost rows per shard, grouped by owner shard
        ghosts = [[] for _ in range(S)]     # receiver -> sorted remote ids
        for s in range(S):
            remote = np.unique(dst[(src_shard == s) & (dst_shard != s)])
            ghosts[s] = remote
        G = max((len(g) for g in ghosts), default=0)
        G = max(G, 1)
        self.G = G
        self.cut = int(sum(len(g) for g in ghosts))
        # receiver-side ghost table positions: ghosts[s] sorted; map id->pos
        self.ghost_ids = np.full((S, G), -1, dtype=np.int64)
        for s in range(S):
            self.ghost_ids[s, : len(ghosts[s])] = ghosts[s]
        # ring-step send lists: at step k, shard s sends to (s+k) % S the
        # rows (s+k)%S needs from s, placed at the receiver's ghost positions
        self.send_local = np.zeros((S - 1, S, G), dtype=np.int32)  # local row ids
        self.send_mask = np.zeros((S - 1, S, G), dtype=bool)
        self.recv_pos = np.zeros((S - 1, S, G), dtype=np.int32)    # ghost slots
        for k in range(1, S):
            for s in range(S):
                r = (s + k) % S
                need = ghosts[r]
                owner = need // B
                sel = np.flatnonzero(owner == s)
                self.send_local[k - 1, s, : len(sel)] = (need[sel] - s * B).astype(np.int32)
                self.send_mask[k - 1, s, : len(sel)] = True
                self.recv_pos[k - 1, s, : len(sel)] = sel.astype(np.int32)
        # arc remap: per shard, dst -> local index (own rows [0,B), ghosts B+pos)
        self.arc_remap = {}
        for s in range(S):
            sel = np.flatnonzero(src_shard == s)
            d = dst[sel]
            local = d - s * B
            gpos = np.searchsorted(self.ghost_ids[s, : max(len(ghosts[s]), 1)], d)
            gpos = np.clip(gpos, 0, G - 1)
            is_own = (d // B) == s
            self.arc_remap[s] = np.where(is_own, local, B + gpos).astype(np.int32)


def plan_halo(n: int, num_shards: int, arc_src, arc_dst) -> HaloPlan:
    return HaloPlan(n, num_shards, arc_src, arc_dst)


def make_sharded_step(mesh, n_per_shard: int, n_total: int, plan: HaloPlan | None = None):
    """Build a shard_map'ped HyperBall step over ``mesh`` axis "nodes":
    registers sharded by node range.

    Without a :class:`HaloPlan` the destination gather all-gathers the full
    register array (tiny-graph dry runs).  With a plan, each ring step
    ``ppermute``s only the (padded) requested rows — traffic ∝ cut size —
    and arcs must be pre-remapped with ``plan.arc_remap``.
    Returns ``step(regs_sharded, arc_src_local, arc_dst_local) ->
    regs_sharded``."""
    from jax.sharding import PartitionSpec as P

    S = mesh.devices.size

    if plan is None:
        def step(regs_blk, src_blk, dst_blk):
            full = jax.lax.all_gather(regs_blk, axis_name="nodes", tiled=True)
            gathered = full[dst_blk[0]]
            red = jax.ops.segment_max(gathered, src_blk[0],
                                      num_segments=n_per_shard)
            return jnp.maximum(regs_blk, red)

        return jax.jit(
            jax.shard_map(
                step, mesh=mesh,
                in_specs=(P("nodes", None), P("nodes", None), P("nodes", None)),
                out_specs=P("nodes", None),
                check_vma=False,
            )
        )

    send_local = jnp.asarray(plan.send_local)
    send_mask = jnp.asarray(plan.send_mask)
    recv_pos = jnp.asarray(plan.recv_pos)
    G, B = plan.G, plan.B

    def step(regs_blk, src_blk, dst_blk):
        # regs_blk (B, m) — own rows; build the ghost table by S-1 ring steps
        sid = jax.lax.axis_index("nodes")
        m = regs_blk.shape[1]
        ghost = jnp.zeros((G, m), regs_blk.dtype)
        for k in range(1, S):
            sl = send_local[k - 1, sid]              # (G,) rows to send
            payload = regs_blk[jnp.clip(sl, 0, B - 1)]
            payload = jnp.where(send_mask[k - 1, sid][:, None], payload, 0)
            pos = recv_pos[k - 1, sid]
            moved = jax.lax.ppermute(
                payload, "nodes", [(s, (s + k) % S) for s in range(S)])
            mpos = jax.lax.ppermute(
                pos, "nodes", [(s, (s + k) % S) for s in range(S)])
            mmask = jax.lax.ppermute(
                send_mask[k - 1, sid], "nodes",
                [(s, (s + k) % S) for s in range(S)])
            ghost = ghost.at[jnp.where(mmask, mpos, G)].max(
                moved, mode="drop")
        table = jnp.concatenate([regs_blk, ghost], axis=0)  # (B+G, m)
        gathered = table[dst_blk[0]]
        red = jax.ops.segment_max(gathered, src_blk[0], num_segments=B)
        return jnp.maximum(regs_blk, red)

    from jax.sharding import PartitionSpec as P

    return jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(P("nodes", None), P("nodes", None), P("nodes", None)),
            out_specs=P("nodes", None),
            check_vma=False,
        )
    )
