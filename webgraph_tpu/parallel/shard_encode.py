"""Mesh-sharded BVGraph *encode*: node-range shards, bit-exact vs serial.

The reference compresses with N threads over split node iterators and
bit-concatenates the per-thread streams (CompressionThread + copyTo merge,
BVGraph.java:2469-2550); each thread's iterator window is primed from
random access so references cross shard boundaries and the output is
byte-identical to single-threaded compression (BVGraph.java:1173-1183).

The TPU decomposition exploits that every per-node quantity is local:

  1. **Cost pass, shard-parallel** — each shard evaluates all
     (node, candidate) diffComp costs on its ghost-extended slice
     ``[a - w, b)`` (the w-node ghost prefix makes every candidate row
     resident, so real rows' costs equal the serial encoder's exactly).
     Runs under ``shard_map`` over the mesh, or vmapped on one device.
  2. **Greedy selection, global** — the maxRefCount chain ring is the only
     cross-node sequential state; one cheap ``lax.scan`` over the
     assembled (n, w+1) cost matrix reproduces the serial greedy choice
     (first-candidate-wins tie-breaking) for every node at once.
  3. **Emission, shard-parallel** — each shard emits records for its
     ghost-extended slice with the GLOBAL refs/depths (ghost records come
     out byte-identical to the serial records, so their exact bit length
     is known and simply dropped), successor values shifted to slice-local
     ids (the format is fully node-relative, so the bits are unchanged).
  4. **Bit splice** — per-shard streams are concatenated at bit
     granularity in node order (the ragged all-gather of SURVEY §5.8).

The result is byte-identical to the serial device/host encoders — and
therefore to the cnr-2000 fixture at its own parameters.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from webgraph_tpu.formats import bvgraph_jax_encode as E

I32 = jnp.int32


def _slice_bits(words: np.ndarray, b0: int, b1: int) -> tuple[bytes, int]:
    """Bits [b0, b1) of an MSB-first uint32 word array, re-aligned to bit 0
    of a fresh big-endian byte string."""
    nbits = int(b1 - b0)
    if nbits <= 0:
        return b"", 0
    w = words.astype(np.uint64)
    w64 = np.zeros((len(w) + 1) // 2, dtype=np.uint64)
    w64[: (len(w) + 1) // 2] = 0
    # pack uint32 pairs into uint64 (MSB-first)
    hi = w[0::2]
    lo = np.zeros_like(hi)
    lo[: len(w) // 2] = w[1::2]
    w64 = (hi << np.uint64(32)) | lo
    q, r = divmod(int(b0), 64)
    nw = (nbits + 63) // 64 + 1
    seg = np.zeros(nw + 1, dtype=np.uint64)
    take = w64[q : q + nw + 1]
    seg[: len(take)] = take
    if r:
        out = (seg[:-1] << np.uint64(r)) | (seg[1:] >> np.uint64(64 - r))
    else:
        out = seg[:-1]
    byts = out.astype(">u8").tobytes()
    return byts[: (nbits + 7) // 8], nbits


def plan_shards(n: int, num_shards: int, w: int):
    """Reference-parity bounds (split_node_iterators: round(i*n/S)) with a
    w-node ghost prefix per shard."""
    bounds = np.array([round(i * n / num_shards)
                       for i in range(num_shards + 1)], dtype=np.int64)
    starts, ends = bounds[:-1], bounds[1:]
    gstarts = np.maximum(starts - w, 0)
    return starts, ends, gstarts


def encode_sharded(g, num_shards: int, mesh: Mesh | None = None):
    """Encode ``g`` (any graph exposing ``to_csr``/``num_nodes``) with its
    node range sharded ``num_shards`` ways; returns
    (graph_bytes, graph_bits, offsets_bytes, offsets_bits).

    ``mesh``: run the cost pass under shard_map over its first axis
    (num_shards must equal the axis size); None = vmap on one device.
    """
    settings = g.settings if hasattr(g, "settings") else None
    from webgraph_tpu.formats.bvgraph import BVGraphSettings

    if settings is None:
        settings = BVGraphSettings()
    offsets, succ = g.to_csr()
    offsets = np.asarray(offsets, dtype=np.int64)
    succ = np.asarray(succ, dtype=np.int64)
    n = g.num_nodes()
    m = int(offsets[-1])
    w = settings.window_size
    skey = E.skey_of(settings)
    d = np.diff(offsets)
    iters = max(int(d.max(initial=1)).bit_length(), 1)

    starts, ends, gstarts = plan_shards(n, num_shards, w)
    S = num_shards
    L = int((ends - gstarts).max())          # slice nodes (padded)
    M = int((offsets[ends] - offsets[gstarts]).max())  # slice arcs (padded)

    off_p = np.zeros((S, L + 1), dtype=np.int32)
    succ_p = np.zeros((S, M), dtype=np.int32)
    src_p = np.zeros((S, M), dtype=np.int32)
    for s in range(S):
        A, b = int(gstarts[s]), int(ends[s])
        Ls, Ms = b - A, int(offsets[b] - offsets[A])
        off_p[s, : Ls + 1] = (offsets[A : b + 1] - offsets[A]).astype(np.int32)
        off_p[s, Ls + 1 :] = off_p[s, Ls]
        succ_p[s, :Ms] = (succ[offsets[A] : offsets[b]] - A).astype(np.int32)
        loc_d = np.diff(offsets[A : b + 1])
        src_p[s, :Ms] = np.repeat(np.arange(Ls, dtype=np.int32), loc_d)
        src_p[s, Ms:] = L  # out-of-range pad source

    def cost_fn(off_s, succ_s, src_s):
        c, v = E.compute_costs(off_s, succ_s, src_s, skey, iters, 0)
        return c, v

    if mesh is not None:
        axis = mesh.axis_names[0]
        assert mesh.devices.size == S
        smap = jax.shard_map(
            lambda o, sc, sr: cost_fn(o[0], sc[0], sr[0]),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
        costs_p, valid_p = smap(jnp.asarray(off_p), jnp.asarray(succ_p),
                                jnp.asarray(src_p))
        costs_p = np.asarray(costs_p).reshape(S, L, -1)
        valid_p = np.asarray(valid_p).reshape(S, L, -1)
    else:
        costs_p, valid_p = jax.vmap(cost_fn)(
            jnp.asarray(off_p), jnp.asarray(succ_p), jnp.asarray(src_p))
        costs_p = np.asarray(costs_p)
        valid_p = np.asarray(valid_p)

    # assemble REAL rows -> global (n, w+1) matrices; select globally
    costs = np.zeros((n, w + 1), dtype=costs_p.dtype)
    valid = np.zeros((n, w + 1), dtype=bool)
    for s in range(S):
        A, a, b = int(gstarts[s]), int(starts[s]), int(ends[s])
        costs[a:b] = costs_p[s, a - A : b - A]
        valid[a:b] = valid_p[s, a - A : b - A]
    refs, depths = E.select_references(
        jnp.asarray(costs), jnp.asarray(valid), skey)
    refs = np.asarray(refs)
    depths = np.asarray(depths)

    # per-shard emission with the GLOBAL refs/depths (ghosts included)
    parts = []
    for s in range(S):
        A, a, b = int(gstarts[s]), int(starts[s]), int(ends[s])
        Ls, Ms = b - A, int(offsets[b] - offsets[A])
        off_s = jnp.asarray((offsets[A : b + 1] - offsets[A]).astype(np.int32))
        succ_s = jnp.asarray((succ[offsets[A] : offsets[b]] - A).astype(np.int32))
        loc_d = np.diff(offsets[A : b + 1])
        src_s = jnp.asarray(np.repeat(np.arange(Ls, dtype=np.int32), loc_d))
        refs_s = jnp.asarray(refs[A:b].astype(np.int32))
        deps_s = jnp.asarray(depths[A:b].astype(np.int32))
        tb, tblk, tiv, tres = (int(v) for v in E.plan_sizes(
            off_s, succ_s, src_s, refs_s, skey, iters, 0))
        words, starts_bits, _stats, _sh, _rh = E.emit_graph(
            off_s, succ_s, src_s, refs_s, deps_s, skey, iters, 0,
            tb, tblk, tiv, tres)
        starts_bits = np.asarray(starts_bits)
        ghost_bits = int(starts_bits[a - A])
        real_bits = int(starts_bits[Ls]) - ghost_bits
        parts.append((np.asarray(words), ghost_bits, real_bits,
                      np.diff(starts_bits[a - A : Ls + 1])))

    # bit splice in node order
    from webgraph_tpu.bits.bitstream import OutputBitStream

    gobs = OutputBitStream()
    node_bits_all = []
    for words, b0, nbits, nb in parts:
        byts, cnt = _slice_bits(words, b0, b0 + nbits)
        gobs.append_raw(byts, cnt)
        node_bits_all.append(nb)
    gbits = gobs.written_bits
    graph_bytes = gobs.to_bytes()

    node_bits = np.concatenate(node_bits_all) if node_bits_all else \
        np.zeros(0, dtype=np.int64)
    ovals = np.concatenate([[0], node_bits]).astype(np.int64)
    lf = E.make_len_fn(settings.offset_coding, settings.zeta_k)
    olens = np.asarray(lf(jnp.asarray(ovals.astype(np.uint32))),
                       dtype=np.int64)
    total_obits = int(olens.sum())
    owords = E.emit_offsets(jnp.asarray(node_bits.astype(np.int32)),
                            settings.offset_coding, settings.zeta_k,
                            total_obits)
    raw = np.asarray(owords).astype(">u4").tobytes()
    off_bytes = raw[: (total_obits + 7) // 8]
    return graph_bytes, gbits, off_bytes, total_obits
