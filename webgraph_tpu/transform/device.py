"""Device transform pipelines: sort-based transpose / map / permutation.

The reference's offline transforms are external-memory sort pipelines
(scan arcs -> parallel quicksort batches -> k-way merge,
Transform.java:964-1052 transpose, :1284-1320 processBatch,
:1505-1539 mapOffline).  At pod-memory scales the TPU analog is a single
device-resident two-key sort (`jax.lax.sort` rides the chip's sort
networks) over the arc array — no batches, no merge.

Round 5: the WHOLE pipeline is device-resident and jittable — dedup
(sorted-run flags + prefix-sum compaction), deletion filtering (sentinel
keys sort to the tail), and CSR assembly (vectorized searchsorted) all run
on device; host wrappers only convert the final arrays.  Device functions
return (offsets, succ, m) with `succ` padded to the static input arc count
and `m` the real (post-dedup/post-deletion) arc count.

Everything is oracle-tested against transform/transform.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

I32 = jnp.int32


def _arcs_of(offsets, succ):
    src = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                    np.diff(offsets))
    return src, np.asarray(succ, dtype=np.int64)


@functools.partial(jax.jit, static_argnums=(2,))
def sorted_arcs_to_csr(src_s, dst_s, n: int, m=None):
    """CSR from (src, dst)-sorted arc arrays, fully on device: offsets via
    vectorized binary search over the sorted sources.  `m` (device scalar)
    caps the valid prefix when the tail holds compacted-away slots."""
    if m is None:
        m = src_s.shape[0]
    # sentinel-padded tails sort to >= n, so searchsorted naturally stops
    offsets = jnp.searchsorted(src_s, jnp.arange(n + 1, dtype=src_s.dtype),
                               side="left")
    return jnp.minimum(offsets, m), dst_s


@jax.jit
def sort_dedup_arcs(src, dst):
    """Sort arcs by (src, dst) and compact away duplicates ON DEVICE:
    sorted-run uniqueness flags + prefix-sum scatter (the data-parallel
    equivalent of the reference's sorted-batch dedup,
    Transform.java:1291-1318).  Deleted arcs must already carry sentinel
    keys (src == INT32_MAX) — they sort to the tail and are dropped too.
    Returns (src_c, dst_c, m): arrays of the input's static length whose
    first m slots are the unique kept arcs; the tail is INT32_MAX."""
    s1, s2 = jax.lax.sort((src, dst), num_keys=2)
    sent = jnp.int32(np.iinfo(np.int32).max)
    keep = (s1 != sent)
    uniq = jnp.ones_like(keep)
    uniq = uniq.at[1:].set((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]))
    take = keep & uniq
    pos = jnp.cumsum(take.astype(I32)) - 1
    m = jnp.maximum(pos[-1] + 1, 0)
    idx = jnp.where(take, pos, src.shape[0])
    out1 = jnp.full(src.shape[0], sent, I32).at[idx].set(s1, mode="drop")
    out2 = jnp.full(src.shape[0], sent, I32).at[idx].set(s2, mode="drop")
    return out1, out2, m


@functools.partial(jax.jit, static_argnums=(3,))
def transpose_arcs_device(src, dst, n_unused, n: int):
    """Device transpose pipeline: swap + sort + CSR (duplicates impossible
    in a well-formed graph; no dedup needed — Transform.java:964-1052)."""
    s1, s2 = jax.lax.sort((dst, src), num_keys=2)
    offsets, succ = sorted_arcs_to_csr(s1, s2, n)
    return offsets, succ


@functools.partial(jax.jit, static_argnums=(3,))
def map_arcs_device(src, dst, perm, n_out: int):
    """Device map pipeline: gather the permutation, sentinel out deletions
    (perm[x] < 0), sort, dedup, CSR (Transform.map, Transform.java:654-723
    / mapOffline:1510-1539)."""
    sent = jnp.int32(np.iinfo(np.int32).max)
    ms = perm[src]
    md = perm[dst]
    drop = (ms < 0) | (md < 0)
    ms = jnp.where(drop, sent, ms)
    md = jnp.where(drop, sent, md)
    s1, s2, m = sort_dedup_arcs(ms, md)
    offsets, succ = sorted_arcs_to_csr(s1, s2, n_out, m)
    return offsets, succ, m


@functools.partial(jax.jit, static_argnums=(2,))
def symmetrize_arcs_device(src, dst, n: int):
    """Device symmetrize: one sort over the doubled arc array + dedup
    (Transform.symmetrize, :913-951)."""
    allsrc = jnp.concatenate([src, dst])
    alldst = jnp.concatenate([dst, src])
    s1, s2, m = sort_dedup_arcs(allsrc, alldst)
    offsets, succ = sorted_arcs_to_csr(s1, s2, n, m)
    return offsets, succ, m


# ----------------------------------------------------------------------
# host wrappers (convert to exact NumPy CSR; the oracle-facing surface)
# ----------------------------------------------------------------------


def transpose_device(g):
    """Transpose via one device two-key sort + device CSR assembly.
    Returns (offsets, succ) matching transform.transpose."""
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    src, dst = _arcs_of(offsets, succ)
    off_d, succ_d = transpose_arcs_device(
        jnp.asarray(src, dtype=I32), jnp.asarray(dst, dtype=I32), 0, n)
    return np.asarray(off_d).astype(np.int64), np.asarray(succ_d)


def map_device(g, perm):
    """Node renumbering x -> perm[x] (perm[x] < 0 deletes the node and its
    arcs).  Returns (offsets, succ) matching transform.map_graph."""
    offsets, succ = g.to_csr()
    perm = np.asarray(perm, dtype=np.int64)
    n_out = int(perm.max(initial=-1)) + 1
    src, dst = _arcs_of(offsets, succ)
    off_d, succ_d, m = map_arcs_device(
        jnp.asarray(src, dtype=I32), jnp.asarray(dst, dtype=I32),
        jnp.asarray(perm, dtype=I32), n_out)
    m = int(m)
    return np.asarray(off_d).astype(np.int64), np.asarray(succ_d)[:m]


def symmetrize_device(g):
    """Union with the transpose.  Returns (offsets, succ) matching
    transform.symmetrize."""
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    src, dst = _arcs_of(offsets, succ)
    off_d, succ_d, m = symmetrize_arcs_device(
        jnp.asarray(src, dtype=I32), jnp.asarray(dst, dtype=I32), n)
    m = int(m)
    return np.asarray(off_d).astype(np.int64), np.asarray(succ_d)[:m]
