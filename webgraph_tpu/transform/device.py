"""Device transform pipelines: sort-based transpose / map / permutation.

The reference's offline transforms are external-memory sort pipelines
(scan arcs -> parallel quicksort batches -> k-way merge,
Transform.java:964-1052 transpose, :1284-1320 processBatch,
:1505-1539 mapOffline).  At pod-memory scales the TPU analog is a single
device-resident two-key sort (`jax.lax.sort` rides the chip's sort
networks at ~170 M keys/s) over the arc array — no batches, no merge.

Everything is jittable with static shapes; host wrappers return NumPy CSR
matching transform/transform.py (the host oracle these are tested against).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

I32 = jnp.int32


def _arcs_of(offsets, succ):
    src = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                    np.diff(offsets))
    return src, np.asarray(succ, dtype=np.int64)


@jax.jit
def _sort_arcs(src, dst, n):
    """Sort arcs by (src, dst); returns sorted (src, dst)."""
    return jax.lax.sort((src, dst), num_keys=2)


def _csr_from_sorted(src_s, dst_s, n: int):
    """Host assembly of CSR from device-sorted arc arrays."""
    src_s = np.asarray(src_s)
    dst_s = np.asarray(dst_s)
    counts = np.bincount(src_s, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets, dst_s.astype(np.int32)


def transpose_device(g):
    """Transpose via one device two-key sort over the swapped arc array
    (Transform.java:964-1052 / transposeOffline:1405-1446).  Returns
    (offsets, succ) CSR of the transposed graph."""
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    src, dst = _arcs_of(offsets, succ)
    # transpose: sort (dst, src)
    s1, s2 = _sort_arcs(jnp.asarray(dst, dtype=I32),
                        jnp.asarray(src, dtype=I32), n)
    return _csr_from_sorted(s1, s2, n)


def map_device(g, perm):
    """Node renumbering x -> perm[x] (perm[x] < 0 deletes the node and its
    arcs; Transform.map, Transform.java:654-723 / mapOffline:1510-1539).
    Returns (offsets, succ) CSR of the mapped graph."""
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    perm = np.asarray(perm, dtype=np.int64)
    n_out = int(perm.max(initial=-1)) + 1
    src, dst = _arcs_of(offsets, succ)
    ms, md = perm[src], perm[dst]
    keep = (ms >= 0) & (md >= 0)
    ms, md = ms[keep], md[keep]
    s1, s2 = _sort_arcs(jnp.asarray(ms, dtype=I32),
                        jnp.asarray(md, dtype=I32), n_out)
    # dedup (map may merge arcs; reference semantics keep one copy)
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    if len(s1):
        uniq = np.ones(len(s1), dtype=bool)
        uniq[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        s1, s2 = s1[uniq], s2[uniq]
    counts = np.bincount(s1, minlength=n_out)
    offsets_o = np.zeros(n_out + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets_o[1:])
    return offsets_o, s2.astype(np.int32)


def symmetrize_device(g):
    """Union with the transpose (Transform.symmetrize, :913-951): one sort
    over the doubled arc array + dedup."""
    offsets, succ = g.to_csr()
    n = g.num_nodes()
    src, dst = _arcs_of(offsets, succ)
    allsrc = np.concatenate([src, dst])
    alldst = np.concatenate([dst, src])
    s1, s2 = _sort_arcs(jnp.asarray(allsrc, dtype=I32),
                        jnp.asarray(alldst, dtype=I32), n)
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    if len(s1):
        uniq = np.ones(len(s1), dtype=bool)
        uniq[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        s1, s2 = s1[uniq], s2[uniq]
    counts = np.bincount(s1, minlength=n)
    offsets_o = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets_o[1:])
    return offsets_o, s2.astype(np.int32)
