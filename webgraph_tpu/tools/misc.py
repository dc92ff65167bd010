"""Assorted tools (reference analogs: BuildHostMap.java:57,
tool/ExtractComponent.java:48, tool/WebGraph2Dot.java:38, and the standalone
C utilities in c/ — checksum.c, filter.c, genzipf.c, inplace.c)."""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np

from webgraph_tpu.algo.components import StronglyConnectedComponents
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.transform.subgraph import ImmutableSubgraph


def build_host_map(urls) -> tuple[np.ndarray, list[str], np.ndarray]:
    """URL list -> (host id per URL, host list, per-host counts)
    (reference BuildHostMap.java:57); hosts numbered in first-appearance
    order."""
    host_ids: dict[str, int] = {}
    out = np.zeros(len(urls), dtype=np.int64)
    for i, u in enumerate(urls):
        host = urlsplit(u if "//" in u else "//" + u).netloc or u
        out[i] = host_ids.setdefault(host, len(host_ids))
    counts = np.bincount(out, minlength=len(host_ids))
    return out, list(host_ids.keys()), counts


def extract_component(graph: ImmutableGraph, component_ids: np.ndarray, which: int) -> ImmutableSubgraph:
    """Induced subgraph of one component (reference
    tool/ExtractComponent.java:48)."""
    nodes = np.flatnonzero(np.asarray(component_ids) == which)
    return ImmutableSubgraph(graph, nodes)


def to_dot(graph: ImmutableGraph, out=None, name: str = "webgraph") -> str:
    """GraphViz export (reference tool/WebGraph2Dot.java:38)."""
    lines = [f"digraph {name} {{"]
    it = graph.node_iterator()
    while it.has_next():
        x = it.next_int()
        for y in it.successor_array()[: it.outdegree()]:
            lines.append(f"\t{x} -> {int(y)};")
    lines.append("}")
    text = "\n".join(lines) + "\n"
    if out is not None:
        if hasattr(out, "write"):
            out.write(text)
        else:
            with open(out, "w") as f:
                f.write(text)
    return text


# ----------------------------------------------------------------------
# Equivalents of the reference's standalone C utilities (c/*.c)
# ----------------------------------------------------------------------


def permutation_resilient_checksum(lines) -> int:
    """Order-independent checksum of a text's lines (reference c/checksum.c:
    sums a per-line hash so permuted files compare equal)."""
    total = 0
    for line in lines:
        h = 1315423911
        for ch in line.rstrip("\n"):
            h ^= ((h << 5) + ord(ch) + (h >> 2)) & 0xFFFFFFFFFFFFFFFF
        total = (total + h) & 0xFFFFFFFFFFFFFFFF
    return total


def normalize_count_pairs(pairs) -> list[tuple[int, float]]:
    """Normalize count:value pair lists to frequencies (reference c/filter.c)."""
    total = sum(c for c, _ in pairs)
    return [(c, c / total if total else 0.0) for c, _ in pairs]


def zipf_counts(n: int, theta: float = 1.0, total: int | None = None, seed: int = 0) -> np.ndarray:
    """Zipf-distributed counts (reference c/genzipf.c)."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    weights = ranks**-theta
    if total is None:
        return weights / weights.sum()
    rng = np.random.default_rng(seed)
    return rng.multinomial(total, weights / weights.sum())


def minimum_redundancy_code_lengths(freqs: np.ndarray) -> np.ndarray:
    """Moffat-Katajainen in-place minimum-redundancy (Huffman) code lengths
    from sorted frequencies (reference c/inplace.c — used for entropy
    baselines of gap distributions). Input must be nondecreasing.
    """
    A = [int(f) for f in freqs]
    n = len(A)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    if any(A[i] > A[i + 1] for i in range(n - 1)):
        raise ValueError("frequencies must be nondecreasing")
    # phase 1: build internal-node weights in place (Moffat-Katajainen)
    A[0] += A[1]
    root = 0
    leaf = 2
    for next_ in range(1, n - 1):
        if leaf >= n or A[root] < A[leaf]:
            A[next_] = A[root]
            A[root] = next_
            root += 1
        else:
            A[next_] = A[leaf]
            leaf += 1
        if leaf >= n or (root < next_ and A[root] < A[leaf]):
            A[next_] += A[root]
            A[root] = next_
            root += 1
        else:
            A[next_] += A[leaf]
            leaf += 1
    # phase 2: convert parent pointers to internal-node depths
    A[n - 2] = 0
    for next_ in range(n - 3, -1, -1):
        A[next_] = A[A[next_]] + 1
    # phase 3: expand internal depths to leaf depths (in place)
    avail = 1
    used = 0
    depth = 0
    root = n - 2
    next_ = n - 1
    while avail > 0:
        while root >= 0 and A[root] == depth:
            used += 1
            root -= 1
        while avail > used:
            A[next_] = depth
            next_ -= 1
            avail -= 1
        avail = 2 * used
        used = 0
        depth += 1
    # A now holds leaf code lengths for the sorted (nondecreasing) input,
    # longest codes first
    return np.asarray(A, dtype=np.int64)


