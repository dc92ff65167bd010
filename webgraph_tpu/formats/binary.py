"""Binary example formats and legacy importers.

Reference analogs: examples/IntegerListImmutableGraph.java:51 (binary
int-list source), examples/IntegerTriplesArcLabelledImmutableGraph.java:55,
webbase/Converter.java:39 + webbase.c (Stanford WebBase crawl text ->
adjacency), webbase/CRC64.java (64-bit CRC), webbase/URL2 URL
normalization.
"""

from __future__ import annotations

import struct

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph


class IntegerListImmutableGraph:
    """Binary format: big-endian int32 sequence
    ``n, outdegree_0, succ..., outdegree_1, succ..., ...``."""

    @staticmethod
    def load(source) -> CSRGraph:
        data = source.read() if hasattr(source, "read") else open(source, "rb").read()
        ints = np.frombuffer(data, dtype=">i4").astype(np.int64)
        n = int(ints[0])
        lists = []
        p = 1
        for _ in range(n):
            d = int(ints[p])
            p += 1
            lists.append(ints[p : p + d])
            p += d
        return CSRGraph.from_lists(lists)

    @staticmethod
    def store(graph, dest) -> None:
        out = [struct.pack(">i", graph.num_nodes())]
        it = graph.node_iterator()
        while it.has_next():
            it.next_int()
            succ = it.successor_array()[: it.outdegree()]
            out.append(struct.pack(">i", len(succ)))
            out.append(np.asarray(succ, dtype=">i4").tobytes())
        data = b"".join(out)
        if hasattr(dest, "write"):
            dest.write(data)
        else:
            with open(dest, "wb") as f:
                f.write(data)


class IntegerTriplesArcLabelledImmutableGraph:
    """Labelled example source: (source, target, label-value) triples with
    gamma-coded integer labels (reference examples:55)."""

    @staticmethod
    def from_triples(triples, n: int | None = None):
        from webgraph_tpu.labelling.arc_labelled import ArcLabelledCSRGraph
        from webgraph_tpu.labelling.labels import GammaCodedIntLabel

        return ArcLabelledCSRGraph.from_arc_list(
            [(int(s), int(t), GammaCodedIntLabel("FOO", int(v))) for s, t, v in triples], n=n
        )


# ----------------------------------------------------------------------
# Legacy web-crawl machinery (reference webbase/, cosin/)
# ----------------------------------------------------------------------

_CRC64_POLY = 0xD800000000000000  # reference CRC64.java polynomial (ECMA-182 reversed form as used there)
_crc64_table: list[int] | None = None


def crc64(data: bytes) -> int:
    """64-bit CRC (reference webbase/CRC64.java)."""
    global _crc64_table
    if _crc64_table is None:
        table = []
        for i in range(256):
            v = i
            for _ in range(8):
                v = (v >> 1) ^ (_CRC64_POLY if v & 1 else 0)
            table.append(v)
        _crc64_table = table
    crc = 0
    for b in data:
        crc = _crc64_table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


def normalize_url(url: str) -> str:
    """URL normalization in the spirit of webbase/URL2: lower-case scheme
    and host, default-port stripping, empty-path -> '/'."""
    from urllib.parse import urlsplit, urlunsplit

    if "//" not in url:
        url = "http://" + url
    parts = urlsplit(url)
    scheme = parts.scheme.lower() or "http"
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, host, path, parts.query, ""))


def webbase_to_graph(lines, n: int | None = None) -> tuple[CSRGraph, list[str]]:
    """Convert a WebBase-style crawl text to a graph (reference
    webbase/Converter.java:39, c/webbase.c): lines of the form
    ``<url>`` (a new page) followed by indented/arrow outlink URLs; returns
    the graph plus the URL list. Here the accepted format is
    ``page_url<TAB>outlink`` pairs or blocks separated by blank lines with
    the page URL first."""
    ids: dict[str, int] = {}
    arcs: list[tuple[int, int]] = []

    def intern(u: str) -> int:
        u = normalize_url(u)
        i = ids.get(u)
        if i is None:
            i = len(ids)
            ids[u] = i
        return i

    current = None
    for raw in lines:
        line = raw.rstrip("\n")
        if not line.strip():
            current = None
            continue
        if "\t" in line:
            a, b = line.split("\t", 1)
            arcs.append((intern(a), intern(b)))
        elif line.startswith((" ", ">")):
            if current is not None:
                arcs.append((current, intern(line.strip().lstrip(">").strip())))
        else:
            current = intern(line.strip())
    num = n if n is not None else len(ids)
    if arcs:
        src, dst = zip(*arcs)
        g = CSRGraph.from_arcs(np.array(src), np.array(dst), n=num, dedup=True)
    else:
        g = CSRGraph.from_lists([[] for _ in range(num)])
    return g, list(ids.keys())


class CosinGraph:
    """Legacy COSIN graph importer (reference cosin/CosinGraph.java:47).

    Two files: ``basename.info`` holds one 6-int32 record per node in
    *native* byte order — (indegree, outdegree, _, _, _, succ-offset) — of
    which the reference iterator only consumes slot 1 (outdegree,
    CosinGraph.java:103-109); ``basename.succ`` holds every node's
    successors as contiguous native int32s in node order
    (CosinGraph.java:126-147).  The reference exposes this offline-only
    (sequential iteration, no random access; load() throws,
    CosinGraph.java:186-189); here the importer streams both files into a
    CSR graph, which then supports the full ImmutableGraph surface.
    """

    @staticmethod
    def num_nodes(basename) -> int:
        import os

        return os.path.getsize(str(basename) + ".info") // (6 * 4)

    @staticmethod
    def load_offline(basename) -> CSRGraph:
        info = np.fromfile(str(basename) + ".info", dtype=np.int32).reshape(-1, 6)
        succ = np.fromfile(str(basename) + ".succ", dtype=np.int32)
        outd = info[:, 1].astype(np.int64)
        if int(outd.sum()) != len(succ):
            raise ValueError(
                f"COSIN successor file length {len(succ)} != sum of outdegrees {int(outd.sum())}"
            )
        offsets = np.zeros(len(outd) + 1, dtype=np.int64)
        np.cumsum(outd, out=offsets[1:])
        return CSRGraph(offsets, succ.astype(np.int32))

    # The reference has no writer; this one exists so pipelines (and tests)
    # can round-trip through the legacy layout.
    @staticmethod
    def store(graph, basename) -> None:
        n = graph.num_nodes()
        info = np.zeros((n, 6), dtype=np.int32)
        succ_parts = []
        offset = 0
        it = graph.node_iterator()
        indeg = np.zeros(n, dtype=np.int32)
        while it.has_next():
            x = it.next_int()
            s = np.asarray(it.successor_array()[: it.outdegree()], dtype=np.int32)
            info[x, 1] = len(s)
            info[x, 5] = offset
            offset += len(s)
            succ_parts.append(s)
            np.add.at(indeg, s, 1)
        info[:, 0] = indeg
        info.tofile(str(basename) + ".info")
        (np.concatenate(succ_parts) if succ_parts else np.zeros(0, np.int32)).tofile(
            str(basename) + ".succ"
        )
