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
