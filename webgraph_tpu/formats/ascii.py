"""Text-based graph formats (ingestion layer).

Reference analogs:
* ``ASCIIGraph`` (ASCIIGraph.java:96): first line the node count, then one
  line per node with its sorted successors, space-separated;
* ``ArcListASCIIGraph`` (ArcListASCIIGraph.java:98): one arc per line
  "<source> <target>", sources nondecreasing; optional id shift;
* ``ShiftedByOneArcListASCIIGraph``: fixed shift of -1 (MATLAB-style 1-based);
* ``ScatteredArcsASCIIGraph`` (ScatteredArcsASCIIGraph.java:134): arcs in ANY
  order with arbitrary (even non-numeric) node identifiers — ids are mapped
  to a compact [0, n) range in order of first appearance, sorted in batches,
  and the id map is saved alongside (``.ids``).

All loaders accept paths or file-like objects and gzip transparently.
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np

from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.properties import store_properties


def _open(source, mode="rt"):
    if hasattr(source, "read") or hasattr(source, "write"):
        return source, False
    path = os.fspath(source)
    if path.endswith(".gz"):
        return gzip.open(path, mode), True
    return open(path, mode), True


class ASCIIGraph:
    """Successor-list-per-line text format."""

    @staticmethod
    def load(source) -> CSRGraph:
        f, close = _open(source)
        try:
            n = int(f.readline())
            lists = []
            for _ in range(n):
                line = f.readline()
                lists.append(np.fromstring(line, dtype=np.int64, sep=" ") if False else np.array(line.split(), dtype=np.int64))
            return CSRGraph.from_lists(lists)
        finally:
            if close:
                f.close()

    load_once = load
    load_offline = load
    load_sequential = load
    load_mapped = load

    @staticmethod
    def store(graph, dest, properties: bool = False) -> None:
        f, close = _open(dest, "wt")
        try:
            n = graph.num_nodes()
            f.write(f"{n}\n")
            it = graph.node_iterator()
            while it.has_next():
                it.next_int()
                succ = it.successor_array()[: it.outdegree()]
                f.write(" ".join(str(int(v)) for v in succ))
                f.write("\n")
        finally:
            if close:
                f.close()
        if properties and not hasattr(dest, "write"):
            store_properties(
                f"{dest}.properties",
                {"graphclass": "it.unimi.dsi.webgraph.ASCIIGraph", "nodes": graph.num_nodes()},
            )


class ArcListASCIIGraph:
    """Arc-per-line text format (sources must be nondecreasing on load)."""

    def __init__(self, shift: int = 0):
        self.shift = shift

    @staticmethod
    def load(source, shift: int = 0, n: int | None = None) -> CSRGraph:
        f, close = _open(source)
        try:
            src_list = []
            dst_list = []
            last = -(1 << 62)
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                s, t = int(parts[0]) + shift, int(parts[1]) + shift
                if s < last:
                    raise ValueError(f"sources must be nondecreasing (got {s} after {last})")
                last = s
                src_list.append(s)
                dst_list.append(t)
            if not src_list:
                return CSRGraph.from_lists([[] for _ in range(n or 0)])
            return CSRGraph.from_arcs(np.array(src_list), np.array(dst_list), n=n)
        finally:
            if close:
                f.close()

    load_once = load

    @staticmethod
    def store(graph, dest, shift: int = 0) -> None:
        f, close = _open(dest, "wt")
        try:
            it = graph.node_iterator()
            while it.has_next():
                x = it.next_int()
                for y in it.successor_array()[: it.outdegree()]:
                    f.write(f"{x + shift} {int(y) + shift}\n")
        finally:
            if close:
                f.close()


class ShiftedByOneArcListASCIIGraph(ArcListASCIIGraph):
    """Arc list with 1-based ids (reference ShiftedByOneArcListASCIIGraph)."""

    @staticmethod
    def load(source, n: int | None = None) -> CSRGraph:
        return ArcListASCIIGraph.load(source, shift=-1, n=n)

    @staticmethod
    def store(graph, dest) -> None:
        ArcListASCIIGraph.store(graph, dest, shift=1)


class ScatteredArcsASCIIGraph:
    """Arcs in any order with arbitrary identifiers.

    Node ids are assigned in order of first appearance (matching the
    reference's map construction); the resulting graph plus the id list are
    exposed as ``.graph`` and ``.ids``.  Options mirror the reference:
    ``symmetrize`` adds reverse arcs, ``no_loops`` drops self-loops,
    ``batch_size`` bounds the in-memory arc buffer (batches are sorted and
    spilled, then merged — external-memory pipeline parity).
    """

    def __init__(
        self,
        source,
        symmetrize: bool = False,
        no_loops: bool = False,
        batch_size: int = 1 << 20,
        n: int | None = None,
        numeric: bool | None = None,
    ):
        from webgraph_tpu.transform.transform import BatchGraph, _BatchSpiller

        f, close = _open(source)
        spiller = _BatchSpiller(batch_size, None, "wgt_scattered_")
        buf_s: list[int] = []
        buf_t: list[int] = []
        try:
            id2idx: dict[str, int] = {}

            def intern(tok: str) -> int:
                i = id2idx.get(tok)
                if i is None:
                    i = len(id2idx)
                    id2idx[tok] = i
                return i

            def flush_buf():
                if buf_s:
                    spiller.add(
                        np.asarray(buf_s, dtype=np.int64), np.asarray(buf_t, dtype=np.int64)
                    )
                    buf_s.clear()
                    buf_t.clear()

            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, b = line.split()[:2]
                s, t = intern(a), intern(b)
                if no_loops and s == t:
                    continue
                buf_s.append(s)
                buf_t.append(t)
                if symmetrize and s != t:
                    buf_s.append(t)
                    buf_t.append(s)
                if len(buf_s) >= 65536:
                    flush_buf()
            flush_buf()
            spiller.spill()
        finally:
            if close:
                f.close()
        num = n if n is not None else len(id2idx)
        if spiller.files:
            self.graph = CSRGraph(*BatchGraph(num, spiller.files).to_csr())
        else:
            self.graph = CSRGraph.from_lists([[] for _ in range(num)])
        self.ids = list(id2idx.keys())

    def save_ids(self, basename) -> None:
        with open(f"{basename}.ids", "w") as f:
            for tok in self.ids:
                f.write(f"{tok}\n")
