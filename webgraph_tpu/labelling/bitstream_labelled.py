"""Bit-stream arc-label storage over any underlying graph (reference analog:
BitStreamArcLabelledImmutableGraph.java:136).

Files (reference :62-145): ``.labels`` — the labels of all arcs, node-major
in successor order, as one MSB-first bit stream; ``.labeloffsets`` —
gamma-coded per-node bit lengths (with a leading 0, matching the
storeLabelled writer, BVGraph.java:2333,2237); ``.properties`` with
``graphclass``, ``underlyinggraph`` (basename relative to the label files)
and ``labelspec``.
"""

from __future__ import annotations

import os

import numpy as np

from webgraph_tpu.bits.bitstream import InputBitStream, OutputBitStream
from webgraph_tpu.graph.immutable_graph import load as load_graph
from webgraph_tpu.graph.properties import load_properties, store_properties
from webgraph_tpu.labelling.arc_labelled import ArcLabelledImmutableGraph
from webgraph_tpu.labelling.labels import Label, parse_label_spec

LABELS_EXTENSION = ".labels"
LABEL_OFFSETS_EXTENSION = ".labeloffsets"


class BitStreamArcLabelledImmutableGraph(ArcLabelledImmutableGraph):
    def __init__(self, underlying, prototype: Label, label_words, label_offsets: np.ndarray, basename=None):
        self.underlying = underlying
        self._prototype = prototype
        self._label_words = label_words
        self._label_offsets = label_offsets  # int64[n+1] bit offsets
        self._basename = basename

    # -- construction ---------------------------------------------------

    @classmethod
    def store(
        cls,
        g: ArcLabelledImmutableGraph,
        basename: str | os.PathLike,
        underlying_basename: str,
    ) -> None:
        """Write .labels/.labeloffsets/.properties for an in-memory labelled
        graph whose underlying graph is already stored at
        ``underlying_basename`` (path relative to ``basename``'s directory)."""
        obs = OutputBitStream()
        offsets_obs = OutputBitStream()
        offsets_obs.write_gamma(0)
        prev_bits = 0
        for x in range(g.num_nodes()):
            for lab in g.label_array(x):
                lab.to_bitstream(obs, x)
            offsets_obs.write_gamma(obs.written_bits - prev_bits)
            prev_bits = obs.written_bits
        with open(f"{basename}{LABELS_EXTENSION}", "wb") as f:
            f.write(obs.to_bytes())
        with open(f"{basename}{LABEL_OFFSETS_EXTENSION}", "wb") as f:
            f.write(offsets_obs.to_bytes())
        store_properties(
            f"{basename}.properties",
            {
                "graphclass": "it.unimi.dsi.webgraph.labelling.BitStreamArcLabelledImmutableGraph",
                "underlyinggraph": underlying_basename,
                "labelspec": g.prototype().to_spec(),
            },
            comment="BitStreamArcLabelledImmutableGraph properties",
        )

    @classmethod
    def load(cls, basename: str | os.PathLike) -> "BitStreamArcLabelledImmutableGraph":
        props = load_properties(f"{basename}.properties")
        prototype = parse_label_spec(props["labelspec"])
        under_name = props["underlyinggraph"]
        base_dir = os.path.dirname(os.fspath(basename))
        underlying = load_graph(os.path.join(base_dir, under_name))
        with open(f"{basename}{LABELS_EXTENSION}", "rb") as f:
            data = f.read()
        with open(f"{basename}{LABEL_OFFSETS_EXTENSION}", "rb") as f:
            ibs = InputBitStream(f.read())
        n = underlying.num_nodes()
        offsets = np.zeros(n + 1, dtype=np.int64)
        ibs.read_gamma()  # leading zero
        acc = 0
        for i in range(n):
            acc += ibs.read_gamma()
            offsets[i + 1] = acc
        return cls(underlying, prototype, data, offsets, str(basename))

    load_mapped = load
    load_offline = load
    load_sequential = load

    # -- ArcLabelledImmutableGraph API ---------------------------------

    def num_nodes(self):
        return self.underlying.num_nodes()

    def num_arcs(self):
        return self.underlying.num_arcs()

    def outdegree(self, x):
        return self.underlying.outdegree(x)

    def successors(self, x):
        return self.underlying.successors(x)

    successor_array = successors

    def to_csr(self):
        return self.underlying.to_csr()

    def prototype(self) -> Label:
        return self._prototype

    def label_array(self, x: int) -> list[Label]:
        ibs = InputBitStream(self._label_words)
        ibs.position(int(self._label_offsets[x]))
        out = []
        for _ in range(self.underlying.outdegree(x)):
            lab = self._prototype.copy()
            lab.from_bitstream(ibs, x)
            out.append(lab)
        return out


def store_labelled_bvgraph(g: ArcLabelledImmutableGraph, basename, underlying_basename=None, **kwargs):
    """Store the underlying graph in BVGraph format AND the labels in one
    pass (reference BVGraph.storeLabelled, BVGraph.java:1814-1822)."""
    from webgraph_tpu.formats.bvgraph import BVGraph

    basename = os.fspath(basename)
    if underlying_basename is None:
        underlying_basename = os.path.basename(basename) + "-underlying"
    under_path = os.path.join(os.path.dirname(basename) or ".", underlying_basename)
    BVGraph.store(g, under_path, **kwargs)
    BitStreamArcLabelledImmutableGraph.store(g, basename, underlying_basename)
