"""Labelled-graph tests (reference analog: test/.../labelling/, incl.
BitStreamArcLabelledGraphTest round trips and relabelling)."""

import os

import numpy as np
import pytest

from webgraph_tpu.labelling import (
    ArcLabelledCSRGraph,
    ArcRelabelledImmutableGraph,
    BitStreamArcLabelledImmutableGraph,
    FixedWidthIntLabel,
    FixedWidthIntListLabel,
    GammaCodedIntLabel,
    IntegerLabelFilter,
    UnionArcLabelledImmutableGraph,
    labelled_compose,
    labelled_symmetrize,
    labelled_transpose,
    parse_label_spec,
)
from webgraph_tpu.labelling.arc_labelled import MaxLabelMergeStrategy, MinPlusSemiring, filter_labelled_arcs
from webgraph_tpu.labelling.bitstream_labelled import store_labelled_bvgraph
from webgraph_tpu.bits.bitstream import InputBitStream, OutputBitStream


def make_labelled(n=20, seed=0, label_cls="gamma"):
    rng = np.random.default_rng(seed)
    triples = []
    seen = set()
    for _ in range(n * 3):
        x, y = int(rng.integers(n)), int(rng.integers(n))
        if (x, y) in seen:
            continue
        seen.add((x, y))
        v = int(rng.integers(100))
        if label_cls == "gamma":
            lab = GammaCodedIntLabel("FOO", v)
        elif label_cls == "fixed":
            lab = FixedWidthIntLabel("FOO", 12, v)
        else:
            lab = FixedWidthIntListLabel("FOO", 10, [v, v + 1, v % 7])
        triples.append((x, y, lab))
    return ArcLabelledCSRGraph.from_arc_list(triples, n=n)


@pytest.mark.parametrize("label_cls", ["gamma", "fixed", "list"])
def test_label_serialization_roundtrip(label_cls):
    g = make_labelled(label_cls=label_cls)
    obs = OutputBitStream()
    all_labels = []
    for x in range(g.num_nodes()):
        for lab in g.label_array(x):
            lab.to_bitstream(obs, x)
            all_labels.append(lab)
    ibs = InputBitStream(obs.to_bytes())
    for x_lab in all_labels:
        clone = x_lab.copy()
        clone.set(0 if not isinstance(clone, FixedWidthIntListLabel) else [])
        clone.from_bitstream(ibs, 0)
        assert clone.get() == x_lab.get()


@pytest.mark.parametrize("label_cls", ["gamma", "fixed", "list"])
def test_bitstream_labelled_store_load(label_cls, tmp_path):
    g = make_labelled(label_cls=label_cls, seed=3)
    base = os.path.join(tmp_path, "lab")
    store_labelled_bvgraph(g, base)
    loaded = BitStreamArcLabelledImmutableGraph.load(base)
    assert loaded.num_nodes() == g.num_nodes()
    assert loaded.num_arcs() == g.num_arcs()
    for x in range(g.num_nodes()):
        np.testing.assert_array_equal(loaded.successors(x), g.successors(x))
        assert loaded.label_array(x) == g.label_array(x)
    assert loaded == g


def test_label_spec_roundtrip():
    for lab in (GammaCodedIntLabel("A"), FixedWidthIntLabel("B", 7), FixedWidthIntListLabel("C", 9)):
        parsed = parse_label_spec(lab.to_spec())
        assert type(parsed) is type(lab)
        assert parsed.key == lab.key
        if hasattr(lab, "width"):
            assert parsed.width == lab.width


def test_relabelling():
    g = make_labelled(label_cls="gamma", seed=5)
    re = ArcRelabelledImmutableGraph(g, FixedWidthIntLabel("BAR", 16), ArcRelabelledImmutableGraph.INT_CONVERTER)
    for x in range(g.num_nodes()):
        assert [l.get() for l in re.label_array(x)] == [l.get() for l in g.label_array(x)]
        assert all(isinstance(l, FixedWidthIntLabel) for l in re.label_array(x))


def test_labelled_union_merge():
    a = ArcLabelledCSRGraph.from_arc_list(
        [(0, 1, GammaCodedIntLabel("F", 3)), (1, 2, GammaCodedIntLabel("F", 5))], n=3
    )
    b = ArcLabelledCSRGraph.from_arc_list(
        [(0, 1, GammaCodedIntLabel("F", 7)), (2, 0, GammaCodedIntLabel("F", 1))], n=3
    )
    u = UnionArcLabelledImmutableGraph(a, b, MaxLabelMergeStrategy())
    d = dict(((x, y), lab.get()) for x in range(3) for y, lab in u.labelled_successors(x))
    assert d == {(0, 1): 7, (1, 2): 5, (2, 0): 1}


def test_labelled_transpose_symmetrize():
    g = ArcLabelledCSRGraph.from_arc_list(
        [(0, 1, GammaCodedIntLabel("F", 3)), (1, 2, GammaCodedIntLabel("F", 5))], n=3
    )
    t = labelled_transpose(g)
    assert dict(((x, y), l.get()) for x in range(3) for y, l in t.labelled_successors(x)) == {
        (1, 0): 3,
        (2, 1): 5,
    }
    s = labelled_symmetrize(g, MaxLabelMergeStrategy())
    assert s.num_arcs() == 4


def test_labelled_compose_semiring():
    # shortest-path composition in the tropical semiring
    g1 = ArcLabelledCSRGraph.from_arc_list(
        [(0, 1, GammaCodedIntLabel("F", 2)), (0, 2, GammaCodedIntLabel("F", 10))], n=4
    )
    g2 = ArcLabelledCSRGraph.from_arc_list(
        [(1, 3, GammaCodedIntLabel("F", 4)), (2, 3, GammaCodedIntLabel("F", 1))], n=4
    )
    c = labelled_compose(g1, g2, MinPlusSemiring())
    # 0->3 via 1: 2+4=6; via 2: 10+1=11; min = 6
    assert dict(((x, y), l.get()) for x in range(4) for y, l in c.labelled_successors(x)) == {(0, 3): 6}


def test_integer_label_filter():
    g = make_labelled(label_cls="gamma", seed=9)
    keep_vals = {1, 2, 3, 4, 5}
    f = filter_labelled_arcs(g, IntegerLabelFilter("FOO", *keep_vals))
    for x in range(f.num_nodes()):
        for lab in f.label_array(x):
            assert lab.get() in keep_vals
    total = sum(1 for x in range(g.num_nodes()) for l in g.label_array(x) if l.get() in keep_vals)
    assert f.num_arcs() == total
