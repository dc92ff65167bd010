from webgraph_tpu.labelling.labels import (
    Label,
    GammaCodedIntLabel,
    FixedWidthIntLabel,
    FixedWidthIntListLabel,
    parse_label_spec,
)
from webgraph_tpu.labelling.arc_labelled import (
    ArcLabelledImmutableGraph,
    ArcLabelledCSRGraph,
    ArcRelabelledImmutableGraph,
    UnionArcLabelledImmutableGraph,
    LabelMergeStrategy,
    LabelSemiring,
    IntegerLabelFilter,
    labelled_transpose,
    labelled_symmetrize,
    labelled_compose,
)
from webgraph_tpu.labelling.bitstream_labelled import BitStreamArcLabelledImmutableGraph
