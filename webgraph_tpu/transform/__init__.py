from webgraph_tpu.transform.transform import (
    transpose,
    transpose_offline,
    symmetrize,
    symmetrize_offline,
    simplify,
    simplify_offline,
    map_graph,
    map_offline,
    filter_arcs,
    union,
    compose,
    line_graph,
    remove_dangling,
    gray_code_permutation,
    host_by_host_gray_code_permutation,
    lexicographical_permutation,
    random_permutation,
    NodeClassFilter,
    ArcFilter,
)
from webgraph_tpu.transform.subgraph import ImmutableSubgraph, DegreeRangeImmutableSubgraph
from webgraph_tpu.transform.bidirectional import BidirectionalImmutableGraph
from webgraph_tpu.transform.union_graph import UnionImmutableGraph
