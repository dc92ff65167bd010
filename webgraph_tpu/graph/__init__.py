from webgraph_tpu.graph.immutable_graph import ImmutableGraph, NodeIterator, LoadMethod, load, store
from webgraph_tpu.graph.csr import CSRGraph
from webgraph_tpu.graph.builders import MutableGraph
