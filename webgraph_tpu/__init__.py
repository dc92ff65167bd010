"""webgraph_tpu — a TPU-native graph-compression framework.

A from-scratch reimplementation of the capabilities of the WebGraph framework
(Boldi & Vigna, WWW 2004; reference Java implementation ``vigna/webgraph``),
designed TPU-first: the instantaneous-code bitstream layer, the BVGraph
adjacency codec, Elias-Fano indexes, graph transforms and the analytics suite
(BFS / connected components / HyperBall / diameters / centralities) are
implemented as vectorized array programs (NumPy on host, JAX/XLA/Pallas on
device) rather than as scalar bit-by-bit loops.

Layering (mirrors reference SURVEY.md §1):
  L0  bits/       instantaneous codes + bit streams + Elias-Fano   (device-capable)
  L1  graph/      ImmutableGraph abstraction, CSR, builders, properties
  L2  formats/    BVGraph + EFGraph codecs (host oracle + TPU kernels)
  L3  formats/ascii*  ingestion formats
  L4  transform/  views & transforms
  L5  algo/       analytics
  L6  tools/ cli  command-line utilities
"""

__version__ = "0.1.0"

from webgraph_tpu.graph.immutable_graph import ImmutableGraph, load, store
from webgraph_tpu.graph.csr import CSRGraph
