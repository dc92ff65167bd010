"""Producer/consumer graph feeding (reference analog:
IncrementalImmutableSequentialGraph.java:54): an external pipeline ``add``s
successor arrays through a bounded queue while a consumer (e.g.
``BVGraph.store``) iterates the graph; ``add(END_OF_GRAPH)`` terminates."""

from __future__ import annotations

import queue
import threading

import numpy as np

from webgraph_tpu.graph.immutable_graph import ImmutableGraph, NodeIterator

#: sentinel terminating the graph (reference END_OF_GRAPH, :56)
END_OF_GRAPH = None


class IncrementalImmutableSequentialGraph(ImmutableGraph):
    def __init__(self, capacity: int = 1024):
        self._queue: queue.Queue = queue.Queue(maxsize=capacity)
        self._done = threading.Event()

    def add(self, successors) -> None:
        """Feed the next node's successor array; pass END_OF_GRAPH (None)
        to finish."""
        if successors is END_OF_GRAPH:
            self._queue.put(END_OF_GRAPH)
            return
        self._queue.put(np.asarray(successors, dtype=np.int32))

    def num_nodes(self) -> int:
        raise NotImplementedError("node count is unknown until the stream ends")

    def num_arcs(self) -> int:
        raise NotImplementedError

    def random_access(self) -> bool:
        return False

    def node_iterator(self, start: int = 0) -> NodeIterator:
        if start != 0:
            raise ValueError("incremental graphs are sequential-only")
        g = self

        class _It(NodeIterator):
            def __init__(self):
                self._curr = -1
                self._succ = None
                self._next_item = g._queue.get()

            def has_next(self):
                return self._next_item is not END_OF_GRAPH

            def next_int(self):
                if not self.has_next():
                    raise StopIteration
                self._succ = self._next_item
                self._curr += 1
                self._next_item = g._queue.get()
                return self._curr

            def outdegree(self):
                return len(self._succ)

            def successor_array(self):
                return self._succ

        return _It()
