"""THE benchmark harness (reference analog: test/SpeedTest.java:44-189):
sequential enumeration (ns/link via bulk decode), random-access (ns/node via
``successors``), adjacency queries (ns/pair via ``skip_to``/binary search),
with 3 warmup + 10 timed repetitions."""

from __future__ import annotations

import time

import numpy as np

from webgraph_tpu.graph.immutable_graph import ImmutableGraph
from webgraph_tpu.utils.rng import XoRoShiRo128PlusRandom

WARMUP = 3
REPEAT = 10


class SpeedTest:
    @staticmethod
    def sequential(graph: ImmutableGraph, warmup: int = WARMUP,
                   repeat: int = REPEAT, backend: str | None = None) -> dict:
        """Full sequential enumeration; ns/link.  ``backend`` selects the
        decode path (device/native/numpy/scalar — BVGraph.to_csr dispatch;
        default auto: the streaming kernel on an accelerator host)."""
        m = graph.num_arcs()
        times = []
        for rep in range(warmup + repeat):
            t0 = time.perf_counter()
            try:
                offsets, succ = graph.to_csr(backend=backend)
            except TypeError:  # formats without backend dispatch
                offsets, succ = graph.to_csr()
            dt = time.perf_counter() - t0
            if rep >= warmup:
                times.append(dt)
        best = min(times)
        return {"seconds": best, "ns_per_link": 1e9 * best / max(m, 1),
                "links": m, "backend": backend or "auto"}

    @staticmethod
    def random_access_batched(graph, samples: int, seed: int = 0,
                              warmup: int = 1, repeat: int = 3) -> dict:
        """Batched random access through the streaming kernel
        (pallas/query2.py): up to 1024 successors(x) queries per kernel
        invocation — the device analog of the reference's per-node
        successors() loop (SpeedTest.java:90-122)."""
        from webgraph_tpu.pallas.query2 import QueryPlanner

        rng = XoRoShiRo128PlusRandom(seed)
        n = graph.num_nodes()
        nodes = np.asarray([rng.next_int(n) for _ in range(samples)])
        qp = QueryPlanner(graph)
        times = []
        links = 0
        for rep in range(warmup + repeat):
            t0 = time.perf_counter()
            links = 0
            for base in range(0, samples, 1024):
                res = qp.successors_batch(nodes[base : base + 1024])
                links += sum(len(r) for r in res)
            dt = time.perf_counter() - t0
            if rep >= warmup:
                times.append(dt)
        best = min(times)
        return {
            "seconds": best,
            "ns_per_node": 1e9 * best / max(samples, 1),
            "links": links,
            "batched": True,
        }

    @staticmethod
    def random_access(graph: ImmutableGraph, samples: int, seed: int = 0, warmup: int = WARMUP, repeat: int = REPEAT) -> dict:
        """Decode ``samples`` random successor lists; ns/node and ns/link."""
        rng = XoRoShiRo128PlusRandom(seed)
        n = graph.num_nodes()
        nodes = [rng.next_int(n) for _ in range(samples)]
        times = []
        links = 0
        for rep in range(warmup + repeat):
            links = 0
            t0 = time.perf_counter()
            for x in nodes:
                links += len(graph.successors(x))
            dt = time.perf_counter() - t0
            if rep >= warmup:
                times.append(dt)
        best = min(times)
        return {
            "seconds": best,
            "ns_per_node": 1e9 * best / max(samples, 1),
            "ns_per_link": 1e9 * best / max(links, 1),
            "links": links,
        }

    @staticmethod
    def adjacency(graph: ImmutableGraph, samples: int, seed: int = 0, warmup: int = WARMUP, repeat: int = REPEAT) -> dict:
        """Random adjacency queries (x, y); ns/pair. Uses ``skip_to`` when
        the format provides it (EFGraph), else sorted-array search."""
        rng = XoRoShiRo128PlusRandom(seed)
        n = graph.num_nodes()
        pairs = [(rng.next_int(n), rng.next_int(n)) for _ in range(samples)]
        use_skip = hasattr(graph, "skip_to")
        times = []
        hits = 0
        for rep in range(warmup + repeat):
            hits = 0
            t0 = time.perf_counter()
            if use_skip:
                for x, y in pairs:
                    hits += graph.skip_to(x, y) == y
            else:
                for x, y in pairs:
                    s = graph.successors(x)
                    i = np.searchsorted(s, y)
                    hits += bool(i < len(s) and s[i] == y)
            dt = time.perf_counter() - t0
            if rep >= warmup:
                times.append(dt)
        best = min(times)
        return {"seconds": best, "ns_per_pair": 1e9 * best / max(samples, 1), "hits": hits}
