"""Multi-chip execution: node-range sharding of BVGraph streams over a
`jax.sharding.Mesh` (shard_map + SPMD decode bodies).

The reference framework is single-JVM multithreaded (SURVEY.md §5.8); its
`splitNodeIterators` node ranges (ImmutableGraph.java:379-409) map here to
mesh-sharded node ranges whose reference windows are primed across shard
boundaries (BVGraph.java:1173-1183 analog).
"""

from webgraph_tpu.parallel.shard import (  # noqa: F401
    ShardPlan,
    decode_to_csr_sharded,
    plan_node_shards,
)
