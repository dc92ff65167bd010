from webgraph_tpu.algo.bfs import ParallelBreadthFirstVisit, bfs_distances
from webgraph_tpu.algo.components import ConnectedComponents, StronglyConnectedComponents
from webgraph_tpu.algo.hll import HyperLogLogCounterArray
from webgraph_tpu.algo.hyperball import HyperBall
from webgraph_tpu.algo.nf import NeighbourhoodFunction
from webgraph_tpu.algo.approx_nf import ApproximateNeighbourhoodFunctions
from webgraph_tpu.algo.sumsweep import SumSweepDirectedDiameterRadius, SumSweepUndirectedDiameterRadius
from webgraph_tpu.algo.diameter import FourSweepIterativeFringeDiameter
from webgraph_tpu.algo.centralities import (
    GeometricCentralities,
    LinearGeometricCentrality,
    TopKGeometricCentrality,
    BetweennessCentrality,
    SampleDistanceCumulativeDistributionFunction,
)
from webgraph_tpu.bits.elias_fano import CumulativeSequence as EliasFanoCumulativeOutdegreeList
