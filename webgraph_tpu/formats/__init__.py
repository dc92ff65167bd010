from webgraph_tpu.formats.bvgraph import BVGraph, BVGraphSettings
