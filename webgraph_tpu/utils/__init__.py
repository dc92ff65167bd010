from webgraph_tpu.utils.progress import ProgressLogger
from webgraph_tpu.utils.rng import XoRoShiRo128PlusRandom
