from webgraph_tpu.tools.stats import Stats
from webgraph_tpu.tools.check import Check
from webgraph_tpu.tools.speed_test import SpeedTest
