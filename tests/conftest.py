"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: the environment pre-sets JAX_PLATFORMS=axon (single tunneled TPU chip,
exclusive access — concurrent processes block each other), so we must
*override*, not setdefault. The axon PJRT plugin is registered by
sitecustomize regardless; selecting the cpu platform here sidesteps it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

CNR2000_BASENAME = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"


def cnr2000_available() -> bool:
    return os.path.exists(CNR2000_BASENAME + ".graph")
