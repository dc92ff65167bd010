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

import pytest

CNR2000_BASENAME = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"


def cnr2000_available() -> bool:
    return os.path.exists(CNR2000_BASENAME + ".graph")


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Free compiled-executable state between test modules.

    The XLA CPU compiler segfaults non-deterministically (deep inside
    backend_compile_and_load) once a single process has accumulated enough
    compiled programs — reproduced only when the whole suite runs in order,
    never in any module subset.  Dropping the jit caches (and the Pallas
    kernel cache, which pins its executables through an lru_cache) after
    each module keeps the process below the trigger threshold."""
    yield
    import jax

    try:
        from webgraph_tpu.pallas import decode as _pd

        _pd._compiled.cache_clear()
    except Exception:
        pass
    jax.clear_caches()
