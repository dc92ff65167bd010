"""Device HyperBall vs host HyperBall: exact register equality, plus the
sharded multi-device step on the virtual CPU mesh."""

import numpy as np
import pytest

from webgraph_tpu.algo.hyperball import HyperBall
from webgraph_tpu.graph.builders import MutableGraph

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webgraph_tpu.algo.hyperball_jax import HyperBallJax, make_sharded_step  # noqa: E402


def test_device_matches_host():
    g = MutableGraph.erdos_renyi(200, 0.04, seed=11)
    host = HyperBall(g, log2m=5, seed=3, systolic_threshold=-1)
    dev = HyperBallJax(g, log2m=5, seed=3)
    for it in range(6):
        host.iterate()
        dev.iterate()
        np.testing.assert_array_equal(
            np.asarray(dev.registers), host.counters.registers, err_msg=f"iteration {it}"
        )
    assert np.allclose(dev.neighbourhood_function, host.neighbourhood_function, rtol=1e-5)


def test_sharded_step_matches_single():
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    per = 32
    n = per * n_dev
    g = MutableGraph.erdos_renyi(n, 0.02, seed=5)
    dev = HyperBallJax(g, log2m=4, seed=1)
    regs0 = dev.registers

    # build shard-local arc arrays (sources local, padded to equal length)
    offsets, succ = g.to_csr()
    src = np.repeat(np.arange(n, dtype=np.int32), np.diff(offsets))
    dst = succ.astype(np.int32)
    shard_arcs = []
    for s in range(n_dev):
        mask = (src >= s * per) & (src < (s + 1) * per)
        shard_arcs.append((src[mask] - s * per, dst[mask]))
    A = max(len(a[0]) for a in shard_arcs)
    src_p = np.zeros((n_dev, A), dtype=np.int32)
    dst_p = np.zeros((n_dev, A), dtype=np.int32)
    for s, (a, b) in enumerate(shard_arcs):
        src_p[s, : len(a)] = a
        dst_p[s, : len(b)] = b
        # pad with self-referential no-op arcs: src 0 gathering dst of its own
        # first successor would corrupt; instead pad with (0, global id of
        # shard node 0) so max(regs[0], regs[0]) is a no-op
        src_p[s, len(a) :] = 0
        dst_p[s, len(b) :] = s * per
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("nodes",))
    step = make_sharded_step(mesh, per, n)
    out = step(regs0, jnp.asarray(src_p), jnp.asarray(dst_p))

    expect, _ = __import__("webgraph_tpu.algo.hyperball_jax", fromlist=["hyperball_step"]).hyperball_step(
        regs0, dev.arc_src, dev.arc_dst, n
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))
