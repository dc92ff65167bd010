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


def test_device_accumulators_match_host():
    """Closeness / harmonic / discounted accumulators + node weights
    (HyperBall.java:949-968, :259): same register evolution, centrality
    accumulators equal to the host's up to float rounding."""
    g = MutableGraph.erdos_renyi(150, 0.05, seed=2)
    w = np.linspace(0.5, 2.0, 150)
    disc = [lambda t: 0.5**t]
    host = HyperBall(
        g, log2m=5, seed=7, weights=w, do_sum_of_distances=True,
        do_sum_of_inverse_distances=True, discount_functions=disc,
        systolic_threshold=-1,
    )
    dev = HyperBallJax(
        g, log2m=5, seed=7, weights=w, do_sum_of_distances=True,
        do_sum_of_inverse_distances=True, discount_functions=disc,
    )
    host.run(10)
    dev.run(10)
    np.testing.assert_array_equal(np.asarray(dev.registers), host.counters.registers)
    assert np.allclose(dev.neighbourhood_function, host.neighbourhood_function, rtol=1e-5)
    assert np.allclose(dev.closeness_centrality(), host.closeness_centrality(), rtol=1e-4)
    assert np.allclose(dev.harmonic_centrality(), host.harmonic_centrality(), rtol=1e-4)
    assert np.allclose(
        np.asarray(dev.discounted_centralities[0]),
        host.discounted_centralities[0], rtol=1e-4,
    )


def test_systolic_masking_matches_dense():
    """Systolic arc masking (HyperBall.java:981-991) must not change the
    register evolution."""
    g = MutableGraph.erdos_renyi(180, 0.03, seed=4)
    from webgraph_tpu.transform.transform import transpose

    dense = HyperBallJax(g, log2m=4, seed=9)
    syst = HyperBallJax(g, transpose=transpose(g), log2m=4, seed=9,
                        systolic_threshold=1.1)  # always masked
    went_systolic = False
    for _ in range(8):
        dense.iterate()
        syst.iterate()
        went_systolic |= syst.last_systolic
        np.testing.assert_array_equal(
            np.asarray(dense.registers), np.asarray(syst.registers))
        if dense.modified_counters() == 0:
            break
    assert went_systolic


def test_halo_exchange_sharded_step():
    """Halo-exchange sharded step: same registers as the dense step, with
    exchange traffic bounded by the register cut (not n_total)."""
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    from webgraph_tpu.algo.hyperball_jax import hyperball_step, plan_halo

    per = 32
    n = per * n_dev
    # mostly-local graph: ring of blocks with a few cross-shard arcs
    rng = np.random.default_rng(3)
    src_list, dst_list = [], []
    for s in range(n_dev):
        a = rng.integers(s * per, (s + 1) * per, 150)
        b = rng.integers(s * per, (s + 1) * per, 150)
        src_list.append(a)
        dst_list.append(b)
        # 10 cross arcs to the next shard
        src_list.append(rng.integers(s * per, (s + 1) * per, 10))
        dst_list.append(rng.integers(((s + 1) % n_dev) * per,
                                     (((s + 1) % n_dev) + 1) * per, 10))
    from webgraph_tpu.graph.csr import CSRGraph

    src = np.concatenate(src_list).astype(np.int64)
    dst = np.concatenate(dst_list).astype(np.int64)
    g = CSRGraph.from_arcs(src, dst, n=n, dedup=True)
    dev = HyperBallJax(g, log2m=4, seed=1)
    regs0 = dev.registers
    src = np.asarray(dev.arc_src)
    dst = np.asarray(dev.arc_dst)

    plan = plan_halo(n, n_dev, src, dst)
    assert plan.cut <= 10 * n_dev  # traffic ∝ cut, nowhere near n
    src_p = np.zeros((n_dev, 1), dtype=np.int32)
    # build per-shard padded arc arrays with remapped dst
    shard = src // per
    A = max(int((shard == s).sum()) for s in range(n_dev))
    src_p = np.zeros((n_dev, A), dtype=np.int32)
    dst_p = np.zeros((n_dev, A), dtype=np.int32)
    for s in range(n_dev):
        sel = np.flatnonzero(shard == s)
        src_p[s, : len(sel)] = src[sel] - s * per
        dst_p[s, : len(sel)] = plan.arc_remap[s]
        src_p[s, len(sel):] = 0
        dst_p[s, len(sel):] = 0  # local row 0: no-op max with itself

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("nodes",))
    step = make_sharded_step(mesh, per, n, plan=plan)
    out = step(regs0, np.asarray(src_p), np.asarray(dst_p))
    expect, _ = hyperball_step(regs0, dev.arc_src, dev.arc_dst, n)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))
