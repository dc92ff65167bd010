#!/usr/bin/env python
"""BASELINE.json benchmark configs 1-5 (one JSON line per config).

  1. default compress + decompress, cnr-2000 (zeta_3, w=7, maxref=3)
  2. code sweep: gamma/delta/zeta_k residual coding x window 0 / 7
  3. deep reference chains + intervalization: synthetic deep-chain graph,
     maxref=inf, min-interval sweep (uk-2002 is not redistributable in-repo;
     the synthetic graph reproduces the regime: long same-prefix lists)
  4. transpose + Gray/lex permutation + recompress
  5. device random-access successor queries + adjacency (BatchQuery)
  6. er-200k synthetic streaming-kernel decode (second on-chip datapoint)

Configs 1-4 exercise the host compression pipeline (the production
compress path, optionally the native C++ codec); configs 5-6 run on
jax.devices().  Results MERGE into BENCH_CONFIGS.json keyed by config
(a partial run never destroys other configs' rows).

Usage: python scripts/bench_configs.py [1 2 3 4 5 6]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"
OUT = []


def emit(rec):
    print(json.dumps(rec), flush=True)
    OUT.append(rec)


def load_cnr():
    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.graph.csr import CSRGraph

    bv = BVGraph.load(CNR)
    off, succ = bvgraph_np.decode_to_csr(bv)
    return bv, CSRGraph(off, succ)


def time_store(g, tmp, **kw):
    from webgraph_tpu.formats.bvgraph import BVGraph

    base = os.path.join(tmp, "g")
    t0 = time.perf_counter()
    stats = BVGraph.store(g, base, **kw)
    dt = time.perf_counter() - t0
    return base, stats, dt


def config1():
    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.formats.bvgraph import BVGraph

    bv, g = load_cnr()
    m = g.num_arcs()
    with tempfile.TemporaryDirectory() as tmp:
        base, stats, enc_t = time_store(g, tmp, min_interval_length=3)
        bv2 = BVGraph.load(base)
        t0 = time.perf_counter()
        bvgraph_np.decode_to_csr(bv2)
        dec_t = time.perf_counter() - t0
        emit({
            "config": 1,
            "metric": "cnr-2000 default compress+decompress (host)",
            "encode_Medges_s": round(m / enc_t / 1e6, 2),
            "decode_Medges_s": round(m / dec_t / 1e6, 2),
            "bits_per_link": float(stats["bitsperlink"]),
        })


def config2():
    from webgraph_tpu.bits import codes as C
    from webgraph_tpu.formats.bvgraph import BVGraphSettings

    bv, g = load_cnr()
    m = g.num_arcs()
    rows = []
    for name, coding, k in (("gamma", C.GAMMA, 3), ("delta", C.DELTA, 3),
                            ("zeta3", C.ZETA, 3), ("zeta5", C.ZETA, 5)):
        for w in (0, 7):
            st = BVGraphSettings(
                window_size=w, max_ref_count=3 if w else 0,
                min_interval_length=3, zeta_k=k)
            st.codings["RESIDUALS"] = coding
            with tempfile.TemporaryDirectory() as tmp:
                base, stats, enc_t = time_store(g, tmp, settings=st)
                rows.append({
                    "residuals": name, "window": w,
                    "bits_per_link": float(stats["bitsperlink"]),
                    "encode_Medges_s": round(m / enc_t / 1e6, 2),
                })
    emit({"config": 2, "metric": "cnr-2000 code sweep (residual coding x window)",
          "rows": rows})


def deep_chain_graph(n=60000, period=37):
    from webgraph_tpu.graph.csr import CSRGraph

    lists = []
    for x in range(n // 2):
        lists.append(sorted(set(range(0, 1 + x % period))
                            | {n - 1 - (x % 5), n // 2 + (x % 97)}))
    return CSRGraph.from_lists(lists + [[]] * (n - n // 2))


def config3():
    g = deep_chain_graph()
    m = g.num_arcs()
    rows = []
    for minint in (0, 2, 4, 8):
        with tempfile.TemporaryDirectory() as tmp:
            base, stats, enc_t = time_store(
                g, tmp, window_size=7, max_ref_count=2**31 - 1,
                min_interval_length=minint)
            rows.append({
                "min_interval": minint,
                "bits_per_link": float(stats["bitsperlink"]),
                "avgref": float(stats.get("avgref", 0)),
                "encode_Medges_s": round(m / enc_t / 1e6, 2),
            })
    emit({"config": 3,
          "metric": "deep-chain synthetic (maxref=inf, minint sweep)",
          "n": g.num_nodes(), "m": m, "rows": rows})


def config4():
    from webgraph_tpu.transform.transform import (
        gray_code_permutation, lexicographical_permutation, map_graph,
        transpose)

    bv, g = load_cnr()
    m = g.num_arcs()
    t0 = time.perf_counter()
    gt = transpose(g)
    t_transpose = time.perf_counter() - t0
    rows = [{"step": "transpose", "Medges_s": round(m / t_transpose / 1e6, 2)}]
    for name, permfn in (("gray", gray_code_permutation),
                         ("lex", lexicographical_permutation)):
        t0 = time.perf_counter()
        perm = permfn(g)
        t_perm = time.perf_counter() - t0
        t0 = time.perf_counter()
        gp = map_graph(g, perm)
        t_map = time.perf_counter() - t0
        with tempfile.TemporaryDirectory() as tmp:
            base, stats, enc_t = time_store(gp, tmp, min_interval_length=3)
        rows.append({
            "step": f"{name}-permute+recompress",
            "perm_s": round(t_perm, 2), "map_s": round(t_map, 2),
            "encode_Medges_s": round(m / enc_t / 1e6, 2),
            "bits_per_link": float(stats["bitsperlink"]),
        })
    emit({"config": 4, "metric": "cnr-2000 transpose + permute + recompress",
          "rows": rows})


def config5():
    """Batched random access through the streaming (v6) kernel: one query
    ancestor-closure per lane, 1024 queries per invocation, verified
    against the host oracle (pallas/query2.py; reference successors(x)
    random access, BVGraph.java:853-888)."""
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.pallas import decode2 as D2
    from webgraph_tpu.pallas.query2 import QueryPlanner
    from webgraph_tpu.formats import bvgraph_np

    MULT = 2654435761
    bv = BVGraph.load(CNR)
    n = bv.num_nodes()
    toff, tsucc = bvgraph_np.decode_to_csr(bv)
    qp = QueryPlanner(bv)
    rng = np.random.default_rng(3)
    Q = 1024
    nodes = rng.integers(0, n, size=Q)
    cfg, meta, words, row_off, counts = qp.plan(nodes)
    fn = D2._compiled2(cfg, jax.default_backend() == "cpu")

    w = np.zeros((Q, cfg.slabw), dtype=np.uint32)
    expect = 0
    for i, x in enumerate(nodes):
        d = int(counts[i])
        pos = np.arange(d, dtype=np.uint64)
        wv = (((i * 131071 + pos) * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
        w[i, row_off[i] : row_off[i] + d] = wv
        expect = (expect + int((tsucc[toff[x] : toff[x] + d]
                                .astype(np.uint64)
                                * wv.astype(np.uint64)).sum())) & 0xFFFFFFFF

    @jax.jit
    def f(meta, words, w, salt):
        slab, wp, dbg, dump = fn(meta, words)
        return jnp.sum(slab.astype(jnp.uint32) * w,
                       dtype=jnp.uint32) + salt

    R = 8

    @jax.jit
    def fR(meta, words, w, salt):
        def body(i, acc):
            m2 = meta.at[31, 0, 0].set(salt + i)
            slab, wp, dbg, dump = fn(m2, words)
            return acc + jnp.sum(slab.astype(jnp.uint32) * w,
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

    m_j, w_j, ww_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
    s0 = int(np.uint32(f(m_j, w_j, ww_j, jnp.uint32(0))))
    assert s0 == expect, "query checksum mismatch"
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    over = (time.perf_counter() - t0) / 5
    expR = (R * expect) % (1 << 32)
    int(np.uint32(fR(m_j, w_j, ww_j, jnp.uint32(0))))
    best = float("inf")
    for rep in range(1, 6):
        t0 = time.perf_counter()
        s = int(np.uint32(fR(m_j, w_j, ww_j, jnp.uint32(rep * R))))
        assert s == expR
        best = min(best, time.perf_counter() - t0)
    eff = max((best - over) / R, 1e-9)
    emit({
        "config": 5,
        "metric": "batched random-access successors, streaming kernel "
                  "(cnr-2000, salted-checksum verified)",
        "backend": jax.default_backend(),
        "batch": Q,
        "ns_per_node": round(eff / Q * 1e9, 1),
        "nodes_per_s": round(Q / eff, 1),
    })


def _timed_streaming_decode(bv, toff, tsucc, reps=5):
    """Salted-checksum timing of a full streaming-kernel decode (the
    methodology of bench.py / CLAUDE.md); returns (seconds, plan)."""
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.pallas import decode2 as D2

    MULT = 2654435761
    cfg, plan, meta, words = D2.prepare2(bv)
    n, m = plan.n, plan.m
    fn = D2._compiled2(cfg, jax.default_backend() == "cpu")
    w = np.zeros((D2.LANES, cfg.slabw), dtype=np.uint32)
    d = np.diff(toff).astype(np.int64)
    gpos = np.arange(m, dtype=np.uint64)
    wv = ((gpos * MULT + 1) & 0xFFFFFFFF).astype(np.uint32)
    take = np.repeat(plan.prow[:n], d) + (gpos.astype(np.int64)
                                          - np.repeat(toff[:n], d))
    w.reshape(-1)[take] = wv
    expect = int((tsucc.astype(np.uint64) * wv.astype(np.uint64)).sum()
                 & 0xFFFFFFFF)

    @jax.jit
    def f(meta, words, w, salt):
        slab, wp, dbg, dump = fn(meta, words)
        return jnp.sum(slab.astype(jnp.uint32) * w,
                       dtype=jnp.uint32) + salt, wp

    R = 8

    @jax.jit
    def fR(meta, words, w, salt):
        def body(i, acc):
            m2 = meta.at[31, 0, 0].set(salt + i)
            slab, wp, dbg, dump = fn(m2, words)
            return acc + jnp.sum(slab.astype(jnp.uint32) * w,
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, R, body, jnp.uint32(0))

    m_j, w_j, ww_j = jnp.asarray(meta), jnp.asarray(words), jnp.asarray(w)
    s0, wp = f(m_j, w_j, ww_j, jnp.uint32(0))
    assert np.array_equal(np.asarray(wp).reshape(-1), plan.exp_wp)
    assert int(np.uint32(s0)) == expect
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    over = (time.perf_counter() - t0) / 5
    expR = (R * expect) % (1 << 32)
    int(np.uint32(fR(m_j, w_j, ww_j, jnp.uint32(0))))  # compile
    best = 1e9
    for rep in range(1, reps + 1):
        t0 = time.perf_counter()
        s = int(np.uint32(fR(m_j, w_j, ww_j, jnp.uint32(rep * R))))
        assert s == expR
        best = min(best, time.perf_counter() - t0)
    return max((best - over) / R, 1e-9), plan


def config6():
    """Second on-chip decode datapoint: er-200k synthetic (near-zero copy
    chains — the kernel's balanced-input ceiling), streaming kernel,
    salted-checksum verified."""
    import jax

    from webgraph_tpu.formats import bvgraph_np
    from webgraph_tpu.formats.bvgraph import BVGraph
    from webgraph_tpu.graph.builders import MutableGraph

    base = "/tmp/er200k/g"
    if not os.path.exists(base + ".graph"):
        os.makedirs("/tmp/er200k", exist_ok=True)
        g = MutableGraph.erdos_renyi(200_000, m=2_000_000, seed=42)
        BVGraph.store(g, base)
    bv = BVGraph.load(base)
    toff, tsucc = bvgraph_np.decode_to_csr(bv)
    eff, plan = _timed_streaming_decode(bv, toff, tsucc)
    emit({
        "config": 6,
        "metric": "er-200k synthetic decode, streaming kernel (second "
                  "on-chip datapoint; salted-checksum verified)",
        "backend": jax.default_backend(),
        "n": plan.n, "m": plan.m,
        "decode_ms": round(eff * 1e3, 2),
        "decode_Medges_s": round(plan.m / eff / 1e6, 1),
    })


def _dispatch_overhead():
    import jax
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    return (time.perf_counter() - t0) / 5


def _timed_salted(build_fn, expect, reps=5):
    """Compile build_fn(salt)->uint32 scalar; verify == expect+salt; return
    best-of-reps seconds minus dispatch overhead."""
    import jax
    import numpy as np

    f = jax.jit(build_fn)
    s0 = int(np.uint32(f(0)))
    assert s0 == expect % (1 << 32), (s0, expect)
    over = _dispatch_overhead()
    best = 1e9
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        s = int(np.uint32(f(r)))
        assert s == (expect + r) % (1 << 32)
        best = min(best, time.perf_counter() - t0)
    return max(best - over, 1e-9)


def config7():
    """On-chip analytics at cnr-2000 scale (VERDICT r4 item 3): device BFS,
    one 64-source bit-parallel NF batch (batch loop inside the jit), device
    geometric-centralities batch, and a SumSweep diameter certification
    with device sweeps.  All verified against host oracles.
    Reference anchors: ParallelBreadthFirstVisit.java:79,
    NeighbourhoodFunction.java:100, GeometricCentralities.java:94-96,
    SumSweepDirectedDiameterRadius.java:1037."""
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.algo import bfs as hbfs
    from webgraph_tpu.algo.device import (
        DeviceCSR, make_geometric_batches, make_nf_batches)
    from webgraph_tpu.graph.csr import CSRGraph

    bv, g = load_cnr()
    n, m = g.num_nodes(), g.num_arcs()
    print("config7: graph loaded", flush=True)
    csr = DeviceCSR.from_graph(g)
    rows = []

    # --- device BFS: distances from one source, salted by source --------
    sources = [0, 17, 1000, 77, 12345, 4242]
    hostsum = {s: int(np.int64(hbfs.bfs_distances(g, s).sum()) & 0xFFFFFFFF)
               for s in sources}
    print("config7: host BFS truths done", flush=True)
    ncap = 256
    src_j, dst_j = csr.src, csr.dst

    def bfs_run(salt):
        s = jnp.asarray(sources, dtype=jnp.int32)[salt % len(sources)]
        dist = jnp.full(n, -1, dtype=jnp.int32).at[s].set(0)
        front = jnp.zeros(n, dtype=jnp.int32).at[s].set(1)

        def cond(st):
            return (jnp.max(st[1]) > 0) & (st[2] < ncap)

        def body(st):
            dist, front, level = st
            hit = jnp.zeros(n, dtype=jnp.int32).at[dst_j].max(front[src_j])
            newf = (hit > 0) & (dist < 0)
            dist = jnp.where(newf, level + 1, dist)
            return dist, newf.astype(jnp.int32), level + 1

        dist, _, _ = jax.lax.while_loop(cond, body, (dist, front,
                                                     jnp.int32(0)))
        return jnp.sum(dist).astype(jnp.uint32) + jnp.uint32(0)

    # verify each source's distance sum, then time (distinct source per rep)
    f = jax.jit(bfs_run)
    print("config7: compiling device BFS...", flush=True)
    for i, s in enumerate(sources):
        assert int(np.uint32(f(i))) == hostsum[s] % (1 << 32), f"src {s}"
    over = _dispatch_overhead()
    best = 1e9
    for r in range(len(sources)):
        t0 = time.perf_counter()
        int(np.uint32(f(r)))
        best = min(best, time.perf_counter() - t0)
    t_bfs = max(best - over, 1e-9)
    rows.append({"op": "device BFS (1 source, full distances)",
                 "ms": round(t_bfs * 1e3, 2),
                 "Medges_s_per_level_sweep": None,
                 "note": "arc-parallel level-synchronous; verified vs host "
                         "BFS distance sums for 6 sources"})

    # --- 64-source NF batch (fori inside jit) --------------------------
    print("config7: device BFS timed", flush=True)
    run_nf = make_nf_batches(csr, ncap)
    srcs0 = np.arange(64)
    hd = [hbfs.bfs_distances(g, s) for s in srcs0]
    exp_counts = np.zeros(ncap + 1, dtype=np.int64)
    for dvec in hd:
        reach = dvec[dvec >= 0]
        bc = np.bincount(reach, minlength=ncap + 1)[: ncap + 1]
        exp_counts += np.cumsum(bc)
    nb_timed = 4
    counts, _ = run_nf(jnp.int32(0), nb_timed)  # ONE compiled shape
    got = np.asarray(counts[0], dtype=np.int64)
    assert np.array_equal(got, exp_counts), "NF batch != 64 host BFS"
    over = _dispatch_overhead()
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        c, _ = run_nf(jnp.int32((r + 1) * nb_timed), nb_timed)
        np.asarray(c[0, 0])
        best = min(best, time.perf_counter() - t0)
    t_nf = max((best - over) / nb_timed, 1e-9)
    rows.append({"op": "exact-NF 64-source bit-parallel batch",
                 "ms_per_batch": round(t_nf * 1e3, 2),
                 "batches_for_full_exact_NF": (n + 63) // 64,
                 "projected_full_exact_NF_s": round(t_nf * ((n + 63) // 64),
                                                    1),
                 "note": "batch loop inside ONE jit (fori); verified vs 64 "
                         "host BFS"})

    # --- geometric-centralities batch ----------------------------------
    print("config7: NF batch timed", flush=True)
    run_geo = make_geometric_batches(csr, ncap, 0.5)
    r0, d0, h0, e0 = run_geo(jnp.int32(0), nb_timed)  # ONE compiled shape
    exp_reach = np.array([int((dv > 0).sum()) for dv in hd])
    exp_sumd = np.array([int(dv[dv > 0].sum()) for dv in hd])
    assert np.array_equal(np.asarray(r0)[:64], exp_reach)
    assert np.array_equal(np.asarray(d0)[:64], exp_sumd)
    over = _dispatch_overhead()
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        rr, dd, hh, ee = run_geo(jnp.int32((r + 1) * nb_timed), nb_timed)
        np.asarray(rr[0])
        best = min(best, time.perf_counter() - t0)
    t_geo = max((best - over) / nb_timed, 1e-9)
    rows.append({"op": "geometric centralities 64-source batch "
                       "(closeness/harmonic/lin/exp/reachable)",
                 "ms_per_batch": round(t_geo * 1e3, 2),
                 "projected_all_nodes_s": round(t_geo * ((n + 63) // 64), 1),
                 "note": "verified vs host per-source BFS moments"})

    # --- SumSweep diameter certification (device sweeps) ---------------
    from webgraph_tpu.algo.sumsweep import (
        OutputLevel, SumSweepDirectedDiameterRadius)

    print("config7: geo batch timed; SumSweep...", flush=True)
    t0 = time.perf_counter()
    ss = SumSweepDirectedDiameterRadius(g, OutputLevel.DIAMETER,
                                        use_device=True)
    ss.compute()
    t_ss = time.perf_counter() - t0
    assert ss.get_diameter() == 84  # cnr-2000 ground truth
    rows.append({"op": "SumSweep exact diameter certification "
                       "(device BFS sweeps)",
                 "s": round(t_ss, 1), "diameter": int(ss.get_diameter()),
                 "iterations": int(ss.iterations),
                 "note": "multi-dispatch host loop driving device sweeps; "
                         "~27 ms dispatch+fetch overhead each on this "
                         "backend"})

    emit({"config": 7,
          "metric": "cnr-2000 analytics ON CHIP (oracle-verified)",
          "backend": __import__("jax").default_backend(),
          "n": n, "m": m, "rows": rows})


def config8():
    """Device encoder + device transform timings on cnr-2000 (VERDICT r4
    items 5-6): the compute side of encode_device (cost pass + greedy
    selection + emission) and the device transpose/permute-apply pipelines,
    salted-checksum verified.  Reference anchors: BVGraph.java:2436-2650
    (parallel store), Transform.java:964-1052 (transpose)."""
    import jax
    import jax.numpy as jnp

    from webgraph_tpu.formats import bvgraph_jax_encode as E
    from webgraph_tpu.transform.device import (
        map_arcs_device, transpose_arcs_device)
    from webgraph_tpu.transform import transform as T

    bv, g = load_cnr()
    n, m = g.num_nodes(), g.num_arcs()
    offsets, succ = g.to_csr()
    rows = []

    # --- device encode (compute side; bytes verified once) -------------
    s = bv.settings
    off_j = jnp.asarray(np.asarray(offsets, dtype=np.int32))
    sc_j = jnp.asarray(np.asarray(succ, dtype=np.int32))
    d_host = np.diff(offsets).astype(np.int64)
    src_j = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), d_host))
    iters = max(int(d_host.max()).bit_length(), 1)
    skey = E.skey_of(s)
    costs, valid = E.compute_costs(off_j, sc_j, src_j, skey, iters, 0)
    refs, depths = E.select_references(costs, valid, skey)
    tb, tblk, tiv, tres = (int(v) for v in E.plan_sizes(
        off_j, sc_j, src_j, refs, skey, iters, 0))
    words, starts, stats_vec, _sh, _rh = E.emit_graph(
        off_j, sc_j, src_j, refs, depths, skey, iters, 0, tb, tblk, tiv,
        tres)
    ref_gb = open(CNR + ".graph", "rb").read()
    got = np.asarray(words).astype(">u4").tobytes()[: (tb + 7) // 8]
    assert got == ref_gb, "device encode != fixture bytes"
    wsum = int(np.asarray(words, dtype=np.uint64).sum() & 0xFFFFFFFF)

    def enc_run(salt):
        c2, v2 = E.compute_costs(off_j, sc_j, src_j, skey, iters, 0)
        r2, dp2 = E.select_references(c2, v2, skey)
        w2, st2, sv2, _a, _b = E.emit_graph(
            off_j, sc_j, src_j, r2, dp2, skey, iters, 0, tb, tblk, tiv,
            tres)
        return jnp.sum(w2.astype(jnp.uint32)).astype(jnp.uint32) \
            + jnp.uint32(salt)

    t_enc = _timed_salted(enc_run, wsum, reps=3)
    rows.append({"op": "device encode (cost pass + selection + emission)",
                 "ms": round(t_enc * 1e3, 1),
                 "Medges_s": round(m / t_enc / 1e6, 2),
                 "note": "output words byte-verified against the cnr-2000 "
                         "fixture"})

    # --- device transpose ----------------------------------------------
    src_a = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32),
                                  d_host))
    dst_a = jnp.asarray(np.asarray(succ, dtype=np.int32))
    toff_h, tsucc_h = T.transpose(g).to_csr()
    wv = ((np.arange(m, dtype=np.uint64) * 2654435761 + 1)
          & 0xFFFFFFFF).astype(np.uint32)
    texp = int((tsucc_h.astype(np.uint64) * wv).sum() & 0xFFFFFFFF)
    wv_j = jnp.asarray(wv)

    RT = 16

    def tr_run(salt):
        # RT transposes inside one program; each iteration sorts a ROLLED
        # copy of the arc array (same sorted result, so the checksum stays
        # verifiable, but XLA cannot hoist the sort out of the loop) —
        # one transpose is far below the ~27 ms dispatch noise
        def body(i, acc):
            s_i = jnp.roll(src_a, i + salt)
            d_i = jnp.roll(dst_a, i + salt)
            off_d, succ_d = transpose_arcs_device(s_i, d_i, 0, n)
            return acc + jnp.sum(succ_d.astype(jnp.uint32) * wv_j,
                                 dtype=jnp.uint32)
        return jax.lax.fori_loop(0, RT, body,
                                 jnp.uint32(0)) + jnp.uint32(salt)

    t_tr = _timed_salted(tr_run, (RT * texp) % (1 << 32), reps=3) / RT
    rows.append({"op": "device transpose (sort + dedup-free CSR assembly)",
                 "ms": round(t_tr * 1e3, 2),
                 "Medges_s": round(m / t_tr / 1e6, 1),
                 "note": "position-weighted checksum vs host transpose; "
                         "16 in-program reps (roll-perturbed inputs)"})

    # --- device gray-permutation apply ----------------------------------
    perm = T.gray_code_permutation(g)
    gp = T.map_graph(g, perm)
    poff_h, psucc_h = gp.to_csr()
    pexp = int((psucc_h.astype(np.uint64) * wv[: len(psucc_h)]).sum()
               & 0xFFFFFFFF)
    perm_j = jnp.asarray(perm.astype(np.int32))

    def mp_run(salt):
        off_d, succ_d, mm = map_arcs_device(src_a, dst_a, perm_j, n)
        pos = jnp.arange(succ_d.shape[0])
        w = jnp.where(pos < mm, wv_j[jnp.minimum(pos, m - 1)], 0)
        return jnp.sum(succ_d.astype(jnp.uint32) * w,
                       dtype=jnp.uint32) + jnp.uint32(salt)

    t_mp = _timed_salted(mp_run, pexp, reps=5)
    rows.append({"op": "device gray-permutation apply (map + dedup + CSR)",
                 "ms": round(t_mp * 1e3, 2),
                 "Medges_s": round(m / t_mp / 1e6, 1),
                 "note": "gray keys are host planning; apply/dedup/CSR on "
                         "device; checksum vs host map_graph"})

    # --- EFGraph device paths -------------------------------------------
    from webgraph_tpu.formats.efgraph import EFGraph
    from webgraph_tpu.formats import efgraph_jax as EFJ

    ef_base = "/tmp/cnr2000-ef/g"
    if not os.path.exists(ef_base + ".graph"):
        os.makedirs("/tmp/cnr2000-ef", exist_ok=True)
        EFGraph.store(g, ef_base)
    ef = EFGraph.load(ef_base)
    idxs = ef.structure_index()
    eoff = np.concatenate([[0], np.cumsum(idxs["d"])])
    # bit-parallel device decode, checksum-verified against host CSR
    w32 = EFJ._w32_of(ef)
    nbits = (len(w32) - 2) * 32
    fn_ef = EFJ.make_bitparallel_decode(n, nbits, m)
    args_ef = (jnp.asarray(w32),
               jnp.asarray(ef.bit_offsets[:n].astype(np.int32)),
               jnp.asarray(idxs["d"].astype(np.int32)),
               jnp.asarray(idxs["l"].astype(np.int32)),
               jnp.asarray(idxs["lower_base"].astype(np.int32)),
               jnp.asarray(idxs["upper_base"].astype(np.int32)),
               jnp.asarray(eoff[:n].astype(np.int32)))
    eexp = int((np.asarray(succ, dtype=np.uint64)
                * wv.astype(np.uint64)).sum() & 0xFFFFFFFF)

    def ef_run(salt):
        sd = fn_ef(*args_ef)
        return jnp.sum(sd.astype(jnp.uint32) * wv_j,
                       dtype=jnp.uint32) + jnp.uint32(salt)

    t_ef = _timed_salted(ef_run, eexp, reps=3)
    rows.append({"op": "EFGraph bit-parallel device decode",
                 "ms": round(t_ef * 1e3, 2),
                 "Medges_s": round(m / t_ef / 1e6, 1),
                 "note": "every stream bit classified in parallel; "
                         "checksum vs host CSR (EFGraph.java:1064-1166)"})

    # batched device skip_to (adjacency; EFGraph.java:1147)
    rng = np.random.default_rng(5)
    Q = 4096
    xs = rng.integers(0, n, size=Q).astype(np.int32)
    bnds = rng.integers(0, n, size=Q).astype(np.int32)
    host_sk = ef.skip_to_batch(xs, bnds)
    fn_sk = EFJ.make_skip_to_batch(ef)
    sexp = int((host_sk.astype(np.uint64)
                * wv[:Q].astype(np.uint64)).sum() & 0xFFFFFFFF)
    xs_j, bn_j = jnp.asarray(xs), jnp.asarray(bnds)
    wq_j = jnp.asarray(wv[:Q])

    def sk_run(salt):
        out = fn_sk(xs_j, bn_j)
        return jnp.sum(out.astype(jnp.uint32) * wq_j,
                       dtype=jnp.uint32) + jnp.uint32(salt)

    t_sk = _timed_salted(sk_run, sexp, reps=5)
    rows.append({"op": "EFGraph batched device skip_to (adjacency)",
                 "batch": Q,
                 "ns_per_query": round(t_sk / Q * 1e9, 1),
                 "queries_per_s": round(Q / t_sk, 0),
                 "note": "skip pointers + bounded lockstep unary scan; "
                         "verified vs host skip_to_batch"})

    emit({"config": 8,
          "metric": "cnr-2000 device encode + device transforms + EFGraph "
                    "ON CHIP (verified)",
          "backend": __import__("jax").default_backend(),
          "n": n, "m": m, "rows": rows})


def main():
    which = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6, 7, 8]
    for c in which:
        globals()[f"config{c}"]()
    # merge-update keyed by config: never destroy rows from other runs
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_CONFIGS.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    merged[rec.get("config")] = rec
    for rec in OUT:
        merged[rec.get("config")] = rec
    with open(path, "w") as f:
        for key in sorted(merged, key=lambda k: (k is None, k)):
            f.write(json.dumps(merged[key]) + "\n")


if __name__ == "__main__":
    main()
