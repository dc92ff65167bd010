"""Command-line interface (reference analog: the per-class JSAP ``main``s,
e.g. BVGraph.java:2680-2777, Transform.java:2582-2964, HyperBall.java:1353,
Stats.java, SpeedTest.java).

Usage: ``python -m webgraph_tpu <command> ...``; every command mirrors the
reference tool of the same name.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load(basename: str, fmt: str | None = None, offline: bool = False):
    from webgraph_tpu.graph import immutable_graph as ig

    if fmt == "ascii":
        from webgraph_tpu.formats.ascii import ASCIIGraph

        return ASCIIGraph.load(basename)
    if fmt == "arclist":
        from webgraph_tpu.formats.ascii import ArcListASCIIGraph

        return ArcListASCIIGraph.load(basename)
    method = ig.LoadMethod.OFFLINE if offline else ig.LoadMethod.STANDARD
    return ig.load(basename, method)


def cmd_bvgraph(args):
    from webgraph_tpu.formats.bvgraph import BVGraph

    if args.offsets or args.degrees:
        g = BVGraph.load(args.source)
        if args.offsets:
            g.write_offsets(args.source)
            print(f"regenerated {args.source}.offsets")
        if args.degrees:
            g.write_outdegrees(args.source)
            print(f"wrote {args.source}.outdegrees")
        return
    g = _load(args.source, args.graph_format, offline=args.offline)
    props = BVGraph.store(
        g,
        args.dest,
        window_size=args.window_size,
        max_ref_count=args.max_ref_count,
        min_interval_length=args.min_interval_length,
        zeta_k=args.zeta_k,
        num_shards=args.threads if args.threads > 0 else 1,
        pl=_progress("nodes"),
    )
    print(f"stored {args.dest}: {props['bitsperlink']} bits/link, {props['arcs']} arcs")


def _progress(items: str):
    from webgraph_tpu.utils.progress import ProgressLogger

    return ProgressLogger(items_name=items, log_interval=10.0)


def cmd_efgraph(args):
    from webgraph_tpu.formats.efgraph import EFGraph

    g = _load(args.source, args.graph_format)
    props = EFGraph.store(g, args.dest, log2_quantum=args.log2_quantum)
    print(f"stored {args.dest}: {props['bitsperlink']} bits/link")


def cmd_transform(args):
    import webgraph_tpu.transform as T
    from webgraph_tpu.formats.bvgraph import BVGraph

    g = _load(args.source)
    name = args.transform
    if name in ("identity",):
        result = g
    elif name in ("transpose", "transposeOffline"):
        result = T.transpose(g) if name == "transpose" else T.transpose_offline(g, args.batch_size)
    elif name in ("symmetrize", "symmetrizeOffline"):
        result = T.symmetrize(g)
    elif name in ("simplify", "simplifyOffline"):
        result = T.simplify(g)
    elif name == "removeDangling":
        result = T.remove_dangling(g)
    elif name == "line":
        result, _ = T.line_graph(g)
    elif name in ("gray", "grayPerm"):
        perm = T.gray_code_permutation(g)
        if name == "grayPerm":
            np.asarray(perm).tofile(args.dest)
            print(f"wrote permutation to {args.dest}")
            return
        result = T.map_graph(g, perm)
    elif name in ("lex", "lexPerm"):
        perm = T.lexicographical_permutation(g)
        if name == "lexPerm":
            np.asarray(perm).tofile(args.dest)
            print(f"wrote permutation to {args.dest}")
            return
        result = T.map_graph(g, perm)
    elif name == "random":
        result = T.map_graph(g, T.random_permutation(g, args.seed))
    elif name in ("map", "mapOffline"):
        perm = np.fromfile(args.perm, dtype=np.int64)
        result = T.map_graph(g, perm)
    elif name == "union":
        result = T.union(g, _load(args.other))
    elif name == "compose":
        result = T.compose(g, _load(args.other))
    else:
        raise SystemExit(f"unknown transform {name!r}")
    BVGraph.store(result, args.dest)
    print(f"stored {args.dest} ({result.num_nodes()} nodes, {result.num_arcs()} arcs)")


def cmd_hyperball(args):
    from webgraph_tpu.algo import HyperBall

    g = _load(args.source)
    t = _load(args.transpose) if args.transpose else None
    hb = HyperBall(
        g,
        transpose=t,
        log2m=args.log2m,
        seed=args.seed,
        do_sum_of_distances=args.sum_of_distances,
        do_sum_of_inverse_distances=args.harmonic,
    )
    nf = hb.run(threshold=args.threshold, pl=_progress("iterations"))
    for i, v in enumerate(nf):
        print(f"{i}\t{v}")
    if args.harmonic:
        np.savetxt(args.dest + ".harmonic", hb.harmonic_centrality()) if args.dest else None


def cmd_stats(args):
    from webgraph_tpu.tools.stats import Stats

    g = _load(args.source)
    stats = Stats.store(g, args.dest or args.source)
    for k, v in stats.items():
        print(f"{k}={v}")


def cmd_check(args):
    from webgraph_tpu.tools.check import Check

    g = _load(args.source)
    sym = Check.symmetry(g)
    print(f"symmetric: {sym}")
    print(f"sorted: {Check.sorted_successors(g)}")
    print(f"in-range: {Check.in_range(g)}")
    if args.require_symmetric and not sym:
        sys.exit(1)


def cmd_speedtest(args):
    from webgraph_tpu.tools.speed_test import SpeedTest

    g = _load(args.source)
    out = {}
    if args.random > 0:
        if args.batched:
            out["random_access"] = SpeedTest.random_access_batched(
                g, args.random, args.seed)
        else:
            out["random_access"] = SpeedTest.random_access(
                g, args.random, args.seed)
    elif args.adjacency > 0:
        out["adjacency"] = SpeedTest.adjacency(g, args.adjacency, args.seed)
    else:
        out["sequential"] = SpeedTest.sequential(g, backend=args.backend)
    print(json.dumps(out, indent=2))


def cmd_ascii(args):
    from webgraph_tpu.formats.ascii import ASCIIGraph

    g = _load(args.source)
    ASCIIGraph.store(g, args.dest)
    print(f"wrote {args.dest}")


def cmd_dot(args):
    from webgraph_tpu.tools.misc import to_dot

    g = _load(args.source)
    to_dot(g, args.dest)
    print(f"wrote {args.dest}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="webgraph_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    b = sub.add_parser("bvgraph", help="compress to / maintain BVGraph format")
    b.add_argument("source")
    b.add_argument("dest", nargs="?")
    b.add_argument("-w", "--window-size", type=int, default=-1)
    b.add_argument("-m", "--max-ref-count", type=int, default=-1)
    b.add_argument("-i", "--min-interval-length", type=int, default=-1)
    b.add_argument("-k", "--zeta-k", type=int, default=-1)
    b.add_argument("-t", "--threads", type=int, default=1, help="compression shards")
    b.add_argument("-g", "--graph-format", choices=["ascii", "arclist"], default=None)
    b.add_argument("--offline", action="store_true")
    b.add_argument("-o", "--offsets", action="store_true", help="regenerate offsets")
    b.add_argument("-d", "--degrees", action="store_true", help="write .outdegrees")
    b.set_defaults(func=cmd_bvgraph)

    e = sub.add_parser("efgraph", help="compress to EFGraph format")
    e.add_argument("source")
    e.add_argument("dest")
    e.add_argument("-q", "--log2-quantum", type=int, default=8)
    e.add_argument("-g", "--graph-format", choices=["ascii", "arclist"], default=None)
    e.set_defaults(func=cmd_efgraph)

    t = sub.add_parser("transform", help="apply a graph transform")
    t.add_argument("transform")
    t.add_argument("source")
    t.add_argument("dest")
    t.add_argument("--other", help="second graph for union/compose")
    t.add_argument("--perm", help="permutation file for map")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--batch-size", type=int, default=1 << 20)
    t.set_defaults(func=cmd_transform)

    h = sub.add_parser("hyperball", help="approximate neighbourhood function")
    h.add_argument("source")
    h.add_argument("dest", nargs="?")
    h.add_argument("-l", "--log2m", type=int, default=6)
    h.add_argument("-s", "--seed", type=int, default=0)
    h.add_argument("-t", "--transpose")
    h.add_argument("--threshold", type=float, default=-1.0)
    h.add_argument("--sum-of-distances", action="store_true")
    h.add_argument("--harmonic", action="store_true")
    h.set_defaults(func=cmd_hyperball)

    s = sub.add_parser("stats", help="degree distributions + summary")
    s.add_argument("source")
    s.add_argument("dest", nargs="?")
    s.set_defaults(func=cmd_stats)

    c = sub.add_parser("check", help="well-formedness / symmetry checks")
    c.add_argument("source")
    c.add_argument("--require-symmetric", action="store_true")
    c.set_defaults(func=cmd_check)

    st = sub.add_parser("speedtest", help="decode benchmark harness")
    st.add_argument("source")
    st.add_argument("-r", "--random", type=int, default=0)
    st.add_argument("-a", "--adjacency", type=int, default=0)
    st.add_argument("--seed", type=int, default=0)
    st.add_argument("--backend", default=None,
                    help="decode backend: device/native/numpy/scalar "
                         "(default: auto — device on an accelerator host)")
    st.add_argument("--batched", action="store_true",
                    help="batched random access through the streaming "
                         "kernel (1024 queries per invocation)")
    st.set_defaults(func=cmd_speedtest)

    a = sub.add_parser("ascii", help="export to ASCII format")
    a.add_argument("source")
    a.add_argument("dest")
    a.set_defaults(func=cmd_ascii)

    d = sub.add_parser("dot", help="export to GraphViz dot")
    d.add_argument("source")
    d.add_argument("dest")
    d.set_defaults(func=cmd_dot)

    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
