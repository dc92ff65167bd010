"""Stall-category attribution for the v6 decoder on cnr-2000 (uses the
xw/xc/xs2/xo/xf/xd counters carried by the kernel and dumped at exit).
Run with the default env (axon TPU); respects D2_* env toggles."""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from webgraph_tpu.formats.bvgraph import BVGraph
from webgraph_tpu.pallas import decode2 as D2

CNR = "/root/reference/slow/it/unimi/dsi/webgraph/cnr-2000"


def main():
    bv = BVGraph.load(CNR)
    cfg, plan, meta, words = D2.prepare2(bv)
    fn = D2._compiled2(cfg, jax.default_backend() == "cpu")
    slab, wp, dbg, dump = jax.jit(fn)(jnp.asarray(meta), jnp.asarray(words))
    wp = np.asarray(wp).reshape(-1)
    ok = np.array_equal(wp, plan.exp_wp)
    dump = np.asarray(dump).reshape(len(D2._DUMP_FIELDS) + (
        40 - len(D2._DUMP_FIELDS)), -1)[: len(D2._DUMP_FIELDS)]
    rows = dict(zip(D2._DUMP_FIELDS, dump))
    trips = int(np.asarray(dbg).reshape(-1)[0])
    total_sub = trips * 2 * cfg.unroll * 1024  # lane-substeps
    print(f"ok={ok} trips={trips} substeps/lane={trips * 2 * cfg.unroll} "
          f"plan_bound={plan.max_steps}")
    work = 0
    for nm, label in (("xw", "word-starve"), ("xc", "copy-starve"),
                      ("xs2", "side-starve"), ("xo", "out-backpressure"),
                      ("xf", "side-full"), ("xd", "done-idle"),
                      ("xa", "window-fill"), ("xn", "idle-no-action")):
        tot = int(rows[nm].astype(np.int64).sum())
        mx = int(rows[nm].max())
        print(f"  {label:16s} total={tot:>12,}  share={tot/total_sub:6.1%}"
              f"  max/lane={mx:,}")
        work += tot
    print(f"  lane-substeps total {total_sub:,}; plan work "
          f"{int(np.sum(plan.exp_wp)):,} arcs")
    # per-lane breakdown of the stall-heaviest lanes
    cats = ["xw", "xc", "xs2", "xo", "xf", "xd", "xa", "xn"]
    per_lane = np.stack([rows[c] for c in cats])          # (6, 1024)
    busy = trips * 2 * cfg.unroll - rows["xd"]
    worst = np.argsort(-(per_lane[[1, 2, 3, 6, 7]].sum(axis=0)))[:5]
    for ln in worst:
        print(f"  lane {ln}: busy_end={int(busy[ln])} "
              + " ".join(f"{c}={int(per_lane[i, ln])}"
                         for i, c in enumerate(cats))
              + f" arcs={int(plan.exp_wp[ln])}")


if __name__ == "__main__":
    main()
