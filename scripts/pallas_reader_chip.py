#!/usr/bin/env python
"""On-chip check of the window code readers in isolation: precomputed 64-bit
windows (hi, lo) through each reader inside a minimal Pallas kernel, compared
to the scalar oracle on host."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgraph_tpu.bits import codes as C
from webgraph_tpu.bits.bitstream import OutputBitStream
from webgraph_tpu.pallas import pcodes as P

I32 = jnp.int32
U32 = jnp.uint32


def windows_at(data, positions):
    pad = data + b"\x00" * (12 + (-len(data)) % 4)
    w = np.frombuffer(pad, dtype=">u4").astype(np.uint32)
    i = positions // 32
    off = (positions % 32).astype(np.uint32)
    a, b, c = w[i], w[i + 1], w[i + 2]
    off2 = (np.uint32(32) - off) & np.uint32(31)
    hi = np.where(off > 0, (a << off) | (b >> off2), a)
    lo = np.where(off > 0, (b << off) | (c >> off2), b)
    return hi, lo


def run_case(name, coding, k, vals):
    obs = OutputBitStream()
    positions = []
    for v in vals:
        positions.append(obs.written_bits)
        obs.write(coding, int(v), k)
    data = obs.to_bytes()
    positions = np.asarray(positions, dtype=np.int64)
    hi, lo = windows_at(data, positions)
    n = len(vals)
    npad = 1024
    hi_p = np.zeros((8, 128), np.uint32)
    lo_p = np.zeros((8, 128), np.uint32)
    hi_p.reshape(-1)[:n] = hi
    lo_p.reshape(-1)[:n] = lo
    reader = P.make_window_reader(coding, k)

    def kernel(hi_ref, lo_ref, val_ref, len_ref):
        v, ln = reader(hi_ref[:].astype(U32), lo_ref[:].astype(U32))
        val_ref[:] = v.astype(I32)
        len_ref[:] = ln

    fn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((8, 128), I32)] * 2,
    )
    got_v, got_l = fn(jnp.asarray(hi_p.view(np.int32)), jnp.asarray(lo_p.view(np.int32)))
    got_v = np.asarray(got_v).reshape(-1)[:n].astype(np.uint32)
    got_l = np.asarray(got_l).reshape(-1)[:n]
    exp_len = np.diff(np.concatenate([positions, [obs.written_bits]]))
    okv = np.array_equal(got_v.astype(np.int64), vals.astype(np.int64))
    okl = np.array_equal(got_l, exp_len)
    print(f"{name}: values {'ok' if okv else 'BAD'} lengths {'ok' if okl else 'BAD'}")
    if not okv:
        bad = np.flatnonzero(got_v.astype(np.int64) != vals.astype(np.int64))
        print("  first bad idx", bad[:6], "got", got_v[bad[:6]], "exp", vals[bad[:6]])
        print("  hi bits:", [format(int(h), "032b") for h in hi[bad[:2]]])
    if not okl:
        bad = np.flatnonzero(got_l != exp_len)
        print("  len bad idx", bad[:6], "got", got_l[bad[:6]], "exp", exp_len[bad[:6]])
    return okv and okl


def main():
    rng = np.random.default_rng(42)
    vals = np.concatenate([
        np.arange(64),
        rng.integers(0, 1 << 8, 400),
        rng.integers(0, 1 << 16, 300),
        rng.integers(0, 1 << 24, 200),
    ]).astype(np.uint64)[:1024]
    ok = True
    for name, coding, k in [("gamma", C.GAMMA, 0), ("delta", C.DELTA, 0),
                            ("zeta3", C.ZETA, 3), ("unary", C.UNARY, 0)]:
        v = vals if name != "unary" else np.minimum(vals, 50)
        ok &= run_case(name, coding, k, v)
    print("ALL OK" if ok else "FAILURES")


if __name__ == "__main__":
    main()
