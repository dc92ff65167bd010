#!/usr/bin/env python
"""What does one while_loop trip cost on this TPU, by body composition?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32
TRIPS = 200
LANES = 8192
BIG = 1_000_000


def run(name, mk):
    f = jax.jit(mk())
    words = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, size=BIG).astype(np.int32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, BIG - 2, size=LANES).astype(np.int32))
    out = f(words, idx, jnp.int32(0))
    _ = int(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(U32), dtype=U32))
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        out = f(words, idx, jnp.int32(r + 1))
        _ = int(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(U32), dtype=U32))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:8.1f} ms   {best/TRIPS*1e6:8.1f} us/trip")


def mk_gather_only():
    def f(words, idx, salt):
        def body(t, c):
            acc, i = c
            v = words[i] + words[i + 1] + words[i + 2]
            return acc + v, (i + v) % (BIG - 2)
        acc, _ = jax.lax.fori_loop(0, TRIPS, body, (jnp.zeros(LANES, I32) + salt, idx))
        return acc
    return f


def mk_scatter_big():
    def f(words, idx, salt):
        def body(t, c):
            acc, i, out = c
            v = words[i] + salt
            out = out.at[(i + t) % BIG].set(v, mode="drop", unique_indices=True)
            return acc + v, (i + v) % (BIG - 2), out
        acc, _, out = jax.lax.fori_loop(
            0, TRIPS, body, (jnp.zeros(LANES, I32), idx, jnp.zeros(BIG, I32) + salt)
        )
        return out
    return f


def mk_scatter_big_x4():
    def f(words, idx, salt):
        def body(t, c):
            acc, i, out = c
            for u in range(4):
                v = words[i] + salt + u
                out = out.at[(i + t + u) % BIG].set(v, mode="drop", unique_indices=True)
                i = (i + v) % (BIG - 2)
            return acc + v, i, out
        acc, _, out = jax.lax.fori_loop(
            0, TRIPS // 4, body, (jnp.zeros(LANES, I32), idx, jnp.zeros(BIG, I32) + salt)
        )
        return out
    return f


def mk_dus_record():
    # dense per-trip recording via dynamic_update_slice instead of scatter
    def f(words, idx, salt):
        def body(t, c):
            acc, i, rec = c
            v = words[i] + salt
            rec = jax.lax.dynamic_update_slice(rec, v[None, :], (t, 0))
            return acc + v, (i + v) % (BIG - 2), rec
        acc, _, rec = jax.lax.fori_loop(
            0, TRIPS, body, (jnp.zeros(LANES, I32), idx, jnp.zeros((TRIPS, LANES), I32) + salt)
        )
        return rec
    return f


def mk_cumsum_in_loop():
    def f(words, idx, salt):
        def body(t, c):
            acc, i = c
            v = words[i] + salt
            r = jnp.cumsum(v)
            return acc + r, (i + v) % (BIG - 2)
        acc, _ = jax.lax.fori_loop(0, TRIPS, body, (jnp.zeros(LANES, I32), idx))
        return acc
    return f


run("gather x3 only", mk_gather_only)
run("gather + scatter(1M buffer)", mk_scatter_big)
run("gather + 4x scatter per trip (TRIPS/4)", mk_scatter_big_x4)
run("gather + DUS record", mk_dus_record)
run("gather + cumsum", mk_cumsum_in_loop)
