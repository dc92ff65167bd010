#!/usr/bin/env python
"""On-chip throughput probe for the in-kernel decoder's hot primitives.

Mosaic constraint discovered on-chip: `jnp.take_along_axis(tbl, idx, axis=1)`
lowers only when idx.shape == tbl.shape (gather lowering asserts
`indices_aval.shape == in_aval.shape + (1,)`), i.e. every element of the
table row is gathered.  Cross-lane gathers therefore cost O(W) per trip and
we must measure the constant:

  A. full-width take_along on (8, W) replicated pool, W sweep
  B. one-hot int8 byte-plane matmul row gather (1024, R) @ (R, 128)
  C. full-width take_along on (1024, T) own-row tables, T sweep
  D. row store loop into a (T, 1024) column buffer (merge emission)
  E. (T,1024)->(1024,T) transpose (round compaction)
  F. VPU baseline: 64 elementwise int32 ops on (8,128) per trip

Timing: salted dependent-scalar fetch per rep; dispatch overhead subtracted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("JAX_PLATFORMS", "") == "cpu"
I32 = jnp.int32

TRIPS = 2048


def timeit(fn, *args):
    s0 = int(fn(*args))
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(3):
        int(triv(jnp.int32(i)))
    overhead = (time.perf_counter() - t0) / 3
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - overhead, 1e-9), s0


def run(name, fn):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines() or [repr(e)]
        print(f"{name} FAIL: {type(e).__name__}: {lines[0][:140]}")


# A. full-width replicated take_along ----------------------------------------
def probe_replicated(W):
    def kernel(pool_ref, o_ref):
        pool = pool_ref[:]
        base = jax.lax.broadcasted_iota(I32, (8, W), 1)

        def body(t, carry):
            idx = (base + carry[:, :1]) % W
            vals = jnp.take_along_axis(pool, idx, axis=1)
            return (carry + vals[:, :128]) & 0x7FFFFFFF

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) * 37
        o_ref[:] = jax.lax.fori_loop(0, TRIPS, body, idx0)

    rng = np.random.default_rng(0)
    pool = np.broadcast_to(rng.integers(1, 97, size=(1, W)).astype(np.int32), (8, W)).copy()

    @jax.jit
    def fn(pool, salt):
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), I32), interpret=INTERPRET
        )(pool)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(pool), jnp.int32(1))
    print(f"A replicated take_along W={W:6d}: {dt/TRIPS*1e9:8.1f} ns/trip")


# B. one-hot int8 matmul row gather -------------------------------------------
def probe_onehot(R):
    def kernel(pool_ref, o_ref):
        pool = pool_ref[:]
        planes = [((pool >> s) & 0xFF).astype(jnp.int8) for s in (0, 8, 16, 24)]

        def body(t, carry):
            flat = carry.reshape(1024, 1)
            onehot = (flat == jax.lax.broadcasted_iota(I32, (1024, R), 1)).astype(jnp.int8)
            acc = jnp.zeros((1024, 128), I32)
            for i, sh in enumerate((0, 8, 16, 24)):
                part = jax.lax.dot_general(
                    onehot, planes[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=I32,
                )
                acc = acc + ((part & 0xFF) << sh)
            v = acc[:, :1].reshape(8, 128)
            return (carry + v) % R

        idx0 = jax.lax.broadcasted_iota(I32, (8, 128), 1) % R
        o_ref[:] = jax.lax.fori_loop(0, TRIPS // 16, body, idx0)

    rng = np.random.default_rng(1)
    pool = rng.integers(1, 97, size=(R, 128)).astype(np.int32)

    @jax.jit
    def fn(pool, salt):
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), I32), interpret=INTERPRET
        )(pool)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(pool), jnp.int32(1))
    per = dt / (TRIPS // 16)
    print(f"B one-hot matmul gather R={R:4d}: {per*1e9:8.1f} ns/rowgather "
          f"({per*1e9/16:6.2f} ns/emission @unroll16)")


# C. full-width own-row take_along --------------------------------------------
def probe_ownrow(T):
    def kernel(tbl_ref, o_ref):
        tbl = tbl_ref[:]
        base = jax.lax.broadcasted_iota(I32, (1024, T), 1)

        def body(t, carry):
            idx = (base + carry[:, :1]) % T
            vals = jnp.take_along_axis(tbl, idx, axis=1)
            return (carry + vals[:, :1]) & 0x7FFFFFFF

        idx0 = jax.lax.broadcasted_iota(I32, (1024, 1), 0) % T
        out = jax.lax.fori_loop(0, TRIPS, body, idx0)
        o_ref[:] = out.reshape(8, 128)

    rng = np.random.default_rng(2)
    tbl = rng.integers(1, 97, size=(1024, T)).astype(np.int32)

    @jax.jit
    def fn(tbl, salt):
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), I32), interpret=INTERPRET
        )(tbl)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(tbl), jnp.int32(1))
    print(f"C own-row take_along T={T:4d}: {dt/TRIPS*1e9:8.1f} ns/trip")


# D. row store into column buffer ----------------------------------------------
def probe_rowstore(T):
    def kernel(x_ref, o_ref, colbuf):
        def body(t, carry):
            colbuf[pl.ds(t % T, 1), :] = carry.reshape(1, 1024)
            return carry + 1

        v = jax.lax.fori_loop(0, TRIPS, body, x_ref[:])
        o_ref[:] = v + colbuf[0, :128].reshape(1, 128)

    rng = np.random.default_rng(3)
    x = rng.integers(1, 97, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((T, 1024), I32)],
            interpret=INTERPRET,
        )(x)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"D row store (1,1024) T={T:4d}: {dt/TRIPS*1e9:8.1f} ns/store")


# E. transpose -----------------------------------------------------------------
def probe_transpose(T, reps=64):
    def kernel(x_ref, o_ref):
        def body(t, carry):
            tr = x_ref[:].T + carry[:1, :1]
            return carry + tr[:8, :128]

        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((8, 128), I32))

    rng = np.random.default_rng(4)
    x = rng.integers(1, 97, size=(T, 1024)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), I32), interpret=INTERPRET
        )(x)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"E transpose (T,1024)->(1024,T) T={T:4d}: {dt/reps*1e6:8.2f} us/transpose")


# F. VPU baseline ---------------------------------------------------------------
def probe_vpu():
    def kernel(x_ref, o_ref):
        def body(t, carry):
            v = carry
            for _ in range(16):
                v = (v * 3 + 1) & 0x7FFFFFFF
                v = v ^ (v >> 5)
                v = v + t
                v = jnp.where(v > 100, v - 7, v)
            return v

        o_ref[:] = jax.lax.fori_loop(0, TRIPS, body, x_ref[:])

    rng = np.random.default_rng(5)
    x = rng.integers(1, 97, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), I32), interpret=INTERPRET
        )(x)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"F 64 VPU ops on (8,128): {dt/TRIPS*1e9:8.1f} ns/trip ({dt/TRIPS/64*1e9:5.2f} ns/op)")


def main():
    print(f"interpret={INTERPRET} devices={jax.devices()}")
    run("F", probe_vpu)
    for W in (512, 2048, 8192, 32768):
        run(f"A{W}", lambda W=W: probe_replicated(W))
    for R in (64, 288, 576):
        run(f"B{R}", lambda R=R: probe_onehot(R))
    for T in (128, 320):
        run(f"C{T}", lambda T=T: probe_ownrow(T))
    for T in (512,):
        run(f"D{T}", lambda T=T: probe_rowstore(T))
    for T in (128, 512):
        run(f"E{T}", lambda T=T: probe_transpose(T))


if __name__ == "__main__":
    main()
