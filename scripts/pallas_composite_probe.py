#!/usr/bin/env python
"""Composite timing probe: the steady-state cost model of the planned
in-kernel decoder, measured at real trip counts (>=1<<16 so the 27 ms
dispatch round-trip is amortized away).

  G. reshape (1,1024)->(8,128) and back (head extraction / emission)
  H. merge-trip core: ~35 VPU ops on (8,128) + 2 queue shifts on (8,1024)
     + 1 row store to a (128,1024) colbuf slab, per trip
  I. word-queue refill: onehotT (P8,1024) i8 build + 4 byte-plane matmuls
     (P8,8)x -> (8,1024) + plane combine + 3-stage align roll network
  J. slab compaction: 7-stage roll network on (1024,128) + 8 scatter
     matmuls (R,1024)@(1024,128) i8 planes -> (R,128)
  K. onehotT page fetch into (1024,128) rows + transpose to (128,1024)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("JAX_PLATFORMS", "") == "cpu"
I32 = jnp.int32
I8 = jnp.int8
rng = np.random.default_rng(11)
TRIPS = 1 << 14 if INTERPRET else 1 << 17


def timeit(fn, *args):
    s0 = int(fn(*args))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, s0


def run(name, fn):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).splitlines() if l.strip()][:2]
        print(f"[FAIL] {name}: {type(e).__name__}: {lines[0][:130] if lines else ''}")


def probe_reshape_roundtrip():
    def k(x_ref, o_ref):
        def body(t, carry):
            flat = carry.reshape(1, 1024)
            back = flat.reshape(8, 128)
            return back + 1
        o_ref[:] = jax.lax.fori_loop(0, TRIPS, body, x_ref[:])
    x = rng.integers(0, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt, s0 = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"G reshape roundtrip: {dt/TRIPS*1e9:8.1f} ns/trip")


def probe_merge_core():
    SLAB = 128

    def k(x_ref, o_ref, colbuf, wq):
        wq[:] = jnp.zeros((32, 1024), I32) + x_ref[:].reshape(1, 1024)

        def body(t, carry):
            v, rv, iv = carry
            # ~30 VPU ops of decode/merge logic on (8,128)
            hi = v ^ (rv >> 3)
            lo = v + iv
            h = jnp.where(hi > 0, jax.lax.clz(hi.astype(jnp.uint32)).astype(I32), 32)
            rest = (lo << (h & 31)) | (hi >> ((32 - h) & 31))
            val = (rest & 0xFFFF) + rv
            take_c = val > rv
            take_i = (~take_c) & (iv > 0)
            emit = jnp.where(take_c, val, jnp.where(take_i, iv, rv))
            rv = jnp.where(take_c, rv + 1, rv - 1)
            iv = jnp.where(take_i, iv - 1, iv + emit % 3)
            v = (v * 5 + emit) & 0x7FFFFFFF
            # two queue shifts on (8,1024): roll + select
            q0 = wq[0:8, :]
            q1 = pltpu.roll(q0, 7, 0)
            sel = (emit & 1).reshape(1, 1024) > 0
            wq[0:8, :] = jnp.where(sel, q1, q0)
            # emission row store
            colbuf[pl.ds(t % SLAB, 1), :] = emit.reshape(1, 1024)
            return v, rv, iv

        v, rv, iv = jax.lax.fori_loop(
            0, TRIPS, body, (x_ref[:], x_ref[:] * 3, x_ref[:] % 7))
        o_ref[:] = v + rv + iv + colbuf[0, :128].reshape(1, 128)

    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((SLAB, 1024), I32), pltpu.VMEM((32, 1024), I32)],
            interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"H merge-trip core: {dt/TRIPS*1e9:8.1f} ns/trip")


def probe_refill(P8):
    REPS = TRIPS // 16

    def k(pages_ref, x_ref, o_ref):
        planes = [pages_ref[:][:, 8 * i : 8 * (i + 1)].astype(I8) for i in range(4)]

        def body(t, carry):
            cur = carry  # (8,128) page cursor per lane
            flat = cur.reshape(1, 1024) % P8
            onehotT = (jax.lax.broadcasted_iota(I32, (P8, 1024), 0) == flat).astype(I8)
            acc = jnp.zeros((8, 1024), I32)
            for i, sh in enumerate((0, 8, 16, 24)):
                part = jax.lax.dot_general(
                    planes[i], onehotT,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=I32,
                )  # (8, 1024)
                acc = acc + ((part & 0xFF) << sh)
            # 3-stage align roll network on (8,1024)
            sh = cur.reshape(1, 1024) & 7
            for b in range(3):
                rolled = pltpu.roll(acc, 8 - (1 << b), 0)
                acc = jnp.where((sh >> b) & 1 > 0, rolled, acc)
            w0 = acc[0:1, :].reshape(8, 128)
            return (cur + w0) & 0x7FFFFFFF

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    pages = rng.integers(0, 99, size=(P8, 32)).astype(np.int32)
    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(pages, x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(pages, x)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(pages), jnp.asarray(x), jnp.int32(1))
    print(f"I wq refill P8={P8:4d}: {dt/REPS*1e9:8.1f} ns/refill")


def probe_compaction(R):
    REPS = max(TRIPS // 256, 64)

    def k(x_ref, pre_ref, o_ref, colbuf, pool):
        colbuf[:] = jnp.zeros((128, 1024), I32) + x_ref[:].reshape(1, 1024)

        def body(t, carry):
            A = colbuf[:].T + carry[:1, :1]  # (1024,128) lane-major
            pre = (pre_ref[:].reshape(1, 1024) + t) % (R * 128 - 256)
            sh = pre & 127
            # 7-stage per-lane roll network along lanes (left-rotate by sh)
            B = A
            shT = sh.reshape(1024, 1)
            for b in range(7):
                rolled = pltpu.roll(B, 128 - (1 << b), 1)
                B = jnp.where((shT >> b) & 1 > 0, rolled, B)
            colmask = jax.lax.broadcasted_iota(I32, (1024, 128), 1) >= shT
            B0 = jnp.where(colmask, B, 0)
            B1 = jnp.where(colmask, 0, B)
            r0 = (pre >> 7).reshape(1, 1024)
            iota = jax.lax.broadcasted_iota(I32, (R, 1024), 0)
            oh0 = (iota == r0).astype(I8)
            oh1 = (iota == r0 + 1).astype(I8)
            acc = jnp.zeros((R, 128), I32)
            for i, shv in enumerate((0, 8, 16, 24)):
                p0 = ((B0 >> shv) & 0xFF).astype(I8)
                p1 = ((B1 >> shv) & 0xFF).astype(I8)
                part0 = jax.lax.dot_general(
                    oh0, p0, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=I32)
                part1 = jax.lax.dot_general(
                    oh1, p1, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=I32)
                acc = acc + (((part0 + part1) & 0xFF) << shv)
            pool[:] = acc
            return carry + pool[0:8, 0:128]

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)
    pre = rng.integers(0, R * 100, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, pre, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((128, 1024), I32), pltpu.VMEM((R, 128), I32)],
            interpret=INTERPRET)(x, pre)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(x), jnp.asarray(pre), jnp.int32(1))
    print(f"J slab compaction R={R:4d}: {dt/REPS*1e6:8.2f} us/slab "
          f"({dt/REPS/16384*1e9:6.2f} ns/slot)")


def probe_pagefetch_rows(P):
    REPS = max(TRIPS // 64, 256)

    def k(pages_ref, x_ref, o_ref):
        def body(t, carry):
            flat = carry.reshape(1, 1024) % P
            onehotT = (jax.lax.broadcasted_iota(I32, (P, 1024), 0) == flat).astype(I8)
            acc = jnp.zeros((1024, 128), I32)
            for i, sh in enumerate((0, 8, 16, 24)):
                plane = ((pages_ref[:] >> sh) & 0xFF).astype(I8)
                part = jax.lax.dot_general(
                    onehotT, plane, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=I32)
                acc = acc + ((part & 0xFF) << sh)
            tr = acc.T  # (128, 1024)
            return (carry + tr[0:1, :].reshape(8, 128)) & 0x7FFFFFFF

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    pages = rng.integers(0, 99, size=(P, 128)).astype(np.int32)
    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(pages, x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(pages, x)
        return jnp.sum(out + salt)

    dt, _ = timeit(fn, jnp.asarray(pages), jnp.asarray(x), jnp.int32(1))
    print(f"K page fetch+T rows P={P:4d}: {dt/REPS*1e6:8.2f} us/fetch")


def main():
    print(f"interpret={INTERPRET} TRIPS={TRIPS}")
    run("G", probe_reshape_roundtrip)
    run("H", probe_merge_core)
    for P8 in (256, 512):
        run(f"I{P8}", lambda P8=P8: probe_refill(P8))
    for R in (128, 288):
        run(f"J{R}", lambda R=R: probe_compaction(R))
    run("K32", lambda: probe_pagefetch_rows(32))


if __name__ == "__main__":
    main()
