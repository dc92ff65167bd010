#!/usr/bin/env python
"""Bisect round 3: (a) where does the 227ns merge-trip go, (b) why does the
slab-compaction kernel fail to compile, (c) cheaper word-refill variants,
(d) in-loop row-local gather timing."""
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
rng = np.random.default_rng(13)
TRIPS = 1 << 13 if INTERPRET else 1 << 17


def timeit(fn, *args):
    s0 = int(fn(*args))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run(name, fn):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).splitlines() if l.strip()][:2]
        print(f"[FAIL] {name}: {type(e).__name__}: {lines[0][:130] if lines else ''}")


def trip_variant(name, nops, with_queue, with_store, with_reshape, trips=None):
    trips = trips or TRIPS
    SLAB = 128

    def k(x_ref, o_ref, colbuf, wq):
        wq[:] = jnp.zeros((8, 1024), I32) + x_ref[:].reshape(1, 1024)

        def body(t, carry):
            v, rv = carry
            for _ in range(nops // 4):
                v = (v * 5 + rv) & 0x7FFFFFFF
                v = v ^ (v >> 7)
                rv = jnp.where(v > rv, rv + 1, rv)
                rv = rv + (v & 3)
            if with_reshape:
                flat = v.reshape(1, 1024)
                v = v + flat.reshape(8, 128)
            if with_queue:
                q0 = wq[:]
                q1 = pltpu.roll(q0, 7, 0)
                sel = jnp.broadcast_to((t & 1) > 0, (8, 1024))
                wq[:] = jnp.where(sel, q1, q0)
                v = v + wq[0, :128].reshape(1, 128)
            if with_store:
                colbuf[pl.ds(t % SLAB, 1), :] = (v + rv).reshape(1, 1024) if False else jnp.broadcast_to(t, (1, 1024))
            return v, rv

        v, rv = jax.lax.fori_loop(0, trips, body, (x_ref[:], x_ref[:] * 3))
        o_ref[:] = v + rv + colbuf[0, :128].reshape(1, 128)

    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((SLAB, 1024), I32), pltpu.VMEM((8, 1024), I32)],
            interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"{name}: {dt/trips*1e9:8.1f} ns/trip")


def trip_1x1024(nops):
    """all-lane state held as (1,1024) rows, no reshapes."""
    def k(x_ref, o_ref):
        def body(t, carry):
            v, rv = carry
            for _ in range(nops // 4):
                v = (v * 5 + rv) & 0x7FFFFFFF
                v = v ^ (v >> 7)
                rv = jnp.where(v > rv, rv + 1, rv)
                rv = rv + (v & 3)
            return v, rv

        x = x_ref[:].reshape(1, 1024)
        v, rv = jax.lax.fori_loop(0, TRIPS, body, (x, x * 3))
        o_ref[:] = (v + rv).reshape(8, 128)

    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"(1,1024) state {nops} ops: {dt/TRIPS*1e9:8.1f} ns/trip")


def gather_inloop_timed(N):
    def k(t_ref, o_ref):
        tbl = t_ref[:]
        base = jax.lax.broadcasted_iota(I32, (N, 128), 1)

        def body(t, carry):
            idx = (base + carry[:1, :128]) & 127
            vals = jnp.take_along_axis(tbl, idx, axis=1)
            return (carry + vals[:8, :128]) & 0xFFFF

        o_ref[:] = jax.lax.fori_loop(0, TRIPS, body, jnp.ones((8, 128), I32))

    t = rng.integers(0, 99, size=(N, 128)).astype(np.int32)

    @jax.jit
    def fn(t, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(t)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(t), jnp.int32(1))
    print(f"gather-in-loop (N={N},128): {dt/TRIPS*1e9:8.1f} ns/trip")


def refill_variant(name, P8, batched, dtype):
    REPS = TRIPS // 16

    def k(pages_ref, x_ref, o_ref):
        if batched:
            if dtype == "i8":
                planes = pages_ref[:].astype(I8)  # (P8, 32) all 4 byte planes
            else:
                planes = pages_ref[:].astype(jnp.bfloat16)
        else:
            planes = [pages_ref[:][:, 8 * i: 8 * (i + 1)].astype(I8) for i in range(4)]

        def body(t, carry):
            cur = carry
            flat = cur.reshape(1, 1024) % P8
            iota = jax.lax.broadcasted_iota(I32, (P8, 1024), 0)
            if dtype == "i8":
                onehotT = (iota == flat).astype(I8)
            else:
                onehotT = (iota == flat).astype(jnp.bfloat16)
            if batched:
                part = jax.lax.dot_general(
                    planes, onehotT, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=I32 if dtype == "i8" else jnp.float32,
                )  # (32, 1024)
                part = part.astype(I32)
                acc = ((part[0:8] & 0xFF) | ((part[8:16] & 0xFF) << 8)
                       | ((part[16:24] & 0xFF) << 16) | ((part[24:32] & 0xFF) << 24))
            else:
                acc = jnp.zeros((8, 1024), I32)
                for i, sh in enumerate((0, 8, 16, 24)):
                    p = jax.lax.dot_general(
                        planes[i], onehotT, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=I32)
                    acc = acc + ((p & 0xFF) << sh)
            w0 = acc[0:1, :].reshape(8, 128)
            return (cur + w0) & 0x7FFFFFFF

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    pages = rng.integers(0, 99, size=(P8, 32)).astype(np.int32)
    # layout for batched: columns grouped plane-major: [w0..w7 of plane0 | plane1 ...]
    if batched:
        p = np.zeros((P8, 32), np.int32)
        for pl_i, sh in enumerate((0, 8, 16, 24)):
            p[:, 8 * pl_i: 8 * (pl_i + 1)] = (pages[:, :8] >> sh) & 0xFF
        pages = p
    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(pages, x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(pages, x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(pages), jnp.asarray(x), jnp.int32(1))
    print(f"{name}: {dt/REPS*1e9:8.1f} ns/refill")


def stack_select_refill():
    """refill (hi,lo) from a 16x(8,1024) static stack via select tree."""
    REPS = TRIPS // 4

    def k(x_ref, o_ref, stack):
        stack[:] = jnp.broadcast_to(
            jax.lax.broadcasted_iota(I32, (128, 1), 0), (128, 1024))

        def body(t, carry):
            k_idx = carry  # (8,128) word index 0..127 per lane
            kf = k_idx.reshape(1, 1024)
            reg = kf >> 3  # which (8,1024) slab
            acc = jnp.zeros((8, 1024), I32)
            for r in range(16):
                acc = jnp.where(reg == r, stack[8 * r: 8 * (r + 1), :], acc)
            sh = kf & 7
            for b in range(3):
                rolled = pltpu.roll(acc, 8 - (1 << b), 0)
                acc = jnp.where((sh >> b) & 1 > 0, rolled, acc)
            w0 = acc[0:1, :].reshape(8, 128)
            return (k_idx + (w0 & 3) + 1) & 127

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:] & 127)

    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((128, 1024), I32)],
            interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"stack select-tree word fetch: {dt/REPS*1e9:8.1f} ns/fetch")


# --- J compaction sub-bisect --------------------------------------------------
def j_part(name, part):
    R = 128
    REPS = 64

    def k(x_ref, pre_ref, o_ref, colbuf):
        colbuf[:] = jnp.zeros((128, 1024), I32) + x_ref[:].reshape(1, 1024)

        def body(t, carry):
            A = colbuf[:].T + carry[:1, :1]
            pre = (pre_ref[:].reshape(1, 1024) + t) % (R * 128 - 256)
            out = A[:8, :128]
            if part >= 1:
                sh = pre & 127
                shT = sh.reshape(1024, 1)
                B = A
                for b in range(7):
                    rolled = pltpu.roll(B, 128 - (1 << b), 1)
                    B = jnp.where((shT >> b) & 1 > 0, rolled, B)
                out = B[:8, :128]
            if part >= 2:
                colmask = jax.lax.broadcasted_iota(I32, (1024, 128), 1) >= shT
                B0 = jnp.where(colmask, B, 0)
                out = B0[:8, :128]
            if part >= 3:
                r0 = (pre >> 7).reshape(1, 1024)
                iota = jax.lax.broadcasted_iota(I32, (R, 1024), 0)
                oh0 = (iota == r0).astype(I8)
                p0 = ((B0 >> 0) & 0xFF).astype(I8)
                part0 = jax.lax.dot_general(
                    oh0, p0, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=I32)
                out = part0[:8, :128]
            return carry + out

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    x = rng.integers(1, 99, size=(8, 128)).astype(np.int32)
    pre = rng.integers(0, R * 100, size=(8, 128)).astype(np.int32)

    @jax.jit
    def fn(x, pre, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((128, 1024), I32)],
            interpret=INTERPRET)(x, pre)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.asarray(pre), jnp.int32(1))
    print(f"J part<{name}>: {dt/REPS*1e6:8.2f} us/slab")


def main():
    print(f"interpret={INTERPRET} TRIPS={TRIPS}")
    run("T0", lambda: trip_variant("trip 32ops only         ", 32, False, False, False))
    run("T1", lambda: trip_variant("trip 32ops+queue        ", 32, True, False, False))
    run("T2", lambda: trip_variant("trip 32ops+queue+store  ", 32, True, True, False))
    run("T3", lambda: trip_variant("trip 32ops+q+s+reshape  ", 32, True, True, True))
    run("T4", lambda: trip_variant("trip 64ops only         ", 64, False, False, False))
    run("U", lambda: trip_1x1024(32))
    run("U64", lambda: trip_1x1024(64))
    for N in (8, 128, 1024):
        run(f"G{N}", lambda N=N: gather_inloop_timed(N))
    run("R1", lambda: refill_variant("refill 4xmatmul i8 P8=256", 256, False, "i8"))
    run("R2", lambda: refill_variant("refill batched i8 P8=256 ", 256, True, "i8"))
    run("R3", lambda: refill_variant("refill batched bf16 P8=256", 256, True, "bf16"))
    run("R4", lambda: refill_variant("refill batched i8 P8=64  ", 64, True, "i8"))
    run("S", stack_select_refill)
    for p in (0, 1, 2, 3):
        run(f"J{p}", lambda p=p: j_part(str(p), p))


if __name__ == "__main__":
    main()
