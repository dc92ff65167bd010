#!/usr/bin/env python
"""Timing round 5 — correct methodology: dispatch overhead subtracted AND
rep counts high enough that kernel compute >> the ~27 ms dispatch floor."""
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
rng = np.random.default_rng(23)
SC = 1 if not INTERPRET else 1 // 1  # interpret uses tiny reps below

_overhead = None


def dispatch_overhead():
    global _overhead
    if _overhead is None:
        triv = jax.jit(lambda x: x + 1)
        int(triv(jnp.int32(0)))
        t0 = time.perf_counter()
        for i in range(5):
            int(triv(jnp.int32(i)))
        _overhead = (time.perf_counter() - t0) / 5
        print(f"dispatch overhead: {_overhead*1e3:.1f} ms")
    return _overhead


def timeit(fn, *args):
    int(fn(*args))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        int(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - dispatch_overhead(), 1e-9)


def run(name, fn):
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).splitlines() if l.strip()][:2]
        print(f"[FAIL] {name}: {type(e).__name__}: {lines[0][:130] if lines else ''}")


def reps_for(n):
    return n if not INTERPRET else max(n >> 8, 64)


def trip_core(nops, extras, reps):
    reps = reps_for(reps)
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
            if extras:
                flat = v.reshape(1, 1024)
                v = v + flat.reshape(8, 128)
                q0 = wq[:]
                q1 = pltpu.roll(q0, 7, 0)
                sel = jnp.broadcast_to((v[:1, :1] & 1) > 0, (8, 1024)) if False else (
                    jax.lax.broadcasted_iota(I32, (8, 1024), 1) < 512)
                wq[:] = jnp.where(sel, q1, q0)
                v = v + wq[0, :128].reshape(1, 128)
                colbuf[pl.ds(t % SLAB, 1), :] = v.reshape(1, 1024)
            return v, rv

        v, rv = jax.lax.fori_loop(0, reps, body, (x_ref[:], x_ref[:] * 3))
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
    print(f"trip {nops}ops extras={int(extras)}: {dt/reps*1e9:8.1f} ns/trip")


def gather_loop(N, reps):
    reps = reps_for(reps)

    def k(t_ref, o_ref):
        tbl = t_ref[:]
        base = jax.lax.broadcasted_iota(I32, (N, 128), 1)

        def body(t, carry):
            idx = (base + carry[:1, :128]) & 127
            vals = jnp.take_along_axis(tbl, idx, axis=1)
            return (carry + vals[:8, :128]) & 0xFFFF

        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.ones((8, 128), I32))

    t = rng.integers(0, 99, size=(N, 128)).astype(np.int32)

    @jax.jit
    def fn(t, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(t)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(t), jnp.int32(1))
    print(f"gather-in-loop ({N},128): {dt/reps*1e9:8.1f} ns/trip")


def matmul_loop(M, K, N, onehot, reps):
    reps = reps_for(reps)

    def k(a_ref, b_ref, o_ref):
        def body(t, carry):
            if onehot:
                flat = carry.reshape(1, 1024) % K
                a = (jax.lax.broadcasted_iota(I32, (K, 1024), 0) == flat).astype(I8)
                out = jax.lax.dot_general(
                    a, b_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=I32)
                return (carry + out[:8, :128].reshape(8, 128)) & 0x7FFF
            out = jax.lax.dot_general(
                a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=I32)
            return (carry + out[:8, :128]) & 0x7FFF

        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.ones((8, 128), I32))

    a = rng.integers(-5, 5, size=(M, K)).astype(np.int8)
    b = rng.integers(-5, 5, size=(K, N)).astype(np.int8)

    @jax.jit
    def fn(a, b, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(a, b)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(a), jnp.asarray(b), jnp.int32(1))
    tag = "onehot" if onehot else "prebkd"
    print(f"dot-in-loop {tag} ({M},{K})x({K},{N}): {dt/reps*1e9:8.1f} ns/iter")


def transpose_loop(T, reps):
    reps = reps_for(reps)

    def k(x_ref, o_ref):
        def body(t, carry):
            tr = x_ref[:].T
            return (carry + tr[:8, :128] + t) & 0x7FFF
        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((8, 128), I32))
    x = rng.integers(0, 99, size=(T, 1024)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"transpose-in-loop ({T},1024): {dt/reps*1e9:8.1f} ns/iter")


def dma_loop(reps):
    reps = reps_for(reps)

    def k(x_ref, o_ref, buf, sem):
        def body(t, carry):
            dma = pltpu.make_async_copy(x_ref.at[pl.ds((t % 32) * 8, 8), :], buf, sem)
            dma.start()
            dma.wait()
            return (carry + buf[0:8, 0:128]) & 0x7FFF
        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((8, 128), I32))
    x = rng.integers(0, 99, size=(512, 1024)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((8, 1024), I32), pltpu.SemaphoreType.DMA(())],
            interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"dma-in-loop (8,1024): {dt/reps*1e9:8.1f} ns/iter")


def main():
    print(f"interpret={INTERPRET}")
    dispatch_overhead()
    run("T32", lambda: trip_core(32, False, 1 << 20))
    run("T128", lambda: trip_core(128, False, 1 << 19))
    run("TX", lambda: trip_core(32, True, 1 << 19))
    run("G1024", lambda: gather_loop(1024, 1 << 19))
    run("G8", lambda: gather_loop(8, 1 << 20))
    run("M1", lambda: matmul_loop(1024, 256, 128, False, 1 << 15))
    run("M2", lambda: matmul_loop(1024, 32, 128, True, 1 << 15))
    run("M3", lambda: matmul_loop(1024, 288, 128, True, 1 << 14))
    run("TR", lambda: transpose_loop(128, 1 << 15))
    run("DMA", lambda: dma_loop(1 << 16))


if __name__ == "__main__":
    main()
