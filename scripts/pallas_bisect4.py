#!/usr/bin/env python
"""Bisect 4: (a) is dot_general-in-fori_loop inherently ~3us or is it the
one-hot build/layout? (b) transpose-in-loop timing, (c) DMA-in-loop timing,
(d) which exact line breaks the J compaction frame."""
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
rng = np.random.default_rng(17)
REPS = 1 << 9 if INTERPRET else 1 << 13


def timeit(fn, *args):
    int(fn(*args))
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


def matmul_inloop(name, M, K, N, build_onehot):
    def k(a_ref, b_ref, o_ref):
        def body(t, carry):
            if build_onehot:
                flat = carry.reshape(1, 1024) % K
                a = (jax.lax.broadcasted_iota(I32, (K, 1024), 0) == flat).astype(I8)
                out = jax.lax.dot_general(
                    a, b_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=I32)  # (1024, N)
                return (carry + out[:8, :128].reshape(8, 128)) & 0x7FFF
            else:
                out = jax.lax.dot_general(
                    a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=I32)  # (M, N)
                return (carry + out[:8, :128]) & 0x7FFF

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.ones((8, 128), I32))

    a = rng.integers(-5, 5, size=(M, K)).astype(np.int8)
    b = rng.integers(-5, 5, size=(K, N)).astype(np.int8)

    @jax.jit
    def fn(a, b, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(a, b)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(a), jnp.asarray(b), jnp.int32(1))
    print(f"{name}: {dt/REPS*1e9:8.1f} ns/iter")


def transpose_inloop(T):
    def k(x_ref, o_ref):
        def body(t, carry):
            tr = x_ref[:].T  # (1024, T)
            return (carry + tr[:8, :128] + t) & 0x7FFF
        o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), I32))
    x = rng.integers(0, 99, size=(T, 1024)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                             interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"transpose-in-loop ({T},1024): {dt/REPS*1e9:8.1f} ns/iter")


def dma_inloop():
    def k(x_ref, o_ref, buf, sem):
        def body(t, carry):
            dma = pltpu.make_async_copy(x_ref.at[pl.ds((t % 32) * 8, 8), :], buf, sem)
            dma.start()
            dma.wait()
            return (carry + buf[0:8, 0:128]) & 0x7FFF
        o_ref[:] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), I32))
    x = rng.integers(0, 99, size=(512, 1024)).astype(np.int32)

    @jax.jit
    def fn(x, salt):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), I32),
            scratch_shapes=[pltpu.VMEM((8, 1024), I32), pltpu.SemaphoreType.DMA(())],
            interpret=INTERPRET)(x)
        return jnp.sum(out + salt)

    dt = timeit(fn, jnp.asarray(x), jnp.int32(1))
    print(f"dma-in-loop (8,1024) slice: {dt/REPS*1e9:8.1f} ns/iter")


# --- J frame bisect ------------------------------------------------------------
def j_frame(name, variant):
    R = 128

    def k(x_ref, pre_ref, o_ref, colbuf):
        if variant >= 1:
            colbuf[:] = jnp.zeros((128, 1024), I32) + x_ref[:].reshape(1, 1024)

        def body(t, carry):
            if variant == 0:
                A = x_ref[:]
                out = A
            elif variant == 1:
                out = colbuf[0:8, 0:128]
            elif variant == 2:
                A = colbuf[:].T
                out = A[:8, :128]
            elif variant == 3:
                A = colbuf[:].T + carry[:1, :1]
                out = A[:8, :128]
            elif variant == 4:
                pre = (pre_ref[:].reshape(1, 1024) + t) % (R * 128 - 256)
                out = pre.reshape(8, 128)
            return carry + out

        o_ref[:] = jax.lax.fori_loop(0, 8, body, x_ref[:])

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
    print(f"J frame v{variant}: ok ({dt*1e3:.1f} ms)")


def main():
    print(f"interpret={INTERPRET} REPS={REPS}")
    run("M1", lambda: matmul_inloop("dot i8 prebaked (1024,256)x(256,128)", 1024, 256, 128, False))
    run("M2", lambda: matmul_inloop("dot i8 prebaked (256,64)x(64,128)  ", 256, 64, 128, False))
    run("M3", lambda: matmul_inloop("dot i8 onehot  (K=288)->(1024,128) ", 1024, 288, 128, True))
    run("M4", lambda: matmul_inloop("dot i8 onehot  (K=32)->(1024,128)  ", 1024, 32, 128, True))
    run("T128", lambda: transpose_inloop(128))
    run("T512", lambda: transpose_inloop(512))
    run("DMA", dma_inloop)
    for v in (0, 1, 2, 3, 4):
        run(f"Jv{v}", lambda v=v: j_frame(f"v{v}", v))


if __name__ == "__main__":
    main()
