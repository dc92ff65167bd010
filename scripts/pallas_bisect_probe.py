#!/usr/bin/env python
"""Bisect Mosaic compile failures seen in pallas_perf_probe on-chip:
  - take_along_axis works on (N,128) tables but fails on (8,W) wide ones
  - int8 one-hot dot_general fails
  - transpose (T,1024) fails
Each case is a tiny pallas_call; prints ok/FAIL + first error lines.
"""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("JAX_PLATFORMS", "") == "cpu"
I32 = jnp.int32


def run(name, fn):
    try:
        fn()
        print(f"[ok]   {name}")
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).splitlines() if l.strip()][:4]
        print(f"[FAIL] {name}: {type(e).__name__}")
        for l in lines:
            print(f"       {l[:160]}")


def pc(kernel, out_shape, *args, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        scratch_shapes=list(scratch),
        interpret=INTERPRET,
    )(*args)


rng = np.random.default_rng(0)


# --- gather variants ---------------------------------------------------------
def g_n128(N):
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    t = rng.integers(0, 99, size=(N, 128)).astype(np.int32)
    i = rng.integers(0, 128, size=(N, 128)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((N, 128), I32), jnp.asarray(t), jnp.asarray(i))
    assert np.array_equal(np.asarray(out), np.take_along_axis(t, i, axis=1))


def g_wide(N, W):
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
    t = rng.integers(0, 99, size=(N, W)).astype(np.int32)
    i = rng.integers(0, W, size=(N, W)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((N, W), I32), jnp.asarray(t), jnp.asarray(i))
    assert np.array_equal(np.asarray(out), np.take_along_axis(t, i, axis=1))


def g_axis0(N):
    def k(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
    t = rng.integers(0, 99, size=(N, 128)).astype(np.int32)
    i = rng.integers(0, N, size=(N, 128)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((N, 128), I32), jnp.asarray(t), jnp.asarray(i))
    assert np.array_equal(np.asarray(out), np.take_along_axis(t, i, axis=0))


# --- dot_general variants ----------------------------------------------------
def dot_var(M, K, N, dtype, pref):
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=pref,
        )
    a = rng.integers(-5, 5, size=(M, K)).astype(dtype)
    b = rng.integers(-5, 5, size=(K, N)).astype(dtype)
    out = pc(k, jax.ShapeDtypeStruct((M, N), pref), jnp.asarray(a), jnp.asarray(b))
    exp = a.astype(np.float64) @ b.astype(np.float64)
    assert np.allclose(np.asarray(out).astype(np.float64), exp), "mismatch"


def dot_onehot_inkernel(M, R):
    """one-hot built IN kernel from iota compare, then int8 matmul."""
    def k(idx_ref, p_ref, o_ref):
        idx = idx_ref[:].reshape(M, 1)
        onehot = (idx == jax.lax.broadcasted_iota(I32, (M, R), 1)).astype(jnp.int8)
        part = jax.lax.dot_general(
            onehot, p_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=I32,
        )
        o_ref[:] = part
    idxs = rng.integers(0, R, size=(M // 128, 128)).astype(np.int32)
    pool = rng.integers(-100, 100, size=(R, 128)).astype(np.int8)
    out = pc(k, jax.ShapeDtypeStruct((M, 128), I32), jnp.asarray(idxs), jnp.asarray(pool))
    exp = pool.astype(np.int32)[idxs.reshape(-1)]
    assert np.array_equal(np.asarray(out), exp)


# --- transpose / reshape variants ---------------------------------------------
def tr(T, C):
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].T
    x = rng.integers(0, 99, size=(T, C)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((C, T), I32), jnp.asarray(x))
    assert np.array_equal(np.asarray(out), x.T)


def rshp(a, b):
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(b)
    x = rng.integers(0, 99, size=a).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct(b, I32), jnp.asarray(x))
    assert np.array_equal(np.asarray(out), x.reshape(b))


def bcast(N, W):
    """(1, W) -> (N, W) broadcast in kernel (pool replication)."""
    def k(x_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(x_ref[:], (N, W))
    x = rng.integers(0, 99, size=(1, W)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((N, W), I32), jnp.asarray(x))
    assert np.array_equal(np.asarray(out), np.broadcast_to(x, (N, W)))


def main():
    print(f"interpret={INTERPRET}")
    run("gather (8,128)", lambda: g_n128(8))
    run("gather (1024,128)", lambda: g_n128(1024))
    run("gather (8192,128)", lambda: g_n128(8192))
    run("gather (8,256) wide", lambda: g_wide(8, 256))
    run("gather (8,512) wide", lambda: g_wide(8, 512))
    run("gather (1024,256) wide", lambda: g_wide(1024, 256))
    run("gather axis0 (256,128)", lambda: g_axis0(256))
    run("dot i8 (256,64)x(64,128)->i32", lambda: dot_var(256, 64, 128, np.int8, I32))
    run("dot i8 (1024,256)x(256,128)->i32", lambda: dot_var(1024, 256, 128, np.int8, I32))
    run("dot i8 (1024,288)x(288,128)->i32", lambda: dot_var(1024, 288, 128, np.int8, I32))
    run("dot f32 (1024,256)x(256,128)", lambda: dot_var(1024, 256, 128, np.float32, jnp.float32))
    run("dot bf16 (1024,256)x(256,128)->f32", lambda: dot_var(1024, 256, 128, jnp.bfloat16, jnp.float32))
    run("onehot-inkernel i8 (1024,256)", lambda: dot_onehot_inkernel(1024, 256))
    run("transpose (128,128)", lambda: tr(128, 128))
    run("transpose (128,1024)", lambda: tr(128, 1024))
    run("transpose (512,1024)", lambda: tr(512, 1024))
    run("reshape (8,128)->(1024,1)", lambda: rshp((8, 128), (1024, 1)))
    run("reshape (8,128)->(1,1024)", lambda: rshp((8, 128), (1, 1024)))
    run("reshape (128,1024)->(1024,128)", lambda: rshp((128, 1024), (1024, 128)))
    run("broadcast (1,4096)->(8,4096)", lambda: bcast(8, 4096))


if __name__ == "__main__":
    main()
