#!/usr/bin/env python
"""Round-2 bisect: pin down the exact working forms for
   (a) in-kernel one-hot row gather (cross-sublane data movement)
   (b) transpose inside fori_loop
   (c) dynamic cross-sublane roll
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("JAX_PLATFORMS", "") == "cpu"
I32 = jnp.int32
rng = np.random.default_rng(7)


def run(name, fn):
    try:
        fn()
        print(f"[ok]   {name}")
    except Exception as e:  # noqa: BLE001
        lines = [l for l in str(e).splitlines() if l.strip()][:2]
        print(f"[FAIL] {name}: {type(e).__name__}: {lines[0][:130] if lines else ''}")


def pc(kernel, out_shape, *args, scratch=()):
    return pl.pallas_call(kernel, out_shape=out_shape,
                          scratch_shapes=list(scratch), interpret=INTERPRET)(*args)


def onehotT_gather(R, dtype_name):
    """out rows = pool rows selected per lane; onehot built in kernel as
    (R, 1024) from a (1,1024) idx; dot contracts dim 0 of both operands."""
    def k(idx_ref, pool_ref, o_ref):
        idx = idx_ref[:].reshape(1, 1024)
        iota = jax.lax.broadcasted_iota(I32, (R, 1024), 0)
        if dtype_name == "i8":
            onehotT = (iota == idx).astype(jnp.int8)
            planes = [((pool_ref[:] >> s) & 0xFF).astype(jnp.int8) for s in (0, 8, 16, 24)]
            acc = jnp.zeros((1024, 128), I32)
            for i, sh in enumerate((0, 8, 16, 24)):
                part = jax.lax.dot_general(
                    onehotT, planes[i],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=I32,
                )
                acc = acc + ((part & 0xFF) << sh)
            o_ref[:] = acc
        else:
            onehotT = (iota == idx).astype(jnp.bfloat16)
            acc = jnp.zeros((1024, 128), I32)
            for i, sh in enumerate((0, 8, 16, 24)):
                plane = ((pool_ref[:] >> sh) & 0xFF).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    onehotT, plane,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + (part.astype(I32) << sh)
            o_ref[:] = acc

    idx = rng.integers(0, R, size=(8, 128)).astype(np.int32)
    pool = rng.integers(0, 1 << 31, size=(R, 128)).astype(np.uint32).view(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((1024, 128), I32), jnp.asarray(idx), jnp.asarray(pool))
    exp = pool[idx.reshape(-1)]
    assert np.array_equal(np.asarray(out), exp), "value mismatch"


def transpose_in_loop():
    def k(x_ref, o_ref):
        def body(t, carry):
            tr = x_ref[:].T
            return carry + tr[:8, :128] + t
        o_ref[:] = jax.lax.fori_loop(0, 4, body, jnp.zeros((8, 128), I32))
    x = rng.integers(0, 99, size=(128, 1024)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((8, 128), I32), jnp.asarray(x))
    exp = 4 * x.T[:8, :128] + 6
    assert np.array_equal(np.asarray(out), exp)


def dyn_roll():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 0)
    x = rng.integers(0, 99, size=(512, 128)).astype(np.int32)
    s = np.asarray([5], np.int32)
    out = pc(k, jax.ShapeDtypeStruct((512, 128), I32), jnp.asarray(x), jnp.asarray(s))
    assert np.array_equal(np.asarray(out), np.roll(x, 5, 0))


def gather_in_loop(N):
    """(N,128) gather with idx built from loop carry (realistic merge shape)."""
    def k(t_ref, o_ref):
        tbl = t_ref[:]
        zero = jnp.zeros((N, 128), I32)
        def body(t, carry):
            idx = (zero + carry[:1, :128]) % 128
            vals = jnp.take_along_axis(tbl, idx, axis=1)
            return (carry + vals[:8, :128]) & 0xFFFF
        o_ref[:] = jax.lax.fori_loop(0, 4, body, jnp.ones((8, 128), I32))
    t = rng.integers(0, 99, size=(N, 128)).astype(np.int32)
    pc(k, jax.ShapeDtypeStruct((8, 128), I32), jnp.asarray(t))


def scatter_onehot(R):
    """in-kernel one-hot SCATTER: (R,1024) onehot @ (1024,128)? No — values
    are (8,128) per trip = (1,1024) row; scatter into (R,128) pool rows:
    dot( onehotT (R,1024) , vals' (1024,128)?? ) — vals must be (1024,128).
    Simplest: place each lane's value in its own row via transpose first."""
    def k(idx_ref, val_ref, o_ref):
        idx = idx_ref[:].reshape(1, 1024)
        onehotT = (jax.lax.broadcasted_iota(I32, (R, 1024), 0) == idx)
        vals = val_ref[:].reshape(1, 1024).astype(jnp.bfloat16)
        contrib = jnp.where(onehotT, vals, jnp.bfloat16(0))  # (R,1024)
        ones = jnp.ones((1024, 1), jnp.bfloat16)
        out = jax.lax.dot_general(
            contrib, ones, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R,1)
        o_ref[:] = (out.astype(I32) + jnp.zeros((R, 128), I32))
    idx = rng.integers(0, R, size=(8, 128)).astype(np.int32)
    val = rng.integers(0, 200, size=(8, 128)).astype(np.int32)
    out = pc(k, jax.ShapeDtypeStruct((R, 128), I32), jnp.asarray(idx), jnp.asarray(val))
    exp = np.zeros(R, np.int64)
    np.add.at(exp, idx.reshape(-1), val.reshape(-1))
    assert np.array_equal(np.asarray(out)[:, 0], exp), "scatter mismatch"


def main():
    print(f"interpret={INTERPRET}")
    run("onehotT gather i8 R=256", lambda: onehotT_gather(256, "i8"))
    run("onehotT gather i8 R=576", lambda: onehotT_gather(576, "i8"))
    run("onehotT gather bf16 R=256", lambda: onehotT_gather(256, "bf16"))
    run("transpose in fori_loop", transpose_in_loop)
    run("dynamic roll axis0", dyn_roll)
    run("gather (1024,128) in loop", lambda: gather_in_loop(1024))
    run("gather (4096,128) in loop", lambda: gather_in_loop(4096))
    run("onehot scatter-sum bf16 R=256", lambda: scatter_onehot(256))


if __name__ == "__main__":
    main()
