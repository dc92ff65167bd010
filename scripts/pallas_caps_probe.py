#!/usr/bin/env python
"""Capability probe for the in-kernel BVGraph decoder (PERF.md §3).

Exercises every Mosaic building block the decode kernel needs, each as a
small self-checking pallas_call:

  1. clz + shifts on (8, 128) uint32 registers                 (code decode)
  2. take_along_axis with narrow idx (N, 16) from (N, 128)     (window refill)
  3. per-row variable roll via log-shift (roll + where)        (ragged writer)
  4. int32 value scatter via 4x int8 byte-plane one-hot matmul (ragged writer)
  5. fori_loop with multi-array carries + @pl.when             (merge loop)
  6. manual DMA HBM->VMEM at dynamic offset + VMEM->HBM out    (copybuf/out)
  7. scalar-prefetch grid spec driving a BlockSpec index_map   (tile staging)

Run with JAX_PLATFORMS=cpu for interpret mode; default env = real chip.
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
U32 = jnp.uint32


def check(name, fn):
    try:
        fn()
        print(f"[ok]   {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


# 1. clz / shift decode math on 2D registers ---------------------------------
def probe_clz():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        h = jnp.where(x > 0, jax.lax.clz(x), 32).astype(I32)
        o_ref[:] = h

    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, size=(8, 128), dtype=np.uint64).astype(np.uint32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        interpret=INTERPRET,
    )(x)
    exp = 32 - np.int32(np.floor(np.log2(np.maximum(np.asarray(x), 1)))) - 1
    exp = np.where(np.asarray(x) > 0, exp, 32)
    assert np.array_equal(np.asarray(out), exp)


# 2. take_along_axis narrow idx ----------------------------------------------
def probe_take_narrow():
    N = 256
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    rng = np.random.default_rng(1)
    t = rng.integers(0, 1 << 30, size=(N, 128)).astype(np.int32)
    idx = rng.integers(0, 128, size=(N, 16)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 16), I32),
        interpret=INTERPRET,
    )(jnp.asarray(t), jnp.asarray(idx))
    assert np.array_equal(np.asarray(out), np.take_along_axis(t, idx, axis=1))


# 3. per-row variable roll (log-shift network) --------------------------------
def probe_var_roll():
    N = 256
    def kernel(x_ref, s_ref, o_ref):
        x = x_ref[:]
        s = s_ref[:]  # (N, 1) desired left-rotate per row
        for b in range(7):
            bit = (s >> b) & 1
            rolled = pltpu.roll(x, 128 - (1 << b), 1)  # left-rotate by 2^b
            x = jnp.where(bit > 0, rolled, x)
        o_ref[:] = x

    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 30, size=(N, 128)).astype(np.int32)
    s = rng.integers(0, 128, size=(N, 1)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 128), I32),
        interpret=INTERPRET,
    )(jnp.asarray(x), jnp.asarray(s))
    exp = np.stack([np.roll(x[i], -int(s[i, 0])) for i in range(N)])
    assert np.array_equal(np.asarray(out), exp)


# 4. int32 scatter rows via byte-plane one-hot matmul --------------------------
def probe_onehot_scatter():
    L, R = 256, 64  # L source rows -> R dest rows of 128

    def kernel(v_ref, d_ref, o_ref):
        v = v_ref[:]          # (L, 128) int32 values (zero where no write)
        drow = d_ref[:]       # (L, 1) dest row per source row
        onehot = (drow == jax.lax.broadcasted_iota(I32, (L, R), 1)).astype(jnp.int8)
        acc = jnp.zeros((R, 128), dtype=I32)
        for sh in (0, 8, 16, 24):
            plane = ((v >> sh) & 0xFF).astype(jnp.int8)
            part = jax.lax.dot_general(
                onehot, plane,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=I32,
            )
            # int8 plane is sign-extended; mask back to the byte then shift
            acc = acc + ((part & 0xFF) << sh)
        o_ref[:] = acc

    # real ragged-writer pattern: dest rows may collide but every (row, col)
    # cell has at most ONE nonzero contributor (output positions are unique)
    rng = np.random.default_rng(3)
    v = np.zeros((L, 128), np.int32)
    drow = np.zeros((L, 1), np.int32)
    for i in range(L):
        drow[i, 0] = i % R
        cols = np.arange(32) + 32 * (i // R)  # disjoint col block per colliding row
        v[i, cols] = rng.integers(0, 1 << 31, size=32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), I32),
        interpret=INTERPRET,
    )(jnp.asarray(v), jnp.asarray(drow))
    exp = np.zeros((R, 128), np.int64)
    for i in range(L):
        exp[drow[i, 0]] += v[i]
    exp32 = (exp % (1 << 32)).astype(np.uint32).view(np.int32)
    assert np.array_equal(np.asarray(out), exp32), "scatter mismatch"


# 5. fori_loop multi-carry + pl.when ------------------------------------------
def probe_fori():
    def kernel(x_ref, o_ref, cnt_ref):
        def body(i, carry):
            a, b = carry
            a = a + x_ref[:]
            b = b + 1
            return a, b

        a, b = jax.lax.fori_loop(0, 7, body, (jnp.zeros((8, 128), I32), jnp.zeros((1, 1), I32)))

        @pl.when(b[0, 0] == 7)
        def _():
            o_ref[:] = a

        cnt_ref[0, 0] = b[0, 0]

    x = jnp.ones((8, 128), I32)
    o, c = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((8, 128), I32), jax.ShapeDtypeStruct((1, 1), I32)),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=INTERPRET,
    )(x)
    assert int(c[0, 0]) == 7 and int(np.asarray(o)[0, 0]) == 7


# 6. manual DMA with dynamic offsets ------------------------------------------
def probe_dma():
    W = 4096

    def kernel(start_ref, hbm_ref, out_hbm_ref, scratch, sem0, sem1):
        start = start_ref[0]
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(start, 256), :], scratch, sem0
        )
        dma.start()
        dma.wait()
        scratch[:] = scratch[:] * 2
        dma2 = pltpu.make_async_copy(
            scratch, out_hbm_ref.at[pl.ds(start + 8, 256), :], sem1
        )
        dma2.start()
        dma2.wait()

    rng = np.random.default_rng(4)
    h = rng.integers(0, 1 << 30, size=(W, 128)).astype(np.int32)
    start = jnp.asarray([128], dtype=I32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, 128), I32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((256, 128), I32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(start, jnp.asarray(h))
    got = np.asarray(out)[136:392]
    assert np.array_equal(got, h[128:384] * 2)


# 7. scalar-prefetch grid spec driving index_map -------------------------------
def probe_prefetch():
    NT, ROWS = 4, 8

    def kernel(srows_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    rng = np.random.default_rng(5)
    x = rng.integers(0, 100, size=(64, 128)).astype(np.int32)
    srows = np.asarray([0, 2, 5, 7], np.int32)  # per-tile row block index

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((ROWS, 128), lambda t, srows: (srows[t], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, 128), lambda t, srows: (t, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NT * ROWS, 128), I32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(jnp.asarray(srows), jnp.asarray(x))
    out = np.asarray(out)
    for t in range(NT):
        assert np.array_equal(out[t * ROWS:(t + 1) * ROWS], x[srows[t] * ROWS:(srows[t] + 1) * ROWS] + 1), f"tile {t}"


def main():
    results = {}
    for name, fn in [
        ("clz/shift decode math", probe_clz),
        ("take_along narrow idx", probe_take_narrow),
        ("per-row variable roll", probe_var_roll),
        ("int32 one-hot scatter", probe_onehot_scatter),
        ("fori_loop + pl.when", probe_fori),
        ("manual dynamic DMA", probe_dma),
        ("scalar-prefetch index_map", probe_prefetch),
        ("take_along wide operand", probe_take_wide),
        ("DMA flatten VMEM->VMEM", probe_dma_flatten),
        ("2D transpose", probe_transpose),
        ("dot_general dim0 contract", probe_dot_dim0),
        ("reshape 8x128->1024x1", probe_reshape),
    ]:
        results[name] = check(name, fn)
    n_ok = sum(results.values())
    print(f"{n_ok}/{len(results)} capabilities OK (interpret={INTERPRET})")




# 8. take_along on WIDE operand (8, W) with native idx width (8, 128) --------
def probe_take_wide():
    W = 4096
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    rng = np.random.default_rng(8)
    t = rng.integers(0, 1 << 30, size=(8, W)).astype(np.int32)
    idx = rng.integers(0, W, size=(8, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), I32),
        interpret=INTERPRET,
    )(jnp.asarray(t), jnp.asarray(idx))
    assert np.array_equal(np.asarray(out), np.take_along_axis(t, idx, axis=1))


# 9. VMEM->VMEM DMA that flattens (N,128) rows into one wide row -------------
def probe_dma_flatten():
    N = 16

    def kernel(x_ref, o_ref, flat, sem):
        dma = pltpu.make_async_copy(x_ref, flat.at[0], sem)
        dma.start()
        dma.wait()
        o_ref[:] = flat[:]

    rng = np.random.default_rng(9)
    x = rng.integers(0, 1 << 30, size=(N, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, N * 128), I32),
        scratch_shapes=[
            pltpu.VMEM((8, N * 128), I32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=INTERPRET,
    )(jnp.asarray(x))
    assert np.array_equal(np.asarray(out)[0], x.reshape(-1))


# 10. 2D transpose (128,128) inside kernel ------------------------------------
def probe_transpose():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    rng = np.random.default_rng(10)
    x = rng.integers(0, 1 << 30, size=(128, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), I32),
        interpret=INTERPRET,
    )(jnp.asarray(x))
    assert np.array_equal(np.asarray(out), x.T)


# 11. dot_general contracting dim 0 of both operands (transposed matmul) -----
def probe_dot_dim0():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=I32,
        )

    rng = np.random.default_rng(11)
    a = rng.integers(-10, 10, size=(64, 128)).astype(np.int8)
    b = rng.integers(-10, 10, size=(64, 128)).astype(np.int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), I32),
        interpret=INTERPRET,
    )(jnp.asarray(a), jnp.asarray(b))
    assert np.array_equal(np.asarray(out), a.astype(np.int32).T @ b.astype(np.int32))


# 12. reshape (8,128) <-> (1024,1)-ish relayouts ------------------------------
def probe_reshape():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1024, 1)

    rng = np.random.default_rng(12)
    x = rng.integers(0, 1 << 30, size=(8, 128)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024, 1), I32),
        interpret=INTERPRET,
    )(jnp.asarray(x))
    assert np.array_equal(np.asarray(out).reshape(8, 128), x)


if __name__ == "__main__":
    main()
