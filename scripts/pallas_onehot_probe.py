#!/usr/bin/env python
"""Probe: arbitrary VMEM gather inside a Pallas TPU kernel via the MXU
one-hot trick + per-sublane dynamic_gather.

out[i, j] = T[idx[i, j]] for a flat uint32 table T of W words, idx (N, 128):
  1. view T as 4 byte planes T_k (R, 128) int8, R = W/128 (byte k of word);
  2. row r_i = idx[i, 0] // 128 (the probe gathers all of row i's words
     from one table row per output row — the decode kernel's access
     pattern): row_bytes_k = onehot(r) @ T_k (int8 x int8 -> int32, exact);
  3. word = (b0 & 0xff) << 24 | ... (no reshapes — Mosaic rejects 3D);
  4. column c = idx % 128: take_along_axis along axis 1 (Mosaic
     tpu.dynamic_gather form 2).

If this compiles + matches on the axon chip, the full in-kernel decode
queue (PERF.md §3) is buildable.  JAX_PLATFORMS=cpu -> interpret mode.
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


def gather_kernel(t0, t1, t2, t3, idx_ref, out_ref):
    idx = idx_ref[:]
    N = idx.shape[0]
    R = t0.shape[0]
    rows0 = idx[:, 0] >> 7
    c = idx & 127
    onehot = (rows0[:, None] == jax.lax.broadcasted_iota(I32, (N, R), 1)).astype(jnp.int8)

    def plane(t_ref):
        b = jax.lax.dot_general(
            onehot, t_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=I32,
        )
        return b.astype(U32) & U32(0xFF)

    words = (plane(t0) << 24) | (plane(t1) << 16) | (plane(t2) << 8) | plane(t3)
    out_ref[:] = jnp.take_along_axis(words, c, axis=1)


def main():
    rng = np.random.default_rng(0)
    W = 128 * 64  # 8192-word table
    words = rng.integers(0, 2**32, size=W, dtype=np.uint64).astype(np.uint32)
    planes = [
        ((words >> sh) & 0xFF).astype(np.int8).reshape(W // 128, 128)
        for sh in (24, 16, 8, 0)
    ]
    N = 256
    rows0 = rng.integers(0, W // 128, size=N)
    cols = rng.integers(0, 128, size=(N, 128))
    cols[:, 0] = rng.integers(0, 128, size=N)
    idx = (rows0[:, None] * 128 + cols).astype(np.int32)

    fn = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 128), U32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )
    args = [jnp.asarray(p) for p in planes] + [jnp.asarray(idx)]
    out = np.asarray(jax.jit(fn)(*args))
    expect = words[idx]
    assert np.array_equal(out, expect), f"mismatch:\n{out[:2, :4]}\nvs\n{expect[:2, :4]}"
    print(f"one-hot VMEM gather OK (interpret={INTERPRET}): {N*128} words gathered exactly")

    if not INTERPRET:
        f = jax.jit(lambda *a: fn(*a).astype(U32).sum())
        _ = int(f(*args))
        t0 = time.perf_counter()
        for r in range(5):
            args[-1] = jnp.asarray((idx + r) % W)
            _ = int(f(*args))
        dt = (time.perf_counter() - t0) / 5
        print(f"{dt*1e3:.2f} ms per call ({N*128} gathers) incl ~30ms dispatch")


if __name__ == "__main__":
    main()
