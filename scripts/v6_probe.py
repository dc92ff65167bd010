"""Probe lowering + cost of the v6 streaming-decoder primitives on the chip.

Run with default env (axon TPU).  Each probe is its own pallas_call; timing
uses the salted dependent-scalar-fetch methodology (CLAUDE.md).
"""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
BF16 = jnp.bfloat16

def timed(fn, *args, reps=3):
    # fn returns scalar-ish array; salt forces distinct executions
    f = jax.jit(fn)
    s0 = int(np.uint32(f(*args, jnp.uint32(0))))
    triv = jax.jit(lambda x: x + 1)
    int(triv(jnp.uint32(0)))
    t0 = time.perf_counter()
    for k in range(5):
        int(triv(jnp.uint32(k)))
    over = (time.perf_counter() - t0) / 5
    best = 1e9
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        int(np.uint32(f(*args, jnp.uint32(r))))
        best = min(best, time.perf_counter() - t0)
    return max(best - over, 0.0), s0

# ---------------- P1: take_along_axis along axis 0 (sublanes) ----------
def probe_ta0():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    x = jnp.arange(128 * 1024, dtype=I32).reshape(128, 1024)
    idx = jnp.tile(jnp.arange(16, dtype=I32).reshape(16, 1) * 7 % 128, (1, 1024))
    try:
        f = pl.pallas_call(k,
            out_shape=jax.ShapeDtypeStruct((16, 1024), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        r = jax.jit(f)(x, idx)
        exp = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
        print("P1 ta0 (128,1024) idx(16,1024):", "OK" if np.array_equal(np.asarray(r), exp) else "WRONG")
    except Exception as e:
        print("P1 ta0 FAIL:", repr(e)[:400])

# ---------------- P2: transpose (8,1024)->(1024,8) + 8-col RMW ---------
def probe_t8():
    def k(x_ref, o_ref):
        t = x_ref[:].T  # (1024,8)
        acc = jnp.zeros((1024, 128), I32)
        # write t into col block p=3
        ci = jax.lax.broadcasted_iota(I32, (1024, 128), 1)
        acc = jnp.where((ci >= 24) & (ci < 32), jnp.pad(t, ((0, 0), (24, 96))), acc)
        o_ref[:] = acc
    x = jnp.arange(8 * 1024, dtype=I32).reshape(8, 1024)
    try:
        f = pl.pallas_call(k,
            out_shape=jax.ShapeDtypeStruct((1024, 128), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        r = np.asarray(jax.jit(f)(x))
        exp = np.zeros((1024, 128), np.int32)
        exp[:, 24:32] = np.asarray(x).T
        print("P2 transpose+pad:", "OK" if np.array_equal(r, exp) else "WRONG")
    except Exception as e:
        print("P2 FAIL:", str(e)[:300])

# ---------------- P3: representative trip-body loop cost ----------------
def probe_trip(ntrips=65536, U=8, QD=32):
    """Emulate the state-machine inner loop: per trip, U sub-steps of
    (queue sel_row + window shift math + merge selects + ab append)."""
    def sel_row(rows, idx):
        level = list(rows); bit = 0
        while len(level) > 1:
            nxt = []
            for i in range(0, len(level), 2):
                nxt.append(jnp.where(((idx >> bit) & 1) > 0, level[i + 1], level[i]))
            level = nxt; bit += 1
        return level[0]

    def k(w_ref, o_ref, salt_ref):
        q = tuple(w_ref[i] for i in range(QD))  # (8,128) rows
        z = jnp.zeros((8, 128), I32)
        salt = salt_ref[0]

        def body(t, st):
            acc, cur, w0, w1, ap, ab0, ab1, ab2, ab3 = st
            for u in range(U):
                w = sel_row(q, cur & (QD - 1)).astype(jnp.uint32)
                # window-ish math: shifts, clz-ish, merge selects
                sh = (cur & 31).astype(jnp.uint32)
                hi = (w0 << sh) | jnp.where(sh > 0, w1 >> (32 - sh), 0)
                v = (hi >> 24).astype(I32)
                ln = (v & 7) + 1
                w0 = jnp.where(u % 2 == 0, hi, w0)
                w1 = jnp.where(u % 2 == 0, w1 ^ w.astype(jnp.uint32), w1)
                ch = v; eh = acc & 255; ih = cur & 255
                emit = jnp.minimum(jnp.minimum(ch, eh), ih)
                take_c = (ch <= eh) & (ch <= ih)
                cur = cur + jnp.where(take_c, 1, 2)
                # ab append via 4-reg select (ab as 4 rows of (8,128) = 32 slots? emulate 8-deep with 8 regs would be 8 selects; use 4)
                ab0 = jnp.where((ap & 3) == 0, emit, ab0)
                ab1 = jnp.where((ap & 3) == 1, emit, ab1)
                ab2 = jnp.where((ap & 3) == 2, emit, ab2)
                ab3 = jnp.where((ap & 3) == 3, emit, ab3)
                ap = ap + 1
                acc = acc + emit + ln
            return (acc, cur, w0, w1, ap, ab0, ab1, ab2, ab3)

        st = (z + salt.astype(I32), z, jnp.zeros((8, 128), jnp.uint32),
              jnp.zeros((8, 128), jnp.uint32), z, z, z, z, z)
        st = jax.lax.fori_loop(0, ntrips, body, st)
        o_ref[0, 0] = jnp.sum(st[0]).astype(I32)

    w = jnp.arange(QD * 8 * 128, dtype=I32).reshape(QD, 8, 128)
    def run(wa, salt):
        return pl.pallas_call(k,
            out_shape=jax.ShapeDtypeStruct((1, 1), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            grid_spec=None,
        )(wa)
    # need salt input: use SMEM spec via grid-less call
    def k2(w_ref, s_ref, o_ref):
        k(w_ref, o_ref, s_ref)
    def fn(wa, salt):
        salt_arr = jnp.full((1,), salt, jnp.uint32)
        return pl.pallas_call(k2,
            out_shape=jax.ShapeDtypeStruct((1, 1), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))(wa, salt_arr)[0, 0].astype(jnp.uint32)
    dt, _ = timed(fn, w)
    print(f"P3 trip loop: {ntrips} trips x {U} sub-steps, QD={QD}: {dt*1e3:.2f} ms = {dt/ntrips*1e6:.2f} us/trip")

# ---------------- P4: one-hot stream fetch + chunked slab gather --------
def probe_fetch():
    ROWS = 384  # per-group stream rows
    def k(pl_ref, r0_ref, slab_ref, idx_ref, o_ref, s_ref):
        # (a) per-group one-hot fetch: 8 groups x (128, ROWS) @ (ROWS, 128)
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(8):
            r0 = r0_ref[g]  # (128,) int32 row per lane -> one-hot
            iota = jax.lax.broadcasted_iota(I32, (128, ROWS), 1)
            oh = (iota == r0.reshape(128, 1)).astype(BF16)
            half = pl_ref[g]  # (ROWS, 128) bf16
            acc = acc + jax.lax.dot_general(oh, half,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # (b) chunked slab gather: 32 chunks of (1024,128), select tree
        idx = idx_ref[:]  # (1024,128) int32 in [0, 4096)
        got = jnp.zeros((1024, 128), I32)
        for c in range(32):
            g = jnp.take_along_axis(slab_ref[:, c * 128:(c + 1) * 128], idx & 127, axis=1)
            got = jnp.where((idx >> 7) == c, g, got)
        o_ref[0, 0] = (jnp.sum(acc).astype(I32) + jnp.sum(got) + s_ref[0].astype(I32))
    planes = jnp.ones((8, ROWS, 128), BF16)
    r0 = jnp.tile(jnp.arange(128, dtype=I32) % ROWS, (8, 1))
    slab = jnp.arange(1024 * 4096, dtype=I32).reshape(1024, 4096) & 0xFFFF
    idx = (jnp.arange(1024 * 128, dtype=I32).reshape(1024, 128) * 37) % 4096
    def fn(planes, r0, slab, idx, salt):
        salt_arr = jnp.full((1,), salt, jnp.uint32)
        def kk(a, b, c, d, s, o):
            k(a, b, c, d, o, s)
        return pl.pallas_call(kk,
            out_shape=jax.ShapeDtypeStruct((1, 1), I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +
                     [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))(planes, r0, slab, idx, salt_arr)[0, 0].astype(jnp.uint32)
    # loop it inside? single call cost is fine to compare vs dispatch overhead... loop 200x:
    def fn200(planes, r0, slab, idx, salt):
        def body(i, acc):
            salt_arr = jnp.full((1,), salt + acc.astype(jnp.uint32) * 0 + i.astype(jnp.uint32), jnp.uint32)
            def kk(a, b, c, d, s, o):
                k(a, b, c, d, o, s)
            r = pl.pallas_call(kk,
                out_shape=jax.ShapeDtypeStruct((1, 1), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +
                         [pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(planes, r0, slab, idx, salt_arr)[0, 0]
            return acc + r
        return jax.lax.fori_loop(0, 20, body, jnp.int32(0)).astype(jnp.uint32) + salt
    dt, _ = timed(fn200, planes, r0, slab, idx)
    print(f"P4 fetch(8xgroup one-hot {ROWS} rows) + 32-chunk slab gather, 20 iters: {dt*1e3:.2f} ms = {dt/20*1e6:.1f} us/iter")

if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe_trip()
    probe_fetch()
