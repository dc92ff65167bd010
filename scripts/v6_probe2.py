"""Round-5 micro-probes: cost of the fetch-body primitives in isolation
(transpose, wide gather, sublane-axis gather, place8, sel_row) — each
timed over an in-kernel fori loop of K reps so the per-op cost resolves
above the ~27 ms dispatch overhead.  Run with the default env (axon TPU)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
K = 512


def run_loop(name, body, x):
    """Time body(i, acc, x_ref) over K in-kernel iterations."""
    try:
        def kernel(x_ref, s_ref, o_ref):
            def f(i, acc):
                return body(i + s_ref[0, 0], acc, x_ref)
            o_ref[:] = jax.lax.fori_loop(0, K, f, jnp.zeros((8, 128), I32))

        def g(x, salt):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, salt)

        fj = jax.jit(g)
        salt0 = jnp.zeros((8, 128), I32)
        np.asarray(fj(x, salt0))
        triv = jax.jit(lambda v: v + 1)
        int(triv(jnp.uint32(0)))
        t0 = time.perf_counter()
        for k in range(5):
            int(triv(jnp.uint32(k)))
        over = (time.perf_counter() - t0) / 5
        best = 1e9
        for r in range(1, 4):
            t0 = time.perf_counter()
            np.asarray(fj(x, salt0 + r))
            best = min(best, time.perf_counter() - t0)
        eff = max(best - over, 0)
        print(f"{name}: {eff/K*1e6:.3f} us/op (total {eff*1e3:.2f} ms)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:300]}", flush=True)


def to_regs(mat, q):
    t = mat[:, :q].T
    return [t[k : k + 1, :].reshape(8, 128) for k in range(q)]


def iotaq(q):
    return jax.lax.broadcasted_iota(I32, (1024, q), 1)


def main():
    LW = 1152
    words = jnp.asarray(
        np.arange(1024 * LW, dtype=np.int32).reshape(1024, LW) % 997)
    wordsT = jnp.asarray(
        (np.arange(1024 * LW, dtype=np.int32).reshape(1024, LW) % 997)
        .T.copy())

    # A: (1024, 32) -> (32, 1024) transpose alone
    def bodyA(i, acc, x_ref):
        blk = x_ref[:, 0:128]
        t = (blk[:, :32] + i).T
        return acc + t[0:1, :].reshape(8, 128)
    run_loop("A transpose(1024,32)", bodyA, words)

    # B: one full wfetch equivalent: 9-chunk gather + to_regs(32)
    def bodyB(i, acc, x_ref):
        base = (acc[0, 0] + i) % (LW - 128)
        idx = jnp.clip(jnp.broadcast_to(base, (1024, 1)) + iotaq(128),
                       0, LW - 1)
        out = jnp.zeros((1024, 128), I32)
        for c in range(LW // 128):
            blk = x_ref[:, c * 128 : (c + 1) * 128]
            g = jnp.take_along_axis(blk, jnp.clip(idx - c * 128, 0, 127),
                                    axis=1)
            out = jnp.where((idx >> 7) == c, g, out)
        regs = to_regs(out, 32)
        return acc + regs[0] + regs[31]
    run_loop("B wfetch gather9+to_regs32", bodyB, words)

    # C: the 9-chunk gather only
    def bodyC(i, acc, x_ref):
        base = (acc[0, 0] + i) % (LW - 128)
        idx = jnp.clip(jnp.broadcast_to(base, (1024, 1)) + iotaq(128),
                       0, LW - 1)
        out = jnp.zeros((1024, 128), I32)
        for c in range(LW // 128):
            blk = x_ref[:, c * 128 : (c + 1) * 128]
            g = jnp.take_along_axis(blk, jnp.clip(idx - c * 128, 0, 127),
                                    axis=1)
            out = jnp.where((idx >> 7) == c, g, out)
        return acc + out[:, 0:1].T.reshape(8, 128)
    run_loop("C wfetch gather9 only", bodyC, words)

    # D: sublane-axis gather from the TRANSPOSED stream:
    #    src (LW, 1024), idx (32, 1024) — queue registers with no transpose
    def bodyD(i, acc, x_ref):
        base = (acc[0, 0] + i) % (LW - 64)
        idx = jnp.clip(
            jax.lax.broadcasted_iota(I32, (32, 1024), 0) + base, 0, LW - 1)
        g = jnp.take_along_axis(x_ref[:, :], idx, axis=0)  # (32, 1024)
        return acc + g[0:1, :].reshape(8, 128) + g[31:32, :].reshape(8, 128)
    run_loop("D sublane gather (LW,1024), idx(32,1024)", bodyD, wordsT)

    # D2: same but PER-LANE bases (the real fetch has per-lane cursors)
    def bodyD2(i, acc, x_ref):
        base = (acc[0:1, :].reshape(1, 1024) * 7 + i) % (LW - 64)
        idx = jnp.clip(
            jax.lax.broadcasted_iota(I32, (32, 1024), 0)
            + jnp.broadcast_to(base, (32, 1024)), 0, LW - 1)
        g = jnp.take_along_axis(x_ref[:, :], idx, axis=0)
        return acc + g[0:1, :].reshape(8, 128) + g[31:32, :].reshape(8, 128)
    run_loop("D2 sublane gather per-lane bases", bodyD2, wordsT)

    # E: place8 write path (roll-composed scatter), value side only
    def bodyE(i, acc, x_ref):
        vals8 = x_ref[:, 0:8] + i
        pos8T = (x_ref[:, 8:9] + i) % 32
        B = jnp.concatenate([vals8, jnp.zeros((1024, 248), I32)], axis=1)
        for j in range(5):
            rolled = pltpu.roll(B, 8 << j, 1)
            B = jnp.where((pos8T >> j) & 1 > 0, rolled, B)
        ci = jax.lax.broadcasted_iota(I32, (1024, 256), 1)
        s0 = pos8T * 8
        mask = (ci >= s0) & (ci < s0 + 8)
        r = jnp.where(mask, B, 0)
        return acc + r[:, 0:1].T.reshape(8, 128)
    run_loop("E place8(256)", bodyE, words)

    # F: sel_row over 32 regs (queue consumption, per-substep primitive)
    def bodyF(i, acc, x_ref):
        regs = [x_ref[0:8, c : c + 128] + c for c in range(32)]
        idx = (acc + i) & 31
        level = list(regs)
        bit = 0
        while len(level) > 1:
            nxt = []
            for k in range(0, len(level), 2):
                nxt.append(jnp.where(((idx >> bit) & 1) > 0,
                                     level[k + 1], level[k]))
            level = nxt
            bit += 1
        return acc + level[0]
    run_loop("F sel_row32", bodyF, words)


if __name__ == "__main__":
    main()
