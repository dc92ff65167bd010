#!/usr/bin/env python
"""On-chip probe of the decoder's window machinery: per-lane sequential
decode of K zeta3 codes from a shared bit stream (win_reset/refill/consume +
sliding word tables + read_code_sync), vs the oracle."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgraph_tpu.bits import codes as C
from webgraph_tpu.bits.bitstream import OutputBitStream
from webgraph_tpu.pallas import decode as D
from webgraph_tpu.pallas import pcodes as P

I32 = jnp.int32
U32 = jnp.uint32
K = 8          # codes per lane
NEED = 21      # mirror small-graph cfg
WROWS = 32     # word window rows


def main():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 600, (1024, K)).astype(np.int64)
    obs = OutputBitStream()
    starts = np.zeros(1024, dtype=np.int64)
    for lane in range(1024):
        starts[lane] = obs.written_bits
        for j in range(K):
            obs.write(C.ZETA, int(vals[lane, j]), 3)
    data = obs.to_bytes()
    pad = data + b"\x00" * ((-len(data)) % 4 + 8)
    w32 = np.frombuffer(pad, dtype=">u4").astype(np.uint32)
    words = np.zeros(WROWS * 128, dtype=np.uint32)
    words[: len(w32)] = w32[: len(words)]
    words = words.view(np.int32).reshape(WROWS, 128)
    assert obs.written_bits <= (WROWS - 2) * 128 * 32, obs.written_bits

    reader = P.make_window_reader(C.ZETA, 3)

    def kernel(offs_ref, words_hbm, out_ref, win_ref, wtab_ref, gwst_ref,
               dma_sem):
        dma = pltpu.make_async_copy(words_hbm, win_ref, dma_sem)
        dma.start()
        dma.wait()
        words_ref = win_ref
        gwst_ref[:] = jnp.zeros((8, 1), I32)
        for g in range(8):
            wtab_ref[pl.ds(g, 1), :] = words_ref[pl.ds(0, 1), :]

        def gw_vec():
            return jnp.broadcast_to(gwst_ref[:], (8, 128))

        def slide(stalled, nw):
            @pl.when(D._any(stalled) > 0)
            def _():
                need = jnp.where(stalled, nw, D.NEG)
                m = jnp.min(need, axis=1, keepdims=True)
                cur = gwst_ref[:]
                limit = (WROWS - 2) * 128
                newgw = jnp.where(m < D.NEG, jnp.clip(m, 0, limit), cur)
                gwst_ref[:] = newgw
                for g in range(8):
                    gws = newgw[g, 0]
                    r0 = gws >> 7
                    two = jnp.concatenate(
                        [words_ref[pl.ds(r0, 1), :],
                         words_ref[pl.ds(r0 + 1, 1), :]], axis=1)
                    rolled = pltpu.roll(two, (256 - (gws & 127)) & 255, 1)
                    wtab_ref[pl.ds(g, 1), :] = rolled[:, :128]

        def read_code_sync(win, participate):
            zero = jnp.zeros((8, 128), I32)

            def cond(st):
                return D._any(st[0]) > 0

            def body(st):
                pending_i, win, out, ln = st
                pending = pending_i > 0
                win, st1 = D.win_refill(win, wtab_ref[:], gw_vec(), pending)
                slide(st1, win[4])
                w0, w1, w2, avail, nw = win
                ready = pending & (avail >= NEED)
                v, length = reader(w0, w1)
                out = jnp.where(ready, v.astype(I32), out)
                ln = jnp.where(ready, length, ln)
                win = D.win_consume(win, length, ready)
                return (pending & ~ready).astype(I32), win, out, ln

            st = (participate.astype(I32), win, zero, zero)
            pending, win, out, ln = jax.lax.while_loop(cond, body, st)
            return out, win

        offs = offs_ref[:].reshape(8, 128)
        win = D.win_reset(offs, None)
        on = jnp.ones((8, 128), dtype=bool)
        for j in range(K):
            v, win = read_code_sync(win, on)
            out_ref[pl.ds(j, 1), :] = v.reshape(1, 1024)

    fn = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 1024), lambda t: (0, 0)),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((K, 1024), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, 1024), I32),
        scratch_shapes=[pltpu.VMEM((WROWS, 128), I32), pltpu.VMEM((8, 128), I32),
                        pltpu.VMEM((8, 1), I32), pltpu.SemaphoreType.DMA],
        interpret=os.environ.get("JAX_PLATFORMS", "") == "cpu",
    )
    out = np.asarray(fn(jnp.asarray(starts.astype(np.int32)).reshape(1, 1024),
                        jnp.asarray(words)))
    got = out.T  # (1024, K)
    ok = np.array_equal(got.astype(np.int64), vals)
    print("window machinery:", "ok" if ok else "BAD")
    if not ok:
        bad = np.argwhere(got.astype(np.int64) != vals)
        print("num bad:", len(bad), "first:", bad[:8].tolist())
        for lane, j in bad[:6]:
            print(f"  lane {lane} code {j}: got {got[lane, j]} exp {vals[lane, j]}"
                  f" start={starts[lane]}")


if __name__ == "__main__":
    main()
