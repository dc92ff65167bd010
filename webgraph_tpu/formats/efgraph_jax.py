"""Device (XLA) bulk decoder for the EFGraph format.

Mirrors the host vectorized decoder (`formats/efgraph.py::decode_to_csr`)
as one jitted lockstep program: per successor index i, every live node
reads one unary gap from its upper-bits cursor (LSB-first longword stream,
reference LongWordBitReader semantics, EFGraph.java:892-1034) and extracts
its ``l`` lower bits, producing value ``(hi << l) | low`` — the Elias-Fano
successor enumeration of EFGraph.java:1064-1166, all nodes in parallel.

The per-node structure (outdegree, lower/upper bit bases, l) comes from
the host structure scan (a load-time index, like the reference's offset
list); the stream itself is device-resident as uint32 words.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32


def _ctz32(x):
    """Count trailing zeros of a uint32 (32 for 0)."""
    return jnp.where(
        x == 0, 32,
        jax.lax.population_count((x & (~x + U32(1))) - U32(1)).astype(I32))


def _bits_at(words, pos, width):
    """LSB-first bit extract: bits [pos, pos+width) of the u32 word array
    (width <= 31; per-lane pos/width int32 arrays)."""
    wi = pos >> 5
    sh = (pos & 31).astype(U32)
    lo = words[wi] >> sh
    hi = jnp.where(sh > 0, words[wi + 1] << ((U32(32) - sh) & U32(31)),
                   U32(0))
    w = lo | hi
    mask = jnp.where(width >= 32, U32(0xFFFFFFFF),
                     (U32(1) << width.astype(U32)) - U32(1))
    return w & mask


def _unary_step(words, pos, active):
    """One unary read per active lane (count zeros before the next 1 bit,
    LSB-first); loops over 32-bit windows until every lane hits a 1."""

    def cond(st):
        pend, _, _ = st
        return jnp.max(pend) > 0

    def body(st):
        pend, pos, out = st
        w = _bits_at(words, pos, jnp.full_like(pos, 32))
        # full 32-bit window (mask above caps at 0xFFFFFFFF for width 32)
        tz = _ctz32(w)
        hit = (w != 0) & (pend > 0)
        out = jnp.where(hit, out + tz, out)
        # windows are re-read from the (possibly unaligned) cursor, so a
        # miss advances exactly the 32 bits just examined
        pos = jnp.where(hit, pos + tz + 1,
                        jnp.where(pend > 0, pos + 32, pos))
        pend = jnp.where(hit, 0, pend)
        return pend, pos, out

    z = jnp.zeros_like(pos)
    pend0 = jnp.where(active, 1, 0)
    pend, pos2, out = jax.lax.while_loop(cond, body, (pend0, pos, z))
    return out, jnp.where(active, pos2, pos)


def make_decode_fn(n: int, max_d: int):
    """Build the jitted lockstep decoder for graphs with ``n`` nodes and
    max outdegree ``max_d``.  Returns f(words, d, upper_base, lower_base,
    lbits, offsets) -> successors int32[m_pad] (padded CSR positions)."""

    def fn(words, d, upper_base, lower_base, lbits, out_base, m_pad):
        pos = upper_base
        last = jnp.full((n,), -1, dtype=I32)

        def body(i, st):
            pos, last, succ = st
            active = d > i
            gaps, pos = _unary_step(words, pos, active)
            last = jnp.where(active, last + gaps + 1, last)
            hi = last - i
            low = _bits_at(words, lower_base + i * lbits, lbits).astype(I32)
            val = (hi << lbits) | jnp.where(lbits > 0, low, 0)
            idx = jnp.where(active, out_base + i, m_pad - 1)
            succ = succ.at[idx].set(
                jnp.where(active, val, succ[m_pad - 1]), mode="drop")
            return pos, last, succ

        succ0 = jnp.zeros((m_pad,), dtype=I32)
        _, _, succ = jax.lax.fori_loop(0, max_d, body, (pos, last, succ0))
        return succ

    return jax.jit(fn, static_argnames=("m_pad",))


def decode_to_csr_device(ef):
    """Decode a loaded EFGraph entirely on device; returns
    (offsets int64[n+1], successors int32[m]) identical to the host
    ``EFGraph.decode_to_csr``."""
    n = ef._n
    d = np.zeros(n, dtype=np.int64)
    upper_base = np.zeros(n, dtype=np.int64)
    lower_base = np.zeros(n, dtype=np.int64)
    lbits = np.zeros(n, dtype=np.int64)
    for x in range(n):
        dd, l, _ps, _np_, _pb, lo_b, up_b = ef._reader(x)
        d[x] = dd
        lbits[x] = l
        lower_base[x] = lo_b
        upper_base[x] = up_b
    offsets = np.concatenate([[0], np.cumsum(d)])
    m = int(offsets[-1])
    m_pad = m + 1

    w64 = ef._w64()
    w32 = np.empty(2 * len(w64) + 2, dtype=np.uint32)
    w32[0 : 2 * len(w64) : 2] = (w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    w32[1 : 2 * len(w64) : 2] = (w64 >> np.uint64(32)).astype(np.uint32)
    w32[-2:] = 0

    fn = make_decode_fn(n, int(d.max(initial=0)))
    succ = fn(jnp.asarray(w32),
              jnp.asarray(d.astype(np.int32)),
              jnp.asarray(upper_base.astype(np.int32)),
              jnp.asarray(lower_base.astype(np.int32)),
              jnp.asarray(lbits.astype(np.int32)),
              jnp.asarray(offsets[:n].astype(np.int32)),
              m_pad)
    return offsets, np.asarray(succ)[:m].astype(np.int32)
