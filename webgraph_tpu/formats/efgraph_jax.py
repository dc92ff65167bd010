"""Device (XLA) decoders for the EFGraph format.

Two device programs, both driven by the cached vectorized structure index
(``EFGraph.structure_index`` — the load-time ``.obl`` analog):

* ``decode_to_csr_device`` — BIT-PARALLEL full decode: every bit of the
  stream is classified in parallel (owner record via searchsorted over the
  record offsets; upper-region membership; within-region rank via prefix
  sum), and every set upper-bit b with rank k in node x's region yields
  successor ``((b - upper_base[x] - k) << l) | lower_k`` scattered straight
  to its CSR slot.  No lockstep over outdegree at all — the round-4
  max-outdegree serialization (one heavy node stalling all lanes) is gone.
  Reference semantics: EliasFanoSuccessorReader.nextInt, EFGraph.java:1138.

* ``skip_to_batch_device`` — batched adjacency: per query, jump via the
  skip-pointer directory (pointers every 2^log2_quantum zeros,
  EFGraph.java:1147 skipTo) then a bounded lockstep unary scan.

The scalar/host EFGraph reader remains the correctness oracle.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

I32 = jnp.int32
I64 = jnp.int64
U32 = jnp.uint32

END_OF_LIST = 2**31 - 1


def _w32_of(ef) -> np.ndarray:
    w64 = ef._w64()
    w32 = np.empty(2 * len(w64) + 2, dtype=np.uint32)
    w32[0 : 2 * len(w64) : 2] = (w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    w32[1 : 2 * len(w64) : 2] = (w64 >> np.uint64(32)).astype(np.uint32)
    w32[-2:] = 0
    return w32


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


def _ctz32(x):
    """Count trailing zeros of a uint32 (32 for 0)."""
    return jnp.where(
        x == 0, 32,
        jax.lax.population_count((x & (~x + U32(1))) - U32(1)).astype(I32))


def _unary_step(words, pos, active):
    """One unary read per active lane (count zeros before the next 1 bit,
    LSB-first); loops over 32-bit windows until every lane hits a 1."""

    def cond(st):
        pend, _, _ = st
        return jnp.max(pend) > 0

    def body(st):
        pend, pos, out = st
        w = _bits_at(words, pos, jnp.full_like(pos, 32))
        tz = _ctz32(w)
        hit = (w != 0) & (pend > 0)
        # a missed (all-zero) window consumes 32 ZEROS: count them (a
        # round-4 latent bug dropped them — toy fixtures never had unary
        # gaps > 32, cnr-2000 hub lists do)
        out = jnp.where(hit, out + tz,
                        jnp.where(pend > 0, out + 32, out))
        pos = jnp.where(hit, pos + tz + 1,
                        jnp.where(pend > 0, pos + 32, pos))
        pend = jnp.where(hit, 0, pend)
        return pend, pos, out

    z = jnp.zeros_like(pos)
    pend0 = jnp.where(active, 1, 0)
    pend, pos2, out = jax.lax.while_loop(cond, body, (pend0, pos, z))
    return out, jnp.where(active, pos2, pos)


def make_bitparallel_decode(n: int, nbits: int, m: int):
    """Build the jitted bit-parallel decoder (static sizes)."""

    nb_pad = -(-nbits // 32) * 32

    def fn(words, rec_start, d, lbits, lower_base, upper_base, out_base):
        # expand the stream to a flat bit array (LSB-first within words)
        nw = nb_pad // 32
        bitmat = (words[:nw, None] >> jnp.arange(32, dtype=U32)[None, :]) \
            & U32(1)
        bits = bitmat.reshape(-1).astype(I32)          # (nb_pad,)
        b = jnp.arange(nb_pad, dtype=I32)
        # owner record of each bit (records are contiguous in the stream)
        owner = jnp.clip(
            jnp.searchsorted(rec_start, b, side="right") - 1, 0, n - 1)
        inupper = (b >= upper_base[owner]) & (b < nbits)
        setu = (bits > 0) & inupper
        # rank within the owner's upper region: exclusive prefix sum over
        # set-and-in-upper bits minus its value at the region start
        E = jnp.cumsum(setu.astype(I32)) - setu.astype(I32)  # exclusive
        E_at_start = E[jnp.clip(upper_base, 0, nb_pad - 1)]  # (n,)
        k = E - E_at_start[owner]
        sel = setu & (k < d[owner])
        hi = (b - upper_base[owner]) - k
        low = _bits_at(words, lower_base[owner] + k * lbits[owner],
                       lbits[owner]).astype(I32)
        val = (hi << lbits[owner]) | jnp.where(lbits[owner] > 0, low, 0)
        tgt = jnp.where(sel, out_base[owner] + k, m)
        succ = jnp.zeros(m + 1, dtype=I32).at[tgt].set(val, mode="drop")
        return succ[:m]

    return jax.jit(fn)


def decode_to_csr_device(ef):
    """Decode a loaded EFGraph entirely on device; returns
    (offsets int64[n+1], successors int32[m]) identical to the host
    ``EFGraph.decode_to_csr``."""
    n = ef._n
    idx = ef.structure_index()
    d = idx["d"]
    offsets = np.concatenate([[0], np.cumsum(d)])
    m = int(offsets[-1])
    w32 = _w32_of(ef)
    nbits = (len(w32) - 2) * 32

    fn = make_bitparallel_decode(n, nbits, m)
    succ = fn(jnp.asarray(w32),
              jnp.asarray(ef.bit_offsets[:n].astype(np.int32)),
              jnp.asarray(d.astype(np.int32)),
              jnp.asarray(idx["l"].astype(np.int32)),
              jnp.asarray(idx["lower_base"].astype(np.int32)),
              jnp.asarray(idx["upper_base"].astype(np.int32)),
              jnp.asarray(offsets[:n].astype(np.int32)))
    return offsets, np.asarray(succ).astype(np.int32)


def make_skip_to_batch(ef):
    """Build the jitted batched adjacency kernel over the device-resident
    stream: f(xs, bounds) -> least successor >= bound (END_OF_LIST if
    none), via skip pointers + bounded lockstep unary scan
    (EliasFanoSuccessorReader.skipTo, EFGraph.java:1147)."""
    idx = ef.structure_index()
    w32 = jnp.asarray(_w32_of(ef))
    d_a = jnp.asarray(idx["d"].astype(np.int32))
    l_a = jnp.asarray(idx["l"].astype(np.int32))
    ps_a = jnp.asarray(idx["ptr_size"].astype(np.int32))
    np_a = jnp.asarray(idx["n_ptrs"].astype(np.int32))
    pb_a = jnp.asarray(idx["ptr_base"].astype(np.int32))
    lo_a = jnp.asarray(idx["lower_base"].astype(np.int32))
    up_a = jnp.asarray(idx["upper_base"].astype(np.int32))
    u = int(ef.upper_bound)
    log2q = int(ef.log2_quantum)

    @jax.jit
    def fn(xs, bounds):
        d = d_a[xs]
        l = l_a[xs]
        ptr_size = ps_a[xs]
        n_ptrs = np_a[xs]
        ptr_base = pb_a[xs]
        lower_base = lo_a[xs]
        upper_base = up_a[xs]
        active = (d > 0) & (bounds < u)
        zts = jnp.where(active, bounds >> jnp.clip(l, 0, 30), 0)
        k = jnp.minimum(zts >> log2q, n_ptrs)
        use_ptr = active & (ptr_size > 0) & (k > 0)
        position = jnp.where(
            use_ptr,
            _bits_at(w32, ptr_base + (jnp.maximum(k, 1) - 1) * ptr_size,
                     ptr_size).astype(I32),
            0)
        zeros_seen = jnp.where(use_ptr, k << log2q, 0)
        i = jnp.where(use_ptr, position - zeros_seen, 0)
        pos = upper_base + position
        out = jnp.full_like(xs, END_OF_LIST)

        def cond(st):
            pend, _, _, _, _ = st
            return jnp.max(pend) > 0

        def body(st):
            pend, i, pos, zeros_seen, out = st
            act = pend > 0
            gap, pos2 = _unary_step(w32, pos, act)
            pos = jnp.where(act, pos2, pos)
            zeros_seen = jnp.where(act, zeros_seen + gap, zeros_seen)
            low = _bits_at(w32, lower_base + i * l, l).astype(I32)
            v = (zeros_seen << l) | jnp.where(l > 0, low, 0)
            found = act & (v >= bounds)
            out = jnp.where(found & (i < d), v, out)
            done = found | (i + 1 >= d)
            pend = jnp.where(act & done, 0, pend)
            i = jnp.where(act, i + 1, i)
            return pend, i, pos, zeros_seen, out

        pend0 = jnp.where(active & (i < d), 1, 0)
        _, _, _, _, out = jax.lax.while_loop(
            cond, body, (pend0, i, pos, zeros_seen, out))
        return out

    return fn


def skip_to_batch_device(ef, xs, bounds):
    """Batched device ``skip_to``; identical to EFGraph.skip_to_batch."""
    fn = getattr(ef, "_skip_dev_fn", None)
    if fn is None:
        fn = make_skip_to_batch(ef)
        ef._skip_dev_fn = fn
    out = fn(jnp.asarray(np.asarray(xs, dtype=np.int32)),
             jnp.asarray(np.asarray(bounds, dtype=np.int32)))
    return np.asarray(out).astype(np.int64)
