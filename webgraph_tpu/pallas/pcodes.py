"""Window-based instantaneous-code readers for the in-kernel decoder.

Each reader is a pure function of a 64-bit bit window ``(hi, lo)`` — two
``uint32`` arrays of identical (any) shape holding bits [pos, pos+64) of the
stream, MSB-first — and returns ``(value, length_in_bits)``.  Cursor
arithmetic and window refill are the caller's job (the Pallas kernel keeps
per-lane windows in vector registers and refills them with row-local
gathers).

Semantics mirror the scalar oracle :mod:`webgraph_tpu.bits.bitstream` and
the XLA readers :mod:`webgraph_tpu.bits.jcodes` exactly (γ/δ/ζ_k per
dsiutils conventions, reference ``BVGraph.java:626-849``); these functions
are plain jax.numpy and are unit-tested outside Pallas against the oracle.

Width limits (same as jcodes): decoded values fit uint32; γ/δ/ζ codes of
such values span < 64 bits, so one window suffices per code.  Unary runs
longer than 63 bits and nibble codes need caller-side continuation — see
the kernel's slow path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32


def clz64(hi, lo):
    """Count leading zeros of the 64-bit window (int32, 0..64)."""
    return jnp.where(hi > 0, jax.lax.clz(hi), 32 + jax.lax.clz(lo)).astype(I32)


def extract32(hi, lo, start, width):
    """Bits [start, start+width) of the window as uint32 (width <= 32,
    start+width <= 64; width 0 -> 0).  ``start``/``width`` int32 arrays."""
    start = start.astype(U32) if hasattr(start, "astype") else U32(start)
    width = width.astype(U32) if hasattr(width, "astype") else U32(width)
    sh2 = (U32(32) - start) & U32(31)
    r = jnp.where(
        start >= 32,
        lo << ((start - U32(32)) & U32(31)),
        jnp.where(start > 0, (hi << (start & U32(31))) | (lo >> sh2), hi),
    )
    v = jnp.where(width > 0, r >> ((U32(32) - width) & U32(31)), jnp.zeros_like(r))
    return jnp.where(width >= 32, r, v)


def extract_wide(hi, lo, start, width):
    """Field whose span may exceed 32 bits but whose value fits uint32
    (leading bits of the span are zero in valid streams)."""
    excess = jnp.maximum(width - 32, 0)
    return extract32(hi, lo, start + excess, width - excess)


def read_unary_short(hi, lo):
    """Unary runs < 64 bits (references, ζ/Golomb quotients)."""
    z = clz64(hi, lo)
    return z, z + 1


def read_gamma_u(hi, lo):
    h = clz64(hi, lo)
    rest = extract32(hi, lo, h + 1, h)
    val_p1 = (U32(1) << (h.astype(U32) & U32(31))) | rest
    return val_p1 - U32(1), 2 * h + 1


def read_delta_u(hi, lo):
    hg, lg = read_gamma_u(hi, lo)
    h = hg.astype(I32)
    rest = extract32(hi, lo, lg, h)
    return ((U32(1) << (h.astype(U32) & U32(31))) | rest) - U32(1), lg + h


def read_zeta_u(hi, lo, k: int):
    h, lu = read_unary_short(hi, lo)
    s = h * k + (k - 1)
    m = extract_wide(hi, lo, lu, s)
    left = U32(1) << ((h * k).astype(U32) & U32(31))
    is_long = m >= left
    extra = extract_wide(hi, lo, lu + s, jnp.ones_like(s))
    # the extra bit is only consumed on the long branch
    v = jnp.where(is_long, (m << U32(1)) + extra - U32(1), m + left - U32(1))
    return v, lu + s + is_long.astype(I32)


def read_minimal_binary(hi, lo, b):
    """Minimal binary in per-lane universes b (int32 >= 1)."""
    bu = b.astype(U32)
    s = (U32(31) - jax.lax.clz(bu)).astype(I32)  # floor(log2 b)
    m = extract32(hi, lo, jnp.zeros_like(s), s)
    threshold = (U32(1) << ((s + 1).astype(U32) & U32(31))) - bu
    is_long = m >= threshold
    extra = extract32(hi, lo, s, jnp.ones_like(s))
    v = jnp.where(is_long, ((m << U32(1)) | extra) - threshold, m)
    return v, s + is_long.astype(I32)


def nat2int_u(v):
    """Inverse zigzag uint32 -> int32."""
    half = (v >> U32(1)).astype(I32)
    return jnp.where((v & U32(1)) == 0, half, -half - 1)


def make_window_reader(coding: int, k: int):
    """Reader factory mirroring jcodes.make_reader_u, window-based.

    Returns ``f(hi, lo) -> (value_u32, length)``.  GOLOMB and NIBBLE are
    NOT supported in-kernel (their span bounds don't fit the single-window
    contract); graphs stored with those codings must use the XLA decoder
    (``formats/bvgraph_jax``) or the host decoders — this factory raises
    so the kernel fails loudly instead of decoding garbage.
    """
    from webgraph_tpu.bits import codes as C

    if coding == C.GAMMA:
        return read_gamma_u
    if coding == C.DELTA:
        return read_delta_u
    if coding == C.ZETA:
        return lambda hi, lo: read_zeta_u(hi, lo, k)
    if coding == C.UNARY:
        def f(hi, lo):
            v, ln = read_unary_short(hi, lo)
            return v.astype(U32), ln
        return f
    raise ValueError(f"in-kernel decode unsupported for coding {coding}")
