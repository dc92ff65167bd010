"""JAX device-side instantaneous-code readers (lane-parallel, int32-safe).

Mirrors :mod:`webgraph_tpu.bits.vcodes` for execution on TPU under ``jit``:
the bit stream lives in HBM as ``uint32`` words (MSB-first), each lane owns
an ``int32`` bit cursor, and one call decodes one code per lane via a 64-bit
window materialized as two ``uint32`` halves (three word gathers),
count-leading-zeros, and shift/mask extraction.

No ``int64`` anywhere: bit positions are int32 (streams up to 2^31 bits =
256 MiB per shard; larger streams are sharded), decoded values are int32
(node ids < 2^31), and the one quantity that can exceed int32 — the zigzagged
first-gap, up to 2^32-2 — is carried in uint32 until the zigzag inverse.
Zeta codes avoid materializing the (potentially > 2^32) minimal-binary
universe by using the identity ``threshold == 2^(hk)`` (the reference
comparison ``m < left`` in dsiutils readZeta).

Scalar oracle: :mod:`webgraph_tpu.bits.bitstream`; host blueprint:
:mod:`webgraph_tpu.bits.vcodes`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32


def words_from_bytes(data: bytes) -> np.ndarray:
    """Pack an MSB-first byte stream into big-endian uint32 words + sentinel
    padding (so 64-bit windows never index out of bounds)."""
    n = len(data)
    pad = (-n) % 4
    data = data + b"\x00" * (pad + 8)
    return np.frombuffer(data, dtype=">u4").astype(np.uint32)


def window_rows(words: jnp.ndarray) -> jnp.ndarray:
    """Precompute the (W, 3) row table [w[i], w[i+1], w[i+2]] so each peek is
    ONE row gather instead of three word gathers.  On this backend every
    XLA op inside a while_loop costs tens of microseconds of launch overhead
    regardless of size, so op count — not bytes — is the decode currency."""
    return jnp.stack(
        [words, jnp.roll(words, -1), jnp.roll(words, -2)], axis=1
    )


def peek(words: jnp.ndarray, pos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return the 64-bit window at each bit cursor as (hi32, lo32).

    ``words`` may be the flat uint32 stream or the (W, 3) row table from
    :func:`window_rows` (one gather per peek)."""
    i = (pos >> 5).astype(I32)
    off = (pos & 31).astype(U32)
    if words.ndim == 2:
        rows = words[i]
        a, b, c = rows[:, 0], rows[:, 1], rows[:, 2]
    else:
        a = words[i]
        b = words[i + 1]
        c = words[i + 2]
    off2 = (U32(32) - off) & U32(31)  # shift-by-32 guard
    hi = jnp.where(off > 0, (a << off) | (b >> off2), a)
    lo = jnp.where(off > 0, (b << off) | (c >> off2), b)
    return hi, lo


def clz64(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of the 64-bit window (0..64)."""
    return jnp.where(hi > 0, jax.lax.clz(hi), 32 + jax.lax.clz(lo)).astype(I32)


def extract32(hi, lo, start, width):
    """Extract a <=32-bit field [start, start+width) of the window as uint32.

    Requires start + width <= 64 and width <= 32 (width 0 yields 0).
    """
    start = jnp.asarray(start).astype(U32)
    width = jnp.asarray(width).astype(U32)
    sh2 = (U32(32) - start) & U32(31)
    # 32-bit register holding window bits [start, start+32)
    r = jnp.where(
        start >= 32,
        lo << (start - U32(32)),
        jnp.where(start > 0, (hi << start) | (lo >> sh2), hi),
    )
    v = jnp.where(width > 0, r >> ((U32(32) - width) & U32(31)), U32(0))
    return jnp.where(width >= 32, r, v)


def extract_wide(hi, lo, start, width):
    """Extract a field whose *position span* may exceed 32 bits but whose
    numeric value fits uint32 (top bits of the span are zero in valid
    streams, e.g. zeta_k minimal-binary fields with k >= 5)."""
    start = jnp.asarray(start).astype(I32)
    width = jnp.asarray(width).astype(I32)
    excess = jnp.maximum(width - 32, 0)
    return extract32(hi, lo, start + excess, width - excess)


def read_unary_short(words, pos):
    """Loop-free unary decode for runs guaranteed < 64 bits (references with
    window <= 63; zeta/Golomb quotients of values < 2^32). Avoids the
    while_loop sync point of the general reader — important on TPU, where
    each while_loop trip costs a full dispatch."""
    hi, lo = peek(words, pos)
    z = clz64(hi, lo)
    return z, pos + z + 1


def read_unary(words, pos):
    """Unary decode; one window covers runs <= 63. Longer runs refill."""
    hi, lo = peek(words, pos)

    def cond(st):
        _, _, hi_, lo_ = st
        return jnp.any((hi_ | lo_) == 0)

    def body(st):
        p, c, hi_, lo_ = st
        full = (hi_ | lo_) == 0
        p = jnp.where(full, p + 64, p)
        c = jnp.where(full, c + 64, c)
        hi2, lo2 = peek(words, p)
        return p, c, hi2, lo2

    p, c, hi, lo = jax.lax.while_loop(cond, body, (pos, jnp.zeros_like(pos), hi, lo))
    z = clz64(hi, lo)
    return c + z, p + z + 1


def read_gamma_u(words, pos):
    """Gamma decode as uint32 (values to 2^32-2; h <= 31, one window)."""
    hi, lo = peek(words, pos)
    h = clz64(hi, lo)
    rest = extract32(hi, lo, h + 1, h)
    val_plus_1 = (U32(1) << (h.astype(U32) & U32(31))) | rest
    return val_plus_1 - U32(1), pos + 2 * h + 1


def read_gamma(words, pos):
    v, p = read_gamma_u(words, pos)
    return v.astype(I32), p


def read_delta_u(words, pos):
    h, p = read_gamma(words, pos)
    hi, lo = peek(words, p)
    rest = extract32(hi, lo, jnp.zeros_like(h), h)
    return ((U32(1) << (h.astype(U32) & U32(31))) | rest) - U32(1), p + h


def read_delta(words, pos):
    v, p = read_delta_u(words, pos)
    return v.astype(I32), p


def read_zeta_u(words, pos, k: int):
    """Zeta_k decode as uint32 (values to 2^32-2; h < 32 so the unary part
    never spans a full window)."""
    h, p = read_unary_short(words, pos)
    s = h * k + k - 1  # minimal-binary field width (span may exceed 32)
    hi, lo = peek(words, p)
    m = extract_wide(hi, lo, jnp.zeros_like(s), s)
    left = U32(1) << ((h * k).astype(U32) & U32(31))
    is_long = m >= left
    extra = extract_wide(hi, lo, s, jnp.ones_like(s))
    v = jnp.where(is_long, (m << U32(1)) + extra - U32(1), m + left - U32(1))
    return v, p + s + is_long.astype(I32)


def read_zeta(words, pos, k: int):
    v, p = read_zeta_u(words, pos, k)
    return v.astype(I32), p


def read_minimal_binary(words, pos, b):
    """Minimal binary decode in per-lane universes ``b`` (int32, 1..2^31-1)."""
    b = jnp.asarray(b).astype(U32)
    s = (U32(31) - jax.lax.clz(b)).astype(I32)  # floor(log2 b)
    hi, lo = peek(words, pos)
    m = extract32(hi, lo, jnp.zeros_like(s), s)
    threshold = (U32(1) << ((s + 1).astype(U32) & U32(31))) - b
    is_long = m >= threshold
    extra = extract32(hi, lo, s, jnp.ones_like(s))
    v = jnp.where(is_long, ((m << U32(1)) | extra) - threshold, m)
    return v.astype(I32), pos + s + is_long.astype(I32)


def read_golomb(words, pos, b: int):
    q, p = read_unary(words, pos)
    r, p = read_minimal_binary(words, p, jnp.full(pos.shape, b, dtype=I32))
    return q * b + r, p


def read_nibble_u(words, pos):
    def cond(st):
        _, _, done = st
        return ~jnp.all(done)

    def body(st):
        x, p, done = st
        hi, lo = peek(words, p)
        g = extract32(hi, lo, jnp.zeros_like(p), jnp.full_like(p, 4))
        x = jnp.where(done, x, (x << U32(3)) | (g & U32(7)))
        p = jnp.where(done, p, p + 4)
        done = done | ((g & U32(8)) > 0)
        return x, p, done

    x, p, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(pos.shape, dtype=U32), pos, jnp.zeros(pos.shape, dtype=bool))
    )
    return x, p


def read_nibble(words, pos):
    v, p = read_nibble_u(words, pos)
    return v.astype(I32), p


def nat2int_u(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse zigzag from uint32 to int32."""
    half = (v >> U32(1)).astype(I32)
    return jnp.where((v & U32(1)) == 0, half, -half - 1)


def make_reader(coding: int, k: int):
    from webgraph_tpu.bits import codes as C

    if coding == C.GAMMA:
        return read_gamma
    if coding == C.DELTA:
        return read_delta
    if coding == C.UNARY:
        return read_unary
    if coding == C.ZETA:
        return lambda w, p: read_zeta(w, p, k)
    if coding == C.GOLOMB:
        return lambda w, p: read_golomb(w, p, k)
    if coding == C.NIBBLE:
        return read_nibble
    raise ValueError(f"unsupported coding {coding}")


def make_reader_u(coding: int, k: int):
    """uint32-valued reader (for zigzagged first-gap codes up to 2^32-2)."""
    from webgraph_tpu.bits import codes as C

    if coding == C.GAMMA:
        return read_gamma_u
    if coding == C.DELTA:
        return read_delta_u
    if coding == C.ZETA:
        return lambda w, p: read_zeta_u(w, p, k)
    if coding == C.NIBBLE:
        return read_nibble_u
    reader = make_reader(coding, k)

    def wrapped(w, p):
        v, q = reader(w, p)
        return v.astype(U32), q

    return wrapped
