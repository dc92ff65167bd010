"""Window-based Pallas code readers vs the scalar bitstream oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from webgraph_tpu.bits import codes as C
from webgraph_tpu.bits.bitstream import InputBitStream, OutputBitStream, words_to_bytes
from webgraph_tpu.pallas import pcodes as P


def _windows_at(data: bytes, positions: np.ndarray):
    """64-bit windows (hi, lo) uint32 at each bit position (numpy)."""
    pad = data + b"\x00" * (12 + (-len(data)) % 4)
    w = np.frombuffer(pad, dtype=">u4").astype(np.uint32)
    i = positions // 32
    off = (positions % 32).astype(np.uint32)
    a, b, c = w[i], w[i + 1], w[i + 2]
    off2 = (np.uint32(32) - off) & np.uint32(31)
    hi = np.where(off > 0, (a << off) | (b >> off2), a)
    lo = np.where(off > 0, (b << off) | (c >> off2), b)
    return hi, lo


CASES = [
    ("gamma", C.GAMMA, 0),
    ("delta", C.DELTA, 0),
    ("zeta3", C.ZETA, 3),
    ("zeta1", C.ZETA, 1),
    ("zeta5", C.ZETA, 5),
]


@pytest.mark.parametrize("name,coding,k", CASES, ids=[c[0] for c in CASES])
def test_reader_matches_oracle(name, coding, k):
    rng = np.random.default_rng(42)
    vals = np.concatenate([
        np.arange(64),
        rng.integers(0, 1 << 16, 200),
        rng.integers(0, 1 << 28, 100),
        np.array([2**31 - 1, 2**31, 2**32 - 2], dtype=np.uint64)[:2],
    ]).astype(np.uint64)

    obs = OutputBitStream()
    positions = []
    for v in vals:
        positions.append(obs.written_bits)
        obs.write(coding, int(v), k)
    data = obs.to_bytes()
    positions = np.asarray(positions, dtype=np.int64)

    hi, lo = _windows_at(data, positions)
    reader = P.make_window_reader(coding, k)
    got, length = reader(jnp.asarray(hi), jnp.asarray(lo))
    got = np.asarray(got).astype(np.uint64)
    length = np.asarray(length)

    assert np.array_equal(got, vals), f"{name}: values diverge"
    # lengths must equal the oracle's code lengths
    exp_len = np.diff(np.concatenate([positions, [obs.written_bits]]))
    assert np.array_equal(length, exp_len), f"{name}: lengths diverge"


def test_unary_short_and_minimal_binary():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 60, 100)
    obs = OutputBitStream()
    positions = []
    for v in vals:
        positions.append(obs.written_bits)
        obs.write_unary(int(v))
    data = obs.to_bytes()
    hi, lo = _windows_at(data, np.asarray(positions, dtype=np.int64))
    got, length = P.read_unary_short(jnp.asarray(hi), jnp.asarray(lo))
    assert np.array_equal(np.asarray(got), vals)
    assert np.array_equal(np.asarray(length), vals + 1)

    bs = rng.integers(1, 1 << 20, 100)
    vs = (rng.random(100) * bs).astype(np.int64)
    obs = OutputBitStream()
    positions = []
    for v, b in zip(vs, bs):
        positions.append(obs.written_bits)
        obs.write_minimal_binary(int(v), int(b))
    data = obs.to_bytes()
    hi, lo = _windows_at(data, np.asarray(positions, dtype=np.int64))
    got, length = P.read_minimal_binary(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(bs.astype(np.int32))
    )
    assert np.array_equal(np.asarray(got), vs)
    exp_len = np.diff(np.concatenate([positions, [obs.written_bits]]))
    assert np.array_equal(np.asarray(length), exp_len)


def test_nat2int_u():
    v = np.array([0, 1, 2, 3, 4, 2**32 - 2, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(P.nat2int_u(jnp.asarray(v)))
    exp = np.array([0, -1, 1, -2, 2, 2**31 - 1, -(2**31)], dtype=np.int64)
    assert np.array_equal(got.astype(np.int64), exp)
