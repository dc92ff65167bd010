"""Round-trip and cross-check tests for the instantaneous-code layer."""

import numpy as np
import pytest

from webgraph_tpu.bits import codes as C
from webgraph_tpu.bits.bitstream import InputBitStream, OutputBitStream

VALUES = (
    list(range(0, 70))
    + [100, 127, 128, 129, 255, 256, 1000, 2**10, 2**16 - 1, 2**16, 2**20 + 3, 2**30, 2**31 - 1]
)


def roundtrip(write, read, values):
    obs = OutputBitStream()
    for v in values:
        write(obs, v)
    ibs = InputBitStream(obs.to_bytes())
    got = [read(ibs) for _ in values]
    assert got == list(values)


def test_unary_roundtrip():
    vals = list(range(0, 200)) + [500, 1000]
    roundtrip(lambda o, v: o.write_unary(v), lambda i: i.read_unary(), vals)


def test_gamma_roundtrip():
    roundtrip(lambda o, v: o.write_gamma(v), lambda i: i.read_gamma(), VALUES)


def test_delta_roundtrip():
    roundtrip(lambda o, v: o.write_delta(v), lambda i: i.read_delta(), VALUES)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 7])
def test_zeta_roundtrip(k):
    roundtrip(lambda o, v: o.write_zeta(v, k), lambda i: i.read_zeta(k), VALUES)


@pytest.mark.parametrize("b", [1, 2, 3, 5, 8, 100])
def test_golomb_roundtrip(b):
    # Keep the quotient (unary-coded) part small: Golomb codes are only
    # sensible when b is near the mean of the coded distribution.
    vals = [v for v in VALUES if v // b < 5000]
    roundtrip(lambda o, v: o.write_golomb(v, b), lambda i: i.read_golomb(b), vals)


def test_nibble_roundtrip():
    roundtrip(lambda o, v: o.write_nibble(v), lambda i: i.read_nibble(), VALUES)


@pytest.mark.parametrize("b", [1, 2, 3, 5, 7, 8, 9, 100])
def test_minimal_binary_roundtrip(b):
    vals = [v for v in range(b)]
    roundtrip(lambda o, v: o.write_minimal_binary(v, b), lambda i: i.read_minimal_binary(b), vals)


def test_zeta1_equals_gamma():
    # zeta_1 must coincide with gamma coding.
    for v in VALUES:
        assert C.encode_zeta(v, 1) == C.encode_gamma(v)


def test_known_gamma_codewords():
    # gamma(0)=1, gamma(1)=010, gamma(2)=011, gamma(3)=00100
    assert C.encode_gamma(0) == (0b1, 1)
    assert C.encode_gamma(1) == (0b010, 3)
    assert C.encode_gamma(2) == (0b011, 3)
    assert C.encode_gamma(3) == (0b00100, 5)


def test_known_zeta3_codewords():
    # From the zeta-code definition: zeta_3(0) = "1" + 2-bit mb of 0 = 100.
    assert C.encode_zeta(0, 3) == (0b100, 3)
    # x+1=8 -> h=1, left=8, v=0 -> short code: unary(1)=01, 5 bits of 0.
    assert C.encode_zeta(7, 3) == (0b0100000, 7)


def test_zigzag():
    for x in [0, 1, -1, 2, -2, 100, -100, 2**30, -(2**30)]:
        assert C.nat2int(C.int2nat(x)) == x
    assert C.int2nat(0) == 0
    assert C.int2nat(-1) == 1
    assert C.int2nat(1) == 2
    assert C.int2nat(-2) == 3


def test_mixed_stream_and_position():
    obs = OutputBitStream()
    obs.write_gamma(5)
    p1 = obs.written_bits
    obs.write_zeta(1000, 3)
    p2 = obs.written_bits
    obs.write_unary(17)
    ibs = InputBitStream(obs.to_bytes())
    ibs.position(p1)
    assert ibs.read_zeta(3) == 1000
    assert ibs.tell() == p2
    assert ibs.read_unary() == 17
    ibs.position(0)
    assert ibs.read_gamma() == 5


def test_bit_concatenation():
    a = OutputBitStream()
    for v in range(50):
        a.write_gamma(v)
    b = OutputBitStream()
    for v in range(50, 100):
        b.write_zeta(v, 3)
    merged = OutputBitStream()
    merged.append(a)
    merged.append(b)
    assert merged.written_bits == a.written_bits + b.written_bits
    ibs = InputBitStream(merged.to_bytes())
    for v in range(50):
        assert ibs.read_gamma() == v
    for v in range(50, 100):
        assert ibs.read_zeta(3) == v


def test_random_fuzz_all_codes():
    rng = np.random.default_rng(42)
    vals = [int(v) for v in rng.integers(0, 2**20, size=500)]
    specs = [
        (lambda o, v: o.write_gamma(v), lambda i: i.read_gamma()),
        (lambda o, v: o.write_delta(v), lambda i: i.read_delta()),
        (lambda o, v: o.write_zeta(v, 3), lambda i: i.read_zeta(3)),
        (lambda o, v: o.write_zeta(v, 5), lambda i: i.read_zeta(5)),
        (lambda o, v: o.write_golomb(v, 13), lambda i: i.read_golomb(13)),
        (lambda o, v: o.write_nibble(v), lambda i: i.read_nibble()),
    ]
    obs = OutputBitStream()
    for i, v in enumerate(vals):
        specs[i % len(specs)][0](obs, v)
    ibs = InputBitStream(obs.to_bytes())
    for i, v in enumerate(vals):
        assert specs[i % len(specs)][1](ibs) == v, f"mismatch at {i}"
