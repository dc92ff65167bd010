"""JAX device code readers vs the scalar oracle (runs on CPU backend)."""

import numpy as np
import pytest

from webgraph_tpu.bits import codes as C
from webgraph_tpu.bits.bitstream import OutputBitStream

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from webgraph_tpu.bits import jcodes as J  # noqa: E402


def encode_stream(writer, values):
    obs = OutputBitStream()
    positions = []
    for v in values:
        positions.append(obs.written_bits)
        writer(obs, v)
    return J.words_from_bytes(obs.to_bytes()), np.array(positions, dtype=np.int32)


VALUES = np.array(
    list(range(64)) + [100, 255, 256, 1000, 2**15, 2**20 + 3, 2**29, 2**31 - 2],
    dtype=np.int64,
)


@pytest.mark.parametrize(
    "name,writer,reader",
    [
        ("unary", lambda o, v: o.write_unary(min(v, 5000)), J.read_unary),
        ("gamma", lambda o, v: o.write_gamma(v), J.read_gamma),
        ("delta", lambda o, v: o.write_delta(v), J.read_delta),
        ("zeta3", lambda o, v: o.write_zeta(v, 3), lambda w, p: J.read_zeta(w, p, 3)),
        ("zeta1", lambda o, v: o.write_zeta(v, 1), lambda w, p: J.read_zeta(w, p, 1)),
        ("zeta7", lambda o, v: o.write_zeta(v, 7), lambda w, p: J.read_zeta(w, p, 7)),
        ("golomb8", lambda o, v: o.write_golomb(min(v, 10000), 8), lambda w, p: J.read_golomb(w, p, 8)),
        ("nibble", lambda o, v: o.write_nibble(v), J.read_nibble),
    ],
)
def test_jax_reader_matches_oracle(name, writer, reader):
    capped = [min(int(v), 5000) if name == "unary" else (min(int(v), 10000) if name == "golomb8" else int(v)) for v in VALUES]
    words, positions = encode_stream(writer, capped)
    v, newpos = jax.jit(reader)(jnp.asarray(words), jnp.asarray(positions))
    v = np.asarray(v, dtype=np.int64) & 0xFFFFFFFF
    expect = np.array(capped, dtype=np.int64)
    np.testing.assert_array_equal(v, expect, err_msg=name)
    # cursor advance must be exact: next positions shift by code lengths
    lengths = np.diff(np.append(positions, positions[-1]))  # placeholder
    # verify via re-encode lengths
    exp_len = []
    for x in capped:
        if name == "unary":
            exp_len.append(x + 1)
        elif name == "gamma":
            exp_len.append(C.gamma_length(x))
        elif name == "delta":
            exp_len.append(C.delta_length(x))
        elif name.startswith("zeta"):
            exp_len.append(C.zeta_length(x, int(name[4:])))
        elif name == "golomb8":
            exp_len.append(C.encode_golomb(x, 8)[1])
        else:
            exp_len.append(C.encode_nibble(x)[1])
    np.testing.assert_array_equal(np.asarray(newpos) - positions, exp_len, err_msg=name)


def test_zeta_u_large_values():
    # zigzagged first-gaps can reach 2^32-2
    vals = [2**31 - 1, 2**31, 2**32 - 2, 0, 1]
    words, positions = encode_stream(lambda o, v: o.write_zeta(v, 3), vals)
    v, _ = jax.jit(lambda w, p: J.read_zeta_u(w, p, 3))(jnp.asarray(words), jnp.asarray(positions))
    got = np.asarray(v).astype(np.uint32).astype(np.int64)
    np.testing.assert_array_equal(got, np.array(vals, dtype=np.int64))


def test_gamma_u_large_values():
    vals = [2**31 - 1, 2**31, 2**32 - 2, 0]
    words, positions = encode_stream(lambda o, v: o.write_gamma(v), vals)
    v, _ = jax.jit(J.read_gamma_u)(jnp.asarray(words), jnp.asarray(positions))
    got = np.asarray(v).astype(np.uint32).astype(np.int64)
    np.testing.assert_array_equal(got, np.array(vals, dtype=np.int64))


def test_nat2int_u():
    raw = np.array([0, 1, 2, 3, 2**32 - 2, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(J.nat2int_u(jnp.asarray(raw)))
    np.testing.assert_array_equal(got, [0, -1, 1, -2, 2**31 - 1, -(2**31)])


def test_long_unary_run():
    words, positions = encode_stream(lambda o, v: o.write_unary(v), [300, 0, 77])
    v, _ = J.read_unary(jnp.asarray(words), jnp.asarray(positions))
    np.testing.assert_array_equal(np.asarray(v), [300, 0, 77])
