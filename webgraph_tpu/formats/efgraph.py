"""EFGraph — the quasi-succinct Elias-Fano graph format with skip pointers.

Re-implements the reference format (EFGraph.java:78-890) from its documented
layout: per node, the *longword* stream (64-bit words, bits filled LSB-first
within each word; words serialized with a configurable byte order) holds

  1. a nonzero-gamma-coded outdegree+1 (LongWordOutputBitStream.writeGamma,
     EFGraph.java:398-410);
  2. the Elias-Fano encoding of the successor list with upper bound ``u``
     (usually n) and a fictional terminator at ``u`` (Accumulator.dump,
     EFGraph.java:527-540), laid out as
        [skip pointers] [lower bits] [upper bits]
     with ``l = max(0, msb(u / (d+1)))`` lower bits per element, unary upper
     gaps, and a skip pointer (of ``pointerSize = ceil(log2(d+1 + (u >> l)))``
     bits) to one past the position of every (q*2^log2Quantum)-th ZERO in the
     upper bits (Accumulator.add, EFGraph.java:509-525).

The ``.offsets`` file is an MSB-first delta-coded stream of per-node bit
lengths (first entry 0; EFGraph.java:825,852).

The skip pointers give constant-time-ish ``skip_to`` (successor >= bound)
queries — the adjacency-test primitive (EliasFanoSuccessorReader.skipTo,
EFGraph.java:1147).
"""

from __future__ import annotations

import os

import numpy as np

from webgraph_tpu.bits.bitstream import InputBitStream, OutputBitStream
from webgraph_tpu.graph.immutable_graph import ImmutableGraph, NodeIterator
from webgraph_tpu.graph.properties import load_properties, store_properties

GRAPH_EXTENSION = ".graph"
OFFSETS_EXTENSION = ".offsets"
PROPERTIES_EXTENSION = ".properties"
DEFAULT_LOG2_QUANTUM = 8
_M64 = (1 << 64) - 1


def _msb(x: int) -> int:
    return x.bit_length() - 1


def ef_lower_bits(length: int, upper_bound: int) -> int:
    """EFGraph.lowerBits (EFGraph.java:145-147)."""
    return 0 if length == 0 else max(0, _msb(upper_bound // length))


def ef_pointer_size(length: int, upper_bound: int) -> int:
    """EFGraph.pointerSize (EFGraph.java:156-158)."""
    v = length + (upper_bound >> ef_lower_bits(length, upper_bound))
    return max(0, (v - 1).bit_length() if v > 0 else 0)


def ef_number_of_pointers(length: int, upper_bound: int, log2_quantum: int) -> int:
    """EFGraph.numberOfPointers (EFGraph.java:168-171)."""
    if length == 0:
        return 0
    return (upper_bound >> ef_lower_bits(length, upper_bound)) >> log2_quantum


class LongWordWriter:
    """LSB-first bit appender over 64-bit longwords
    (reference LongWordOutputBitStream, EFGraph.java:298-418)."""

    def __init__(self):
        self.words: list[int] = []
        self._buffer = 0
        self._free = 64
        self.length = 0  # bits appended

    def append(self, value: int, width: int) -> int:
        if width == 0:
            return 0
        value &= (1 << width) - 1
        self._buffer |= (value << (64 - self._free)) & _M64
        if width < self._free:
            self._free -= width
        else:
            self.words.append(self._buffer)
            if width == self._free:
                self._buffer = 0
                self._free = 64
            else:
                self._buffer = value >> self._free
                self._free = 64 - width + self._free
        self.length += width
        return width

    def append_bits(self, bits: list[tuple[int, int]]):
        for v, w in bits:
            self.append(v, w)

    def write_unary(self, x: int) -> int:
        while x >= 63:
            self.append(0, 63)
            x -= 63
        return self.append(1 << x, x + 1)

    def write_nonzero_gamma(self, value: int) -> int:
        msb = _msb(value)
        self.append(1 << msb, msb + 1)
        self.append(value ^ (1 << msb), msb)
        return 2 * msb + 1

    def write_gamma(self, value: int) -> int:
        return self.write_nonzero_gamma(value + 1)

    def to_bytes(self, byte_order: str = "little") -> bytes:
        words = list(self.words)
        if self._free != 64:
            words.append(self._buffer)
        arr = np.array(words, dtype=np.uint64)
        return arr.astype("<u8" if byte_order == "little" else ">u8").tobytes()


class LongWordReader:
    """LSB-first bit reader over a uint64 word array
    (reference LongWordBitReader, EFGraph.java:892-1034)."""

    __slots__ = ("words", "pos")

    def __init__(self, words, position: int = 0):
        self.words = words  # python list of ints
        self.pos = position

    def extract(self, width: int) -> int:
        if width == 0:
            return 0
        i, off = divmod(self.pos, 64)
        v = self.words[i] >> off
        got = 64 - off
        while got < width:
            i += 1
            v |= self.words[i] << got
            got += 64
        self.pos += width
        return v & ((1 << width) - 1)

    def read_unary(self) -> int:
        count = 0
        while True:
            i, off = divmod(self.pos, 64)
            w = self.words[i] >> off
            if w:
                z = (w & -w).bit_length() - 1  # count trailing zeros
                self.pos += z + 1
                return count + z
            count += 64 - off
            self.pos += 64 - off

    def read_nonzero_gamma(self) -> int:
        msb = self.read_unary()
        return (1 << msb) | self.extract(msb)

    def read_gamma(self) -> int:
        return self.read_nonzero_gamma() - 1


class EFGraph(ImmutableGraph):
    def __init__(self, words, n, m, upper_bound, log2_quantum, bit_offsets, basename=None):
        self._ef_words = words  # python list of ints (64-bit)
        self._n = n
        self._m = m
        self.upper_bound = upper_bound
        self.log2_quantum = log2_quantum
        self.bit_offsets = bit_offsets
        self._basename = basename

    # ------------------------------------------------------------------

    @classmethod
    def load(cls, basename: str | os.PathLike) -> "EFGraph":
        props = load_properties(f"{basename}{PROPERTIES_EXTENSION}")
        n = int(props["nodes"])
        m = int(props["arcs"])
        upper_bound = int(props.get("upperbound", n))
        quantum = int(props["quantum"])
        byte_order = "little" if props.get("byteorder", "LITTLE_ENDIAN") == "LITTLE_ENDIAN" else "big"
        with open(f"{basename}{GRAPH_EXTENSION}", "rb") as f:
            data = f.read()
        pad = (-len(data)) % 8
        data += b"\x00" * (pad + 16)
        words = np.frombuffer(data, dtype="<u8" if byte_order == "little" else ">u8").tolist()
        with open(f"{basename}{OFFSETS_EXTENSION}", "rb") as f:
            ibs = InputBitStream(f.read())
        offs = np.zeros(n + 1, dtype=np.int64)
        acc = 0
        for i in range(n + 1):
            acc += ibs.read_long_delta()
            offs[i] = acc
        return cls(words, n, m, upper_bound, int(np.log2(quantum)), offs, str(basename))

    load_mapped = load
    load_offline = load
    load_sequential = load

    @classmethod
    def store(
        cls,
        graph: ImmutableGraph,
        basename: str | os.PathLike,
        upper_bound: int | None = None,
        log2_quantum: int = DEFAULT_LOG2_QUANTUM,
        byte_order: str = "little",
    ) -> dict:
        n = graph.num_nodes()
        u = upper_bound if upper_bound is not None else n
        writer = LongWordWriter()
        offsets_obs = OutputBitStream()
        offsets_obs.write_delta(0)
        quantum = 1 << log2_quantum
        m = 0
        bits_outdegrees = 0
        bits_successors = 0
        it = graph.node_iterator()
        while it.has_next():
            it.next_int()
            d = it.outdegree()
            succ = it.successor_array()[:d]
            m += d
            start = writer.length
            ob = writer.write_gamma(d)
            bits_outdegrees += ob
            # Elias-Fano of successors + terminator at u
            length_c = d + 1  # corrected length (with terminator)
            l = ef_lower_bits(length_c, u)
            ptr_size = ef_pointer_size(length_c, u)
            values = [int(v) for v in succ] + [u]
            # upper-bit one positions; hi value of element i is one_pos[i]-i
            one_pos = [(v >> l) + i for i, v in enumerate(values)]
            hi_vals = [op - i for i, op in enumerate(one_pos)]
            # skip pointers: pointer j = bit position of the zero with
            # 0-based index (j+1)*quantum - 1, plus one (Accumulator.add,
            # EFGraph.java:519-521). Total zeros in the upper bits = u >> l.
            n_ptrs = ef_number_of_pointers(length_c, u, log2_quantum)
            if ptr_size > 0 and n_ptrs > 0:
                hv = np.asarray(hi_vals, dtype=np.int64)
                for j in range(n_ptrs):
                    z = (j + 1) * quantum - 1
                    ones_before = int(np.searchsorted(hv, z, side="right"))
                    writer.append(z + ones_before + 1, ptr_size)
            if l > 0:
                for v in values:
                    writer.append(v & ((1 << l) - 1), l)
            last = -1
            for op in one_pos:
                writer.write_unary(op - last - 1)
                last = op
            node_bits = writer.length - start
            bits_successors += node_bits - ob
            offsets_obs.write_delta(node_bits)
        with open(f"{basename}{GRAPH_EXTENSION}", "wb") as f:
            f.write(writer.to_bytes(byte_order))
        with open(f"{basename}{OFFSETS_EXTENSION}", "wb") as f:
            f.write(offsets_obs.to_bytes())
        written_bits = ((writer.length + 63) // 64) * 64
        props = {
            "nodes": n,
            "arcs": m,
            "quantum": quantum,
            "byteorder": "LITTLE_ENDIAN" if byte_order == "little" else "BIG_ENDIAN",
            "bitsperlink": f"{written_bits / max(m, 1):.3f}",
            "bitspernode": f"{written_bits / max(n, 1):.3f}",
            "bitsforoutdegrees": bits_outdegrees,
            "bitsforsuccessors": written_bits - bits_outdegrees,
            "graphclass": "it.unimi.dsi.webgraph.EFGraph",
            "version": 0,
        }
        if u != n:
            props["upperbound"] = u
        store_properties(f"{basename}{PROPERTIES_EXTENSION}", props, comment="EFGraph properties")
        return props

    # ------------------------------------------------------------------

    def num_nodes(self) -> int:
        return self._n

    def num_arcs(self) -> int:
        return self._m

    def outdegree(self, x: int) -> int:
        if not 0 <= x < self._n:
            raise IndexError(f"node {x} out of range")
        r = LongWordReader(self._ef_words, int(self.bit_offsets[x]))
        return r.read_gamma()

    def _reader(self, x: int):
        """Return (outdegree, l, ptr_size, n_ptrs, ptr_bit_base, lower_base,
        upper_base) for node x."""
        r = LongWordReader(self._ef_words, int(self.bit_offsets[x]))
        d = r.read_gamma()
        length_c = d + 1
        u = self.upper_bound
        l = ef_lower_bits(length_c, u)
        ptr_size = ef_pointer_size(length_c, u)
        n_ptrs = ef_number_of_pointers(length_c, u, self.log2_quantum)
        ptr_base = r.pos
        lower_base = ptr_base + n_ptrs * ptr_size
        upper_base = lower_base + length_c * l
        return d, l, ptr_size, n_ptrs, ptr_base, lower_base, upper_base

    def successors(self, x: int) -> np.ndarray:
        d, l, ptr_size, n_ptrs, ptr_base, lower_base, upper_base = self._reader(x)
        if d == 0:
            return np.zeros(0, dtype=np.int32)
        up = LongWordReader(self._ef_words, upper_base)
        out = np.zeros(d, dtype=np.int64)
        last = -1
        for i in range(d):
            last += up.read_unary() + 1
            out[i] = (last - i) << l
        if l > 0:
            low = LongWordReader(self._ef_words, lower_base)
            for i in range(d):
                out[i] |= low.extract(l)
        return out.astype(np.int32)

    successor_array = successors

    def skip_to(self, x: int, lower_bound: int) -> int:
        """Least successor of x that is >= lower_bound, or 2^31-1 (END_OF_LIST)
        if none — the adjacency primitive (EliasFanoSuccessorReader.skipTo)."""
        END = 2**31 - 1
        d, l, ptr_size, n_ptrs, ptr_base, lower_base, upper_base = self._reader(x)
        if d == 0:
            return END
        if lower_bound >= self.upper_bound:
            return END
        zeroes_to_skip = lower_bound >> l
        ones_seen = 0
        zeros_seen = 0
        position = 0  # bit cursor within the upper-bits area
        k = zeroes_to_skip >> self.log2_quantum
        if ptr_size > 0 and k > 0:
            k = min(k, n_ptrs)
            pr = LongWordReader(self._ef_words, ptr_base + (k - 1) * ptr_size)
            position = pr.extract(ptr_size)  # one past the (k*q-1)-th zero
            zeros_seen = k << self.log2_quantum
            ones_seen = position - zeros_seen
        up = LongWordReader(self._ef_words, upper_base + position)
        i = ones_seen
        while i < d:
            gap = up.read_unary()
            zeros_seen += gap
            hi = zeros_seen  # zeros before this one == hi value of element i
            if l > 0:
                low = LongWordReader(self._ef_words, lower_base + i * l)
                v = (hi << l) | low.extract(l)
            else:
                v = hi
            if v >= lower_bound:
                return int(v)
            i += 1
        return END

    def has_arc(self, x: int, y: int) -> bool:
        return self.skip_to(x, y) == y

    # ------------------------------------------------------------------
    # vectorized bulk paths (longword little-endian bit extraction over
    # the whole stream; scalar LongWordReader remains the oracle)
    # ------------------------------------------------------------------

    def _w64(self) -> np.ndarray:
        if getattr(self, "_w64_cache", None) is None:
            w = np.asarray(self._ef_words, dtype=np.uint64)
            self._w64_cache = np.concatenate([w, np.zeros(2, dtype=np.uint64)])
        return self._w64_cache

    def _vextract(self, pos, width):
        """Bits [pos, pos+width) of the little-endian longword stream, per
        lane (width <= 58; LongWordBitReader.extract analog)."""
        w = self._w64()
        pos = np.asarray(pos, dtype=np.int64)
        wi = pos >> 6
        sh = (pos & 63).astype(np.uint64)
        lo = w[wi] >> sh
        hi = np.where(sh > 0, w[wi + 1] << (np.uint64(64) - sh), np.uint64(0))
        mask = (np.uint64(1) << np.asarray(width, dtype=np.uint64)) - np.uint64(1)
        return ((lo | hi) & mask).astype(np.int64)

    def structure_index(self):
        """Vectorized per-node structure scan, cached on the instance — the
        load-time index analog of the reference's offset list (.obl,
        EFGraph.java:82-94): returns dict of int64 arrays
        (d, l, ptr_size, n_ptrs, ptr_base, lower_base, upper_base).
        One gamma decode per node, all nodes in lockstep (replaces the
        O(n) scalar _reader loops of the bulk/batched paths)."""
        idx = getattr(self, "_struct_index", None)
        if idx is not None:
            return idx
        n = self._n
        u = self.upper_bound
        pos = self.bit_offsets[:n].astype(np.int64)
        act = np.ones(n, dtype=bool)
        msb, pos2 = self._vunary(pos, act)
        rest = self._vextract(pos2, msb)
        d = ((np.int64(1) << msb) | rest) - 1
        ptr_base = pos2 + msb
        length_c = d + 1
        # lowerBits / pointerSize / numberOfPointers (EFGraph.java:145-171);
        # msb via frexp (exact: all operands < 2^53)
        q = u // np.maximum(length_c, 1)
        l = np.where(q > 0,
                     np.frexp(q.astype(np.float64))[1] - 1,
                     0).astype(np.int64)
        v = length_c + (u >> l)
        vb = np.maximum(v - 1, 0)
        ptr_size = np.where(
            vb > 0, np.frexp(vb.astype(np.float64))[1], 0).astype(np.int64)
        n_ptrs = np.where(length_c > 0, (u >> l) >> self.log2_quantum, 0)
        lower_base = ptr_base + n_ptrs * ptr_size
        upper_base = lower_base + length_c * l
        idx = dict(d=d, l=l, ptr_size=ptr_size, n_ptrs=n_ptrs,
                   ptr_base=ptr_base, lower_base=lower_base,
                   upper_base=upper_base)
        # oracle spot-check on a few nodes (cheap insurance for the float
        # msb arithmetic above)
        for x in (0, n // 2, n - 1) if n else ():
            ref = self._reader(int(x))
            got = (idx["d"][x], idx["l"][x], idx["ptr_size"][x],
                   idx["n_ptrs"][x], idx["ptr_base"][x],
                   idx["lower_base"][x], idx["upper_base"][x])
            assert tuple(int(t) for t in got) == tuple(ref), (x, got, ref)
        self._struct_index = idx
        return idx

    def _vunary(self, pos, active):
        """Per-lane unary read at ``pos`` (count of zeros before the next
        one bit); returns (values, new_pos)."""
        w = self._w64()
        pos = np.asarray(pos, dtype=np.int64).copy()
        out = np.zeros(len(pos), dtype=np.int64)
        pend = active.copy()
        # a truncated/corrupt stream is all zero padding past the end; bound
        # the scan at the stream's bit length instead of spinning forever
        nbits = (len(w) - 1) << 6
        while pend.any():
            if (pos[pend] >= nbits).any():
                raise ValueError(
                    "EFGraph unary read ran past the end of the stream "
                    "(truncated or corrupt .graph data)")
            wi = pos[pend] >> 6
            sh = (pos[pend] & 63).astype(np.uint64)
            window = w[wi] >> sh
            nz = window != 0
            # count trailing zeros of the 64-bit window (de Bruijn-free)
            x = window
            tz = np.zeros(len(x), dtype=np.int64)
            cur = x.copy()
            for b in (32, 16, 8, 4, 2, 1):
                m = (cur & ((np.uint64(1) << np.uint64(b)) - np.uint64(1))) == 0
                hit = m & (cur != 0)
                tz[hit] += b
                cur[hit] >>= np.uint64(b)
            idx = np.flatnonzero(pend)
            got = idx[nz]
            out[got] += tz[nz]
            pos[got] += tz[nz] + 1
            skip = idx[~nz]
            avail = 64 - (pos[skip] & 63)
            out[skip] += avail
            pos[skip] += avail
            np.logical_and(pend, False, out=pend)
            pend[skip] = True
        return out, pos

    def decode_to_csr(self):
        """Vectorized full decode: every node's successors via lockstep
        unary reads over the upper bits + one lower-bits extract per value.
        Returns ``(offsets int64[n+1], successors int32[m])``."""
        n = self._n
        u = self.upper_bound
        idx = self.structure_index()  # cached vectorized load-time scan
        d = idx["d"]
        lbits = idx["l"]
        lower_base = idx["lower_base"]
        upper_base = idx["upper_base"]
        offsets = np.concatenate([[0], np.cumsum(d)])
        m = int(offsets[-1])
        succ = np.zeros(m, dtype=np.int64)
        # lockstep over successor index i, nodes sorted by outdegree desc
        order = np.argsort(-d, kind="stable")
        counts = d[order]
        pos = upper_base[order].copy()
        last = np.full(len(order), -1, dtype=np.int64)
        max_d = int(counts[0]) if n else 0
        for i in range(max_d):
            k = int(np.searchsorted(-counts, -i, side="left"))
            if k == 0:
                break
            act = np.ones(k, dtype=bool)
            gaps, pos[:k] = self._vunary(pos[:k], act)
            last[:k] += gaps + 1
            hi = last[:k] - i
            nodes = order[:k]
            val = hi << lbits[nodes]
            lw = lbits[nodes] > 0
            val[lw] |= self._vextract(
                lower_base[nodes[lw]] + i * lbits[nodes[lw]], lbits[nodes[lw]])
            succ[offsets[nodes] + i] = val
        return offsets, succ.astype(np.int32)

    def skip_to_batch(self, xs, bounds) -> np.ndarray:
        """Vectorized ``skip_to``: least successor of xs[i] >= bounds[i],
        or END_OF_LIST — the batched adjacency primitive
        (EliasFanoSuccessorReader.skipTo, EFGraph.java:1147)."""
        END = 2**31 - 1
        xs = np.asarray(xs, dtype=np.int64)
        bounds = np.asarray(bounds, dtype=np.int64)
        Q = len(xs)
        out = np.full(Q, END, dtype=np.int64)
        idx = self.structure_index()  # cached vectorized load-time scan
        d = idx["d"][xs]
        l = idx["l"][xs]
        ptr_size = idx["ptr_size"][xs]
        n_ptrs = idx["n_ptrs"][xs]
        ptr_base = idx["ptr_base"][xs]
        lower_base = idx["lower_base"][xs]
        upper_base = idx["upper_base"][xs]
        active = (d > 0) & (bounds < self.upper_bound)
        zeros_to_skip = np.where(active, bounds >> l.clip(0, 62), 0)
        k = np.minimum(zeros_to_skip >> self.log2_quantum, n_ptrs)
        use_ptr = active & (ptr_size > 0) & (k > 0)
        position = np.zeros(Q, dtype=np.int64)
        position[use_ptr] = self._vextract(
            ptr_base[use_ptr] + (k[use_ptr] - 1) * ptr_size[use_ptr],
            ptr_size[use_ptr])
        zeros_seen = np.where(use_ptr, k << self.log2_quantum, 0)
        ones_seen = np.where(use_ptr, position - zeros_seen, 0)
        pos = upper_base + position
        i = ones_seen.copy()
        pend = active.copy()
        while pend.any():
            idx = np.flatnonzero(pend)
            gaps, newpos = self._vunary(pos[idx], np.ones(len(idx), dtype=bool))
            pos[idx] = newpos
            zeros_seen[idx] += gaps
            v = zeros_seen[idx].copy()
            lw = l[idx] > 0
            vi = v << l[idx]
            vi[lw] |= self._vextract(
                lower_base[idx[lw]] + i[idx[lw]] * l[idx[lw]], l[idx[lw]])
            found = vi >= bounds[idx]
            out[idx[found]] = vi[found]
            pend[idx[found]] = False
            i[idx] += 1
            exhausted = i[idx] >= d[idx]
            pend[idx[exhausted & ~found]] = False
        return np.where(out >= self.upper_bound, END, out)

    def node_iterator(self, start: int = 0) -> NodeIterator:
        g = self

        class _It(NodeIterator):
            def __init__(self, frm, bound=None):
                self._next = frm
                self._curr = frm - 1
                self._bound = g._n if bound is None else min(bound, g._n)

            def has_next(self):
                return self._next < self._bound

            def next_int(self):
                self._curr = self._next
                self._next += 1
                return self._curr

            def outdegree(self):
                return g.outdegree(self._curr)

            def successor_array(self):
                return g.successors(self._curr)

            def copy(self, upper_bound):
                return _It(self._next, upper_bound)

        return _It(start)
