"""In-kernel (Mosaic/Pallas) BVGraph bulk decoder.

One Pallas kernel decodes the whole graph: the grid walks node *blocks*
(consecutive node ranges, 8 sublane-groups x 128 lanes each); every
variable-length code is decoded by lane-parallel VPU math on (8, 128)
registers, with the bitstream served from per-group sliding 128-word
windows (row-local `take_along_axis` gathers — the only gather form Mosaic
supports).  Cross-lane data movement (pool reads, ragged compaction) uses
one-hot int8 MXU matmuls.  Nothing leaves the chip: per block, the CSR
slice is DMA'd from the VMEM pool straight to HBM.

Phases per block (reference semantics: BVGraph.java:139-196 record layout,
successors() at :1032-1133, sequential window at :1136-1281):

  P1 parse   — outdegree / reference / block-count codes, then a lockstep
               walk of the copy-block lists (emitting keep-run pairs into a
               RUNS pool region) and of the interval headers (counts +
               cursors).  All lanes walk code k of their list on trip k, so
               colbuf emissions are dense per lane with tail-only holes.
  P2 extras  — 2-way merge of interval expansion and residual gap decode,
               per lane; depth-0 nodes (no reference) write their final
               lists directly into the FINAL region, others into EXTRAS.
  P3 merge   — per reference-chain round t (in-block depth), active lanes
               2-way merge their copy stream (parent FINAL slots selected
               by keep runs) with their EXTRAS stream into their FINAL
               slots.  In-block depth <= global maxref chain depth.
  P4 output  — DMA FINAL region to the HBM successor array; carry the last
               `window` lists into the halo region for the next block;
               write absolute CSR offsets.

The scalar codec (bits/bitstream.py) is the correctness oracle; tests run
this kernel in interpret mode on CPU against bvgraph_np.decode_to_csr.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from webgraph_tpu.bits import codes as C
from webgraph_tpu.pallas import pcodes as P

I32 = jnp.int32
U32 = jnp.uint32
I8 = jnp.int8

LANES = 1024
GROUPS = 8
GLANES = 128  # lanes per group
NEG = 0x7FFFFFFF  # +inf sentinel for exhausted stream heads


# ----------------------------------------------------------------------
# small vector helpers — all on (8,128) unless noted
# ----------------------------------------------------------------------


def flat(x):
    """(8,128) -> (1,1024) row-major (lane l = 128*sublane + col)."""
    return x.reshape(1, LANES)


def unflat(x):
    return x.reshape(GROUPS, GLANES)


def lane_iota():
    s = jax.lax.broadcasted_iota(I32, (GROUPS, GLANES), 0)
    c = jax.lax.broadcasted_iota(I32, (GROUPS, GLANES), 1)
    return s * GLANES + c


def roll_lanes(x, k: int):
    """Rotate lane values down by k (lane l gets lane l-k), cross-sublane."""
    return unflat(pltpu.roll(flat(x), k, 1))


def gather_prev(x, ref, maxw: int, fill):
    """x[l - ref[l]] for ref in 1..maxw, `fill` where ref out of range or
    l-ref < 0 (halo: caller patches lanes 0..maxw-1 separately)."""
    out = jnp.full_like(x, fill)
    li = lane_iota()
    for r in range(1, maxw + 1):
        cand = roll_lanes(x, r)
        out = jnp.where((ref == r) & (li >= r), cand, out)
    return out


def prefix_sum_lanes(x):
    """Exclusive prefix sum over the 1024 flat lanes (log-shift network)."""
    f = flat(x)
    acc = f
    for b in range(10):
        sh = 1 << b
        rolled = pltpu.roll(acc, sh, 1)
        idx = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
        acc = acc + jnp.where(idx >= sh, rolled, 0)
    # acc is inclusive; exclusive = inclusive - x
    return unflat(acc - f), unflat(acc)


def tab_from_scalars(vals, n: int):
    """(8,128) table whose first n columns (each sublane) hold the scalars
    vals[0..n-1] — the replicated-row layout `take_along_axis` lowers for."""
    idx = jax.lax.broadcasted_iota(I32, (GROUPS, GLANES), 1)
    out = jnp.zeros((GROUPS, GLANES), I32)
    for i in range(n):
        out = jnp.where(idx == i, vals[i], out)
    return out


# ----------------------------------------------------------------------
# per-lane bitstream windows
#
# A stream window is a tuple (hi, lo, avail, nw):
#   hi, lo : uint32 pair holding bits [pos, pos+64) left-aligned
#   avail  : int32 valid bit count (<= 64)
#   nw     : int32 absolute next word index (block-window coords)
# Refill appends whole 32-bit words gathered from the group's sliding
# (8,128) word table.
# ----------------------------------------------------------------------


WTAB_COLS = 256  # per-group sliding word table: two 128-lane halves
# (one group's 128 records span ~140 words on real graphs, so a 128-word
# table thrashes between slides; the gather only lowers within one vreg,
# hence two half-gathers + select)


def win_refill(win, wtab, gw_vec, active):
    """Append one 32-bit word where avail <= 64 and the needed word is in
    the group's word table.  Returns (win, stalled): stalled lanes need a
    table slide first.

    A window is (w0, w1, w2, avail, nw): bits [pos, pos+96) left-aligned in
    three uint32 words, `avail` of them valid, `nw` the next absolute word
    index.  96 bits guarantee progress: any code (<= 44 bits) fits after at
    most two refills (avail >= 65 > 44)."""
    w0, w1, w2, avail, nw = win
    rel = nw - gw_vec
    want = active & (avail <= 64)
    inwin = (rel >= 0) & (rel < WTAB_COLS)
    do = want & inwin
    idx = jnp.where(do, rel, 0)
    wlo = jnp.take_along_axis(wtab[:, :128], idx & 127, axis=1)
    whi = jnp.take_along_axis(wtab[:, 128:], idx & 127, axis=1)
    w = jnp.where(idx < 128, wlo, whi).astype(U32)
    # negative avail = alignment debt from win_reset: pre-shift the first
    # word so bit `pos` lands at the window front
    debt = jnp.maximum(-avail, 0).astype(U32) & U32(31)
    w = jnp.where(avail < 0, w << debt, w)
    a0 = jnp.clip(avail, 0, None)
    sh = a0.astype(U32) & U32(31)
    ssh = (U32(32) - sh) & U32(31)
    hi_part = jnp.where(sh > 0, w >> sh, w)
    lo_part = jnp.where(sh > 0, w << ssh, U32(0))
    # word slot(s) the appended bits land in
    slot = a0 >> 5  # 0, 1, or 2
    w0 = jnp.where(do & (slot == 0), w0 | hi_part, w0)
    w1 = jnp.where(do & (slot == 0), w1 | lo_part,
                   jnp.where(do & (slot == 1), w1 | hi_part, w1))
    w2 = jnp.where(do & (slot == 1), w2 | lo_part,
                   jnp.where(do & (slot == 2), w2 | hi_part, w2))
    avail = jnp.where(do, avail + 32, avail)
    nw = jnp.where(do, nw + 1, nw)
    return (w0, w1, w2, avail, nw), want & ~inwin


def win_consume(win, length, on):
    """Drop `length` (<= 64) bits from the front of the window where on."""
    w0, w1, w2, avail, nw = win
    ln = jnp.where(on, length, 0)
    # shift by whole words first, then 0..31 bits
    nword = ln >> 5
    a = jnp.where(nword >= 1, w1, w0)
    b = jnp.where(nword >= 1, w2, w1)
    c = jnp.where(nword >= 1, U32(0), w2)
    a = jnp.where(nword >= 2, c, a)  # nword==2: (w2, 0, 0)
    b = jnp.where(nword >= 2, U32(0), b)
    r = (ln & 31).astype(U32) & U32(31)
    rs = (U32(32) - r) & U32(31)
    a2 = jnp.where(r > 0, (a << r) | (b >> rs), a)
    b2 = jnp.where(r > 0, (b << r) | (c >> rs), b)
    c2 = jnp.where(r > 0, c << r, c)
    return (a2, b2, c2, avail - ln, nw)


def win_reset(pos, on, win=None):
    """(Re)position windows at absolute bit cursor `pos` where `on`.

    Encoded as an *alignment debt*: avail = -(pos & 31); the first refill
    pre-shifts its word so bit `pos` lands at the window front."""
    if win is None:
        z = jnp.zeros_like(pos)
        zu = z.astype(U32)
        return (zu, zu, zu, z - (pos & 31), pos >> 5)
    w0, w1, w2, avail, nw = win
    zu = U32(0)
    w0 = jnp.where(on, zu, w0)
    w1 = jnp.where(on, zu, w1)
    w2 = jnp.where(on, zu, w2)
    avail = jnp.where(on, -(pos & 31), avail)
    nw = jnp.where(on, pos >> 5, nw)
    return (w0, w1, w2, avail, nw)


# ----------------------------------------------------------------------
# static reader selection
# ----------------------------------------------------------------------


def make_reader(coding: int, k: int):
    """f(hi, lo) -> (value_u32, length) on (8,128) windows."""
    return P.make_window_reader(coding, k)


# ----------------------------------------------------------------------
# kernel configuration
# ----------------------------------------------------------------------


@dataclass(frozen=True)
class KernelCfg:
    skey: tuple            # (outd, ref, bcnt, blk, res, zeta_k, window, minint)
    wrows: int             # block word-window rows of 128 words
    halo_rows: int         # halo region rows (128 slots each)
    final_rows: int        # FINAL region rows (>= ARC_MAX/128)
    extra_rows: int        # EXTRAS region rows
    runs_rows: int         # RUNS region rows (pairs: two parallel pools)
    max_bc: int            # max copy-block count (parse walk bound)
    max_ic: int            # max interval count
    max_depth: int         # max in-block chain depth
    npf: int               # bf16 byte planes in the pool mirror (1..4)
    num_blocks: int
    n: int
    m_pad: int             # padded successor output length (rows of 128)
    need_bits: int         # window bits required before decoding any code
    phase_mask: int = 15   # perf probes only: bit0=P1b, bit1=P2, bit2=P3, bit3=P4
    p2_unroll: int = 8     # P2 merged emissions per lane per loop trip
    p3_unroll: int = 8     # P3 merged emissions per lane per loop trip
    debug_counters: bool = False  # emit per-block trip/refetch counters

    @property
    def pool_rows(self):
        return self.halo_rows + self.final_rows + self.extra_rows + 2 * self.runs_rows


# ----------------------------------------------------------------------
# pool-paged value streams (P3 copies/extras, P1 runs)
#
# A pool is a (ROWS, 128) i32 VMEM region.  Reads are per-lane sequential:
# a *paged queue* (QDEPTH,1024) holds QDEPTH slots starting at the lane's
# cursor.  Cross-lane movement uses EXACT bf16 one-hot MXU matmuls: pool
# values are mirrored as 8-bit byte planes in bf16 (bytes < 2^8 are exact
# in bf16, and every one-hot product lands in a distinct output slot, so
# the f32 accumulation is exact too — measured 2.2x faster than the f32
# HIGHEST 16-bit-half scheme, scripts/pallas_fetch_bench.py); a single
# own-row `take_along_axis` gather aligns the fetched 256-slot row pair to
# the cursor.
# ----------------------------------------------------------------------

QDEPTH = 32
BF16 = jnp.bfloat16


def pool_fetch_queue(pool32_ref, rtot: int, npf: int, ppos, active,
                     row0: int = 0, rows: int | None = None):
    """Fetch each lane's QDEPTH-deep queue of pool slots [ppos, ppos+QDEPTH).

    pool32_ref: (npf*rtot, 128) bf16 scratch mirroring the pool as 8-bit
    byte planes (plane h at rows [h*rtot, (h+1)*rtot)).  ``row0``/``rows``
    bound the one-hot contraction to the pool region all cursors target
    (static).  Returns (QDEPTH,1024) i32.
    """
    if rows is None:
        rows = rtot
    r0 = flat(jnp.where(active, ppos >> 7, row0)) - row0
    r0 = jnp.clip(r0, 0, rows - 1)
    iota = jax.lax.broadcasted_iota(I32, (LANES, rows), 1)
    oh0 = (iota == r0.T).astype(BF16)
    oh1 = (iota == r0.T + 1).astype(BF16)
    xa = xb = None
    for h in range(npf):
        half = pool32_ref[pl.ds(h * rtot + row0, rows), :]
        a = jax.lax.dot_general(
            oh0, half, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(I32)
        b = jax.lax.dot_general(
            oh1, half, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(I32)
        xa = a if xa is None else xa | (a << (8 * h))
        xb = b if xb is None else xb | (b << (8 * h))
    # align: slot ppos at column 0.  The own-row gather only lowers within
    # a single 128-lane vreg, so gather the two row halves separately and
    # select (source column sh+c is in xa below 128, in xb above).
    sh = flat(ppos & 127).T  # (1024,1)
    cidx = jax.lax.broadcasted_iota(I32, (LANES, GLANES), 1)
    src = cidx + sh
    ga = jnp.take_along_axis(xa, jnp.clip(src, 0, 127), axis=1)
    gb = jnp.take_along_axis(xb, src & 127, axis=1)
    aligned = jnp.where(src < 128, ga, gb)
    qT = aligned[:, :QDEPTH]  # (1024, QDEPTH)
    return qT.T  # (QDEPTH, 1024)


def queue_rows(q):
    """(QDEPTH,1024) queue -> tuple of QDEPTH (8,128) row values.

    Holding the queue as separate vreg values makes the per-lane cursor a
    plain integer: reads are a log2(QDEPTH)-level select tree (sel_row) and
    advancing is free — no per-advance cross-sublane rolls at all."""
    return tuple(q[k:k + 1, :].reshape(GROUPS, GLANES)
                 for k in range(QDEPTH))


def sel_row(rows, idx):
    """rows[idx_l] per lane; idx (8,128) int32 clipped to [0, len(rows))."""
    level = list(rows)
    bit = 0
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level), 2):
            nxt.append(jnp.where(((idx >> bit) & 1) > 0,
                                 level[i + 1], level[i]))
        level = nxt
        bit += 1
    return level[0]


# ----------------------------------------------------------------------
# slab compaction: colbuf (SLAB,1024) -> pool rows, per-lane contiguous
# ----------------------------------------------------------------------

SLAB = 128


def pool32_refresh(pool_ref, pool32_ref, rtot: int, npf: int,
                   row0, nrows: int):
    """Mirror pool rows [row0, row0+nrows) into the bf16 byte planes."""
    new = pool_ref[pl.ds(row0, nrows), :]
    for h in range(npf):
        pool32_ref[pl.ds(h * rtot + row0, nrows), :] = (
            (new >> (8 * h)) & 0xFF).astype(BF16)


def compact_slab(colbuf_ref, pool_ref, pool32_ref, pre, cnt, rtot: int,
                 npf: int, row0: int = 0, nrows: int = SLAB,
                 reg0: int = 0, regrows: int | None = None):
    """Scatter lane-major slab emissions into the pool.

    colbuf rows [row0, row0+cnt_l) of column l go to pool slots
    [pre_l, pre_l+cnt_l); cnt_l <= nrows.  pre is the ABSOLUTE pool slot.
    ``reg0``/``regrows`` (static) bound the one-hot scatter and the mirror
    refresh to the pool region all targets fall in.
    Updates the pool and its f32 half-plane mirror.
    """
    if regrows is None:
        regrows = rtot
    A = colbuf_ref[row0 : row0 + nrows, :].T  # (1024, nrows) lane-major
    if nrows < SLAB:
        A = jnp.concatenate([A, jnp.zeros((LANES, SLAB - nrows), I32)], axis=1)
    cntT = flat(cnt).T  # (1024,1)
    colio = jax.lax.broadcasted_iota(I32, (LANES, SLAB), 1)
    A = jnp.where(colio < cntT, A, 0)
    preT = flat(pre).T  # (1024,1)
    sh = preT & 127
    B = A
    for bit in range(7):
        k = 1 << bit
        rolled = pltpu.roll(B, k, 1)  # B'[c] = B[c-k]: shift emissions up
        B = jnp.where((sh >> bit) & 1 > 0, rolled, B)
    # B[l, c] holds value for slot (pre_l & ~127) + c  in row r0 (c >= sh)
    # or row r0+1 (c < sh) — split and scatter with two one-hot matmuls
    keep0 = colio >= sh
    # lanes with cnt == 0 must contribute nothing
    live = (cntT > 0)
    B0 = jnp.where(keep0 & live, B, 0)
    B1 = jnp.where((~keep0) & live, B, 0)
    r0 = flat(pre >> 7) - reg0  # (1,1024) region-relative pool row
    iota = jax.lax.broadcasted_iota(I32, (regrows, LANES), 0)
    oh0 = (iota == r0).astype(BF16)
    oh1 = (iota == r0 + 1).astype(BF16)
    acc = jnp.zeros((regrows, SLAB), I32)
    for h in range(npf):
        p0 = (B0 >> (8 * h)) & 0xFF
        p1 = (B1 >> (8 * h)) & 0xFF
        m0 = jax.lax.dot_general(
            oh0, p0.astype(BF16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m1 = jax.lax.dot_general(
            oh1, p1.astype(BF16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc | ((m0 + m1).astype(I32) << (8 * h))
    # merge into pool: slab targets never collide with existing nonzero
    # content (each slot written exactly once across the block), so OR-merge
    new = pool_ref[pl.ds(reg0, regrows), :] | acc
    pool_ref[pl.ds(reg0, regrows), :] = new
    pool32_refresh(pool_ref, pool32_ref, rtot, npf, reg0, regrows)


# ----------------------------------------------------------------------
# kernel builder
# ----------------------------------------------------------------------


def _any(x) -> jnp.ndarray:
    """0-d int32: 1 if any element of the bool array is set."""
    return jnp.max(x.astype(I32))


def _all(x) -> jnp.ndarray:
    return jnp.min(x.astype(I32))


def build_kernel(cfg: KernelCfg):
    (outd_c, ref_c, bcnt_c, blk_c, res_c, zeta_k, window, minint) = cfg.skey
    read_outd = make_reader(outd_c, zeta_k)
    read_ref = make_reader(ref_c, zeta_k)
    read_bcnt = make_reader(bcnt_c, zeta_k)
    read_blk = make_reader(blk_c, zeta_k)
    read_res = make_reader(res_c, zeta_k)
    read_g = make_reader(C.GAMMA, zeta_k)

    WROWS = cfg.wrows
    HROWS, FROWS, EROWS, RROWS = (
        cfg.halo_rows, cfg.final_rows, cfg.extra_rows, cfg.runs_rows)
    POOL_ROWS = cfg.pool_rows
    NPF = cfg.npf
    # pool slot layout
    S_FINAL = HROWS * 128
    S_EXTRA = (HROWS + FROWS) * 128
    S_RUNS0 = (HROWS + FROWS + EROWS) * 128          # run starts
    S_RUNS1 = (HROWS + FROWS + EROWS + RROWS) * 128  # run lens
    NEED = cfg.need_bits  # min window bits before decoding a code

    def kernel(meta_ref, offs_ref, words_ref, offs_out_ref, succ_ref,
               *rest):
        if cfg.debug_counters:
            stats_ref = rest[0]
            rest = rest[1:]
        else:
            stats_ref = None
        (win_ref, wtab_ref, gwst_ref, pool_ref, pool32_ref,
         colbuf_ref, carry_ref, smem_ref, dma_sem) = rest

        if cfg.debug_counters:
            def tick(slot, inc=1):
                smem_ref[slot] = smem_ref[slot] + inc
        else:
            def tick(slot, inc=1):
                pass

        t = pl.program_id(0)
        wstart_row = meta_ref[t, 0]   # window start, in 128-word rows
        cnt = meta_ref[t, 1]          # nodes in this block
        node0 = meta_ref[t, 2]        # global id of the block's first node
        csr0 = meta_ref[t, 3]         # global arc offset of the first node
        align = csr0 & 127            # FINAL-region shift for row-aligned DMA

        # ---- block init -------------------------------------------------
        @pl.when(t == 0)
        def _():
            smem_ref[1] = 0   # halo list count
            for j in range(7):
                smem_ref[2 + j] = 0   # halo outdegrees (newest first)
                smem_ref[9 + j] = 0   # halo pool-slot bases
            pool_ref[pl.ds(0, HROWS), :] = jnp.zeros((HROWS, 128), I32)
            pool32_refresh(pool_ref, pool32_ref, POOL_ROWS, NPF, 0, HROWS)
            carry_ref[:] = jnp.zeros((1, 128), I32)

        # zero the non-halo pool regions (the halo carries over)
        pool_ref[pl.ds(HROWS, POOL_ROWS - HROWS), :] = jnp.zeros(
            (POOL_ROWS - HROWS, 128), I32)
        pool32_refresh(pool_ref, pool32_ref, POOL_ROWS, NPF,
                       HROWS, POOL_ROWS - HROWS)

        if cfg.debug_counters:
            for s in range(16, 24):
                smem_ref[s] = 0

        # seed FINAL row 0 with the previous block's carried partial CSR row
        # (slots [0, align) belong to the preceding block's last node)
        lane128 = jax.lax.broadcasted_iota(I32, (1, 128), 1)
        pool_ref[pl.ds(HROWS, 1), :] = jnp.where(
            lane128 < align, carry_ref[:], 0)

        # DMA the block's word window into VMEM
        dma = pltpu.make_async_copy(
            words_ref.at[pl.ds(wstart_row, WROWS), :], win_ref, dma_sem)
        dma.start()
        dma.wait()

        # word tables start at word 0 of the window
        gwst_ref[:] = jnp.zeros((8, 1), I32)
        for g in range(8):
            wtab_ref[pl.ds(g, 1), :] = jnp.concatenate(
                [win_ref[pl.ds(0, 1), :], win_ref[pl.ds(1, 1), :]], axis=1)

        li = lane_iota()
        valid = li < cnt
        node_gid = node0 + li
        offs = offs_ref[0]  # (8,128) bit offsets relative to the window

        def gw_vec():
            return jnp.broadcast_to(gwst_ref[:], (GROUPS, GLANES))

        def slide(stalled, nw):
            @pl.when(_any(stalled) > 0)
            def _():
                need = jnp.where(stalled, nw, NEG)
                m = jnp.min(need, axis=1, keepdims=True)  # (8,1)
                cur = gwst_ref[:]
                limit = (WROWS - 3) * 128
                newgw = jnp.where(m < NEG, jnp.clip(m, 0, limit), cur)
                gwst_ref[:] = newgw
                for g in range(8):
                    gws = newgw[g, 0]
                    r0 = gws >> 7
                    three = jnp.concatenate(
                        [win_ref[pl.ds(r0, 1), :],
                         win_ref[pl.ds(r0 + 1, 1), :],
                         win_ref[pl.ds(r0 + 2, 1), :]], axis=1)
                    rolled = pltpu.roll(three, 384 - (gws & 127), 1)
                    wtab_ref[pl.ds(g, 1), :] = rolled[:, :WTAB_COLS]

        def read_code_sync(reader, win, participate):
            """Decode one code per participating lane, synchronously
            (loops with refills/slides until all participants decoded).
            Loop-carried masks are i32 (Mosaic cannot yield i1 vectors)."""
            zero = jnp.zeros((GROUPS, GLANES), I32)

            def cond(st):
                return _any(st[0]) > 0

            def body(st):
                pending_i, win, out, ln = st
                tick(23)
                pending = pending_i > 0
                # two refills per trip: a fresh window needs >= NEED bits
                # before its first decode, and one 32-bit append per trip
                # would spend an extra trip just filling it
                win, st1 = win_refill(win, wtab_ref[:], gw_vec(), pending)
                win, st2 = win_refill(win, wtab_ref[:], gw_vec(), pending)
                st1 = st1 | st2
                slide(st1, win[4])
                w0, w1, w2, avail, nw = win
                ready = pending & (avail >= NEED)
                v, length = reader(w0, w1)
                out = jnp.where(ready, v.astype(I32), out)
                ln = jnp.where(ready, length, ln)
                win = win_consume(win, length, ready)
                return (pending & ~ready).astype(I32), win, out, ln

            st = (participate.astype(I32), win, zero, zero)
            pending, win, out, ln = jax.lax.while_loop(cond, body, st)
            return out, win

        # ================= P1a: structure codes ==========================
        win = win_reset(jnp.where(valid, offs, 0), None)
        d, win = read_code_sync(read_outd, win, valid)
        d = jnp.where(valid, d, 0)
        nonempty = valid & (d > 0)
        if window > 0:
            ref, win = read_code_sync(read_ref, win, nonempty)
            ref = jnp.where(nonempty, ref, 0)
        else:
            ref = jnp.zeros_like(d)
        has_ref = nonempty & (ref > 0)
        bc, win = read_code_sync(read_bcnt, win, has_ref)
        bc = jnp.where(has_ref, bc, 0)

        # parent outdegree dp: in-block via lane rolls, halo via SMEM
        W = max(window, 1)
        hj = ref - li - 1  # halo index (newest first) when >= 0
        use_halo = has_ref & (hj >= 0)
        dp = gather_prev(d, ref, window if window > 0 else 0, 0)
        if window > 0:
            halo_d = tab_from_scalars([smem_ref[2 + j] for j in range(7)], 7)
            hd = jnp.take_along_axis(halo_d, jnp.clip(hj, 0, 6), axis=1)
            dp = jnp.where(use_halo, hd, dp)

        # ================= P1b: copy-block walk ==========================
        runs_cnt = jnp.where(has_ref, (bc + 1) >> 1, 0)
        runs_excl, _ = prefix_sum_lanes(runs_cnt)
        if cfg.phase_mask & 1:
            (win, copied, extra, icnt, int0, res0, _rc, tail_start, tail_len,
             interval_arcs) = _p1b_blocks(
                cfg, read_blk, read_g, win, read_code_sync, win_pos,
                d, ref, bc, dp, has_ref, nonempty, valid, runs_excl,
                pool_ref, pool32_ref, colbuf_ref, tick)
        else:  # perf probe only: structurally-shaped zeros
            z = jnp.zeros_like(d)
            copied = jnp.where(has_ref, dp, 0)
            extra = jnp.where(nonempty, d - copied, 0)
            icnt, int0, res0 = z, z, z
            tail_start, tail_len, interval_arcs = z, jnp.where(has_ref, dp, 0), z
        rescnt = extra - interval_arcs

        # ================= rounds / bases =================================
        # merge round: -1 for no-ref (done in P2); halo parents are final
        # so their children merge in round 0
        rnd = jnp.where(has_ref, -1, 0)
        for _ in range(cfg.max_depth + 1):
            prnd = gather_prev(rnd, ref, window if window > 0 else 0, 0)
            new = jnp.where(use_halo, 0, jnp.where(prnd >= 0, prnd + 1, -1))
            rnd = jnp.where(has_ref & (rnd < 0), new, rnd)

        csr_excl, csr_incl = prefix_sum_lanes(jnp.where(valid, d, 0))
        final_base = S_FINAL + align + csr_excl
        pfb = gather_prev(final_base, ref, window if window > 0 else 0, 0)
        if window > 0:
            halo_b = tab_from_scalars([smem_ref[9 + j] for j in range(7)], 7)
            hb = jnp.take_along_axis(halo_b, jnp.clip(hj, 0, 6), axis=1)
            pfb = jnp.where(use_halo, hb, pfb)

        ex_excl, _ = prefix_sum_lanes(jnp.where(has_ref, extra, 0))
        extra_base = S_EXTRA + ex_excl
        edst = jnp.where(has_ref, extra_base, final_base)

        # ================= P2: extras =====================================
        if cfg.phase_mask & 2:
            _p2_extras(
                cfg, read_res, read_g, wtab_ref, gw_vec, slide,
                int0, res0, icnt, rescnt, extra, edst, node_gid, valid,
                pool_ref, pool32_ref, colbuf_ref, tick)

        # ================= P3: merge rounds ===============================
        if cfg.phase_mask & 4:
            def round_body(rt, _):
                _p3_round(
                    cfg, rt, rnd, has_ref, d, copied, extra,
                    pfb, extra_base, final_base, runs_excl, runs_cnt,
                    tail_start, tail_len,
                    pool_ref, pool32_ref, colbuf_ref, tick)
                return 0

            jax.lax.fori_loop(0, cfg.max_depth + 1, round_body, 0)

        # ================= P4: outputs ====================================
        offs_out_ref[0] = csr0 + jnp.where(valid, csr_excl, csr_incl)
        block_arcs = jnp.max(jnp.where(valid, csr_incl, 0))
        if cfg.phase_mask & 8:
            _p4_output(cfg, cnt, align, block_arcs, d, csr_excl, valid, li,
                       pool_ref, pool32_ref, succ_ref, carry_ref, smem_ref,
                       dma_sem, csr0)

        if cfg.debug_counters:
            sv = jnp.zeros((GROUPS, GLANES), I32)
            for j, s in enumerate(range(16, 24)):
                sv = jnp.where(li == j, smem_ref[s], sv)
            stats_ref[0] = sv

    return kernel


# ----------------------------------------------------------------------
# P1b: lockstep copy-block walk
# ----------------------------------------------------------------------


def _p1b_blocks(cfg, read_blk, read_g, win, read_code_sync, win_pos,
                d, ref, bc, dp, has_ref, nonempty, valid, runs_base,
                pool_ref, pool32_ref, colbuf_ref, tick=lambda s, i=1: None):
    """Walk all copy-block lists in lockstep (all lanes on code k at step k),
    emitting keep-run (start, len) pairs into the RUNS pool regions; then
    the interval count + a cursor-advancing interval walk.

    Returns (win, copied, extra, icnt, int0, res0, runs_cnt, tail_start,
    tail_len, interval_arcs)."""
    (_o, _r, _bc, _blk, _res, zeta_k, window, minint) = cfg.skey
    HROWS, FROWS, EROWS, RROWS = (
        cfg.halo_rows, cfg.final_rows, cfg.extra_rows, cfg.runs_rows)
    S_RUNS0 = (HROWS + FROWS + EROWS) * 128
    S_RUNS1 = (HROWS + FROWS + EROWS + RROWS) * 128
    NPF = cfg.npf
    POOL_ROWS = cfg.pool_rows
    z = jnp.zeros_like(d)
    HALFSLAB = SLAB // 2

    bcmax = jnp.max(jnp.where(has_ref, bc, 0))

    def flush(flushed_pairs, cnt_pairs):
        """Compact the pair slab: starts rows [0,64), lens rows [64,128)."""
        base = jnp.minimum(flushed_pairs, cnt_pairs)
        cnt = jnp.clip(cnt_pairs - flushed_pairs, 0, HALFSLAB)
        compact_slab(colbuf_ref, pool_ref, pool32_ref,
                     S_RUNS0 + runs_base + base, cnt, POOL_ROWS, NPF,
                     row0=0, nrows=HALFSLAB,
                     reg0=HROWS + FROWS + EROWS, regrows=RROWS)
        compact_slab(colbuf_ref, pool_ref, pool32_ref,
                     S_RUNS1 + runs_base + base, cnt, POOL_ROWS, NPF,
                     row0=HALFSLAB, nrows=HALFSLAB,
                     reg0=HROWS + FROWS + EROWS + RROWS, regrows=RROWS)

    runs_cnt = jnp.where(has_ref, (bc + 1) >> 1, 0)

    def cond(st):
        k = st[0]
        return k <= bcmax

    def body(st):
        (k, win, cum, kstart, keepreg, copied, flushed) = st
        tick(16)
        participate = has_ref & (k < bc)
        v, win = read_code_sync(read_blk, win, participate)
        val = jnp.where(k > 0, v + 1, v)
        cum_b = cum
        cum = jnp.where(participate, cum + val, cum)
        is_even = (k & 1) == 0
        keepreg = jnp.where(participate & is_even, val, keepreg)
        kstart = jnp.where(participate & is_even, cum_b, kstart)
        copied = jnp.where(participate & is_even, copied + val, copied)
        # emission at odd k: pair (kstart, keepreg) for lanes with k <= bc
        em_row = (k >> 1) - flushed
        emit = has_ref & ((k & 1) == 1) & (k <= bc)
        colbuf_ref[pl.ds(em_row, 1), :] = flat(jnp.where(emit, kstart, 0))
        colbuf_ref[pl.ds(HALFSLAB + em_row, 1), :] = flat(
            jnp.where(emit, keepreg, 0))

        def do_flush():
            flush(flushed, runs_cnt)

        @pl.when(((k & 1) == 1) & (em_row == HALFSLAB - 1))
        def _():
            do_flush()

        flushed = jnp.where(
            (((k & 1) == 1) & (em_row == HALFSLAB - 1)), flushed + HALFSLAB,
            flushed)
        return (k + 1, win, cum, kstart, keepreg, copied, flushed)

    st = (jnp.int32(0), win, z, z, z, z, jnp.int32(0))
    (k, win, cum, kstart, keepreg, copied, flushed) = jax.lax.while_loop(
        cond, body, st)

    @pl.when(jnp.max(runs_cnt) > flushed)
    def _():
        flush(flushed, runs_cnt)

    # implicit tail run (even block count, including bc == 0)
    tail_on = has_ref & ((bc & 1) == 0)
    tail_start = jnp.where(tail_on, cum, 0)
    tail_len = jnp.where(tail_on, jnp.maximum(dp - cum, 0), 0)
    copied = copied + tail_len
    extra = jnp.where(nonempty, d - jnp.where(has_ref, copied, 0), 0)

    # interval count
    if minint != 0:
        icnt, win = read_code_sync(read_g, win, extra > 0)
        icnt = jnp.where(extra > 0, icnt, 0)
    else:
        icnt = z
    int0 = win_pos(win)

    # interval walk: advance the cursor + accumulate interval arc counts
    interval_arcs = z
    if minint != 0:
        icmax2 = 2 * jnp.max(icnt)

        def icond(st):
            return st[0] < icmax2

        def ibody(st):
            (j, win, interval_arcs) = st
            participate = (extra > 0) & (j < 2 * icnt)
            v, win = read_code_sync(read_g, win, participate)
            interval_arcs = jnp.where(
                participate & ((j & 1) == 1),
                interval_arcs + v + minint, interval_arcs)
            return (j + 1, win, interval_arcs)

        (_, win, interval_arcs) = jax.lax.while_loop(
            icond, ibody, (jnp.int32(0), win, interval_arcs))
    res0 = win_pos(win)

    return (win, copied, extra, icnt, int0, res0, runs_cnt,
            tail_start, tail_len, interval_arcs)


def win_pos(win):
    """Absolute bit cursor of a window (next undecoded bit)."""
    w0, w1, w2, avail, nw = win
    return nw * 32 - avail


# ----------------------------------------------------------------------
# P2: extras (interval expansion  ∪  residual gap decode)
# ----------------------------------------------------------------------


def _p2_extras(cfg, read_res, read_g, wtab_ref, gw_vec, slide,
               int0, res0, icnt, rescnt, extra, edst, node_gid, valid,
               pool_ref, pool32_ref, colbuf_ref, tick=lambda s, i=1: None):
    """Per-lane 2-way merge of interval expansion and residual gap decode.

    Per trip, ``cfg.p2_unroll`` lockstep sub-steps each advance the
    interval pipeline one stage, decode one residual, and emit one merged
    value — so a residual-only lane sustains one decode+emit per sub-step.
    Word-table slides collect across sub-steps and run once per trip."""
    (_o, _r, _bc, _blk, _res, zeta_k, window, minint) = cfg.skey
    NPF = cfg.npf
    POOL_ROWS = cfg.pool_rows
    HROWS, FROWS, EROWS = cfg.halo_rows, cfg.final_rows, cfg.extra_rows
    # a residual/interval γ or ζ code can span up to cfg.need_bits (> 48
    # once n >= ~2^23): hardcoding 48 here silently mis-decoded big graphs
    NEED = cfg.need_bits
    U = cfg.p2_unroll
    z = jnp.zeros_like(extra)
    participate = valid & (extra > 0)

    iwin0 = win_reset(jnp.where(participate & (icnt > 0), int0, 0), None)
    rwin0 = win_reset(jnp.where(participate & (rescnt > 0), res0, 0), None)

    def flush(gs, emitted):
        tick(22)
        pre = edst + jnp.minimum(gs, extra)
        cnt = jnp.clip(jnp.minimum(emitted, extra) - gs, 0, SLAB)
        cnt = jnp.where(participate, cnt, 0)
        compact_slab(colbuf_ref, pool_ref, pool32_ref, pre, cnt,
                     POOL_ROWS, NPF, reg0=HROWS, regrows=FROWS + EROWS)

    def cond(st):
        emitted = st[0]
        return _any(participate & (emitted < extra)) > 0

    def body(st):
        (emitted, fill, gs, iwin, rwin,
         icur, irem, ileft, stage, nxt_left, nxt_len, ptop,
         rv, rv_ok_i, rdec) = st
        tick(17)
        rv_ok = rv_ok_i > 0
        stall_acc = jnp.zeros_like(extra) > 0
        stall_nw = jnp.zeros_like(extra)
        nem = jnp.int32(0)

        for u in range(U):
            active = participate & (emitted < extra)

            # ---- load next interval into the current slot -------------
            can_load = active & (irem == 0) & (ileft > 0) & (stage == 2)
            icur = jnp.where(can_load, nxt_left, icur)
            irem = jnp.where(can_load, nxt_len, irem)
            ptop = jnp.where(can_load, nxt_left + nxt_len, ptop)
            ileft = jnp.where(can_load, ileft - 1, ileft)
            stage = jnp.where(can_load, 0, stage)

            # ---- interval pipeline decode (one stage per sub-step) ----
            ipend = active & (ileft > 0) & (stage < 2)
            iwin, ist = win_refill(iwin, wtab_ref[:], gw_vec(), ipend)
            iready = ipend & (iwin[3] >= NEED)
            gv, glen = read_g(iwin[0], iwin[1])
            left0 = node_gid + P.nat2int_u(gv)
            leftn = ptop + 1 + gv.astype(I32)
            newleft = jnp.where(ileft == icnt, left0, leftn)
            nxt_left = jnp.where(iready & (stage == 0), newleft, nxt_left)
            nxt_len = jnp.where(iready & (stage == 1),
                                gv.astype(I32) + minint, nxt_len)
            iwin = win_consume(iwin, glen, iready)
            stage = jnp.where(iready, stage + 1, stage)

            # ---- residual head decode (one code per sub-step) ---------
            rpend = active & ~rv_ok & (rdec < rescnt)
            rwin, rst = win_refill(rwin, wtab_ref[:], gw_vec(), rpend)
            rready = rpend & (rwin[3] >= NEED)
            rvu, rlen = read_res(rwin[0], rwin[1])
            rnew = jnp.where(rdec == 0, node_gid + P.nat2int_u(rvu),
                             rv + 1 + rvu.astype(I32))
            rv = jnp.where(rready, rnew, rv)
            rv_ok = rv_ok | rready
            rdec = jnp.where(rready, rdec + 1, rdec)
            rwin = win_consume(rwin, rlen, rready)

            stall_acc = stall_acc | ist | rst
            stall_nw = jnp.where(ist, iwin[4],
                                 jnp.where(rst, rwin[4], stall_nw))

            # ---- heads + readiness ------------------------------------
            ih = jnp.where(irem > 0, icur, NEG)
            remain_r = rescnt - (rdec - rv_ok.astype(I32))
            rh = jnp.where(rv_ok & (remain_r > 0), rv, NEG)
            stall_i = (irem == 0) & (ileft > 0)
            stall_r = (~rv_ok) & (rdec < rescnt)
            ready = ~(stall_i | stall_r)
            go = _all(ready | ~active)

            emit = jnp.minimum(ih, rh)
            take_i = active & (ih <= rh)
            colbuf_ref[pl.ds(fill + nem, 1), :] = flat(
                jnp.where(active, emit, 0))

            adv = (go > 0) & active
            icur = jnp.where(adv & take_i, icur + 1, icur)
            irem = jnp.where(adv & take_i, irem - 1, irem)
            rv_ok = rv_ok & ~(adv & ~take_i)
            emitted = jnp.where(adv, emitted + 1, emitted)
            nem = nem + go

        # one slide per trip serves every sub-step's pending refills
        slide(stall_acc, stall_nw)

        fill2 = fill + nem
        do_flush = fill2 > SLAB - U

        @pl.when(do_flush)
        def _():
            flush(gs, emitted)

        gs = jnp.where(do_flush, gs + fill2, gs)
        fill2 = jnp.where(do_flush, 0, fill2)
        return (emitted, fill2, gs, iwin, rwin,
                icur, irem, ileft, stage, nxt_left, nxt_len, ptop,
                rv, rv_ok.astype(I32), rdec)

    st0 = (z, jnp.int32(0), jnp.int32(0), iwin0, rwin0,
           z, z, jnp.where(participate, icnt, 0), z,
           z, z, z, z, z, z)
    st = jax.lax.while_loop(cond, body, st0)
    (emitted, fill, gs, *_rest) = st

    @pl.when(fill > 0)
    def _():
        flush(gs, emitted)


# ----------------------------------------------------------------------
# P3: reference-chain merge rounds (copies vs extras)
# ----------------------------------------------------------------------


def _p3_round(cfg, rt, rnd, has_ref, d, copied, extra,
              pfb, extra_base, final_base, runs_base, runs_cnt,
              tail_start, tail_len, pool_ref, pool32_ref, colbuf_ref,
              tick=lambda s, i=1: None):
    """Merge round rt: lanes at in-block chain depth rt 2-way merge their
    copy stream with their extras stream into their FINAL slots.

    The copy stream reads the parent's FINAL region CONTIGUOUSLY (cursor
    ``cp`` over parent positions): keep runs (start, len) from the RUNS
    pools select which entries are emitted, entries before a run's start
    are *discarded* — the queue advances per lane without emission, so run
    switches never reposition the queue (no global re-alignment stalls).
    Per trip, up to ``cfg.p3_unroll`` merged values are emitted per lane in
    lockstep sub-steps; queues refetch independently on exhaustion."""
    NPF = cfg.npf
    POOL_ROWS = cfg.pool_rows
    HROWS, FROWS, EROWS, RROWS = (
        cfg.halo_rows, cfg.final_rows, cfg.extra_rows, cfg.runs_rows)
    S_EXTRA = (HROWS + FROWS) * 128
    S_RUNS0 = (HROWS + FROWS + EROWS) * 128
    S_RUNS1 = S_RUNS0 + RROWS * 128
    z = jnp.zeros_like(d)
    U = cfg.p3_unroll
    DU = 7  # bulk discards per lane per trip (3-bit composed roll)

    part = has_ref & (rnd == rt) & (d > 0)

    def flush(gs, emitted):
        tick(22)
        pre = final_base + jnp.minimum(gs, d)
        cnt = jnp.clip(jnp.minimum(emitted, d) - gs, 0, SLAB)
        cnt = jnp.where(part, cnt, 0)
        compact_slab(colbuf_ref, pool_ref, pool32_ref, pre, cnt,
                     POOL_ROWS, NPF, reg0=HROWS, regrows=FROWS)

    def fetch_cq(cp):
        return queue_rows(pool_fetch_queue(
            pool32_ref, POOL_ROWS, NPF,
            jnp.clip(pfb + cp, 0, None), part,
            row0=0, rows=HROWS + FROWS))

    def fetch_eq(epos):
        return queue_rows(pool_fetch_queue(
            pool32_ref, POOL_ROWS, NPF,
            jnp.clip(epos, S_EXTRA, None), part,
            row0=HROWS + FROWS, rows=EROWS))

    def fetch_rq(pulled):
        rpos = jnp.clip(S_RUNS0 + runs_base + pulled, S_RUNS0, None)
        rqs = pool_fetch_queue(pool32_ref, POOL_ROWS, NPF, rpos, part,
                               row0=HROWS + FROWS + EROWS, rows=RROWS)
        rql = pool_fetch_queue(pool32_ref, POOL_ROWS, NPF,
                               rpos + (S_RUNS1 - S_RUNS0), part,
                               row0=HROWS + FROWS + EROWS + RROWS,
                               rows=RROWS)
        return queue_rows(rqs), queue_rows(rql)

    QTOP = QDEPTH - 1

    def refill_cache(have2, nks, nkl, runs_left, rqn, rqs, rql, rstall):
        """Pull the next keep-run pair from the queues into the one-slot
        cache (the only sel_row cost of run handling; loads read the
        cache)."""
        can = (have2 == 0) & (runs_left > 0)
        ok = can & (rqn < QDEPTH)
        rstall = rstall | (can & ~(rqn < QDEPTH))
        ridx = jnp.clip(rqn, 0, QTOP)
        nks = jnp.where(ok, sel_row(rqs, ridx), nks)
        nkl = jnp.where(ok, sel_row(rql, ridx), nkl)
        rqn = jnp.where(ok, rqn + 1, rqn)
        have2 = jnp.where(ok, 1, have2)
        return have2, nks, nkl, rqn, rstall

    def load_runs(active, crem, kstart, krem, runs_left, tail_used,
                  have2, nks, nkl, rstall):
        """One keep-run load per call (from the cache or the implicit
        tail); cheap — no queue selection."""
        need = active & (krem == 0) & (crem > 0)
        use_pair = need & (have2 > 0)
        kstart = jnp.where(use_pair, nks, kstart)
        krem = jnp.where(use_pair, jnp.minimum(nkl, crem), krem)
        have2 = jnp.where(use_pair, 0, have2)
        runs_left = jnp.where(use_pair, runs_left - 1, runs_left)
        use_tail = (need & (runs_left == 0) & ~use_pair & ~tail_used
                    & (tail_len > 0))
        kstart = jnp.where(use_tail, tail_start, kstart)
        krem = jnp.where(use_tail, jnp.minimum(tail_len, crem), krem)
        tail_used = tail_used | use_tail
        # cache-empty loads just stall the lane until the next refill —
        # only refill_cache (queue exhaustion) may trigger a fetch
        return kstart, krem, runs_left, tail_used, have2, rstall

    def cond(st):
        emitted = st[0]
        return _any(part & (emitted < d)) > 0

    def body(st):
        (emitted, fill, gs,
         crem, kstart, krem, cp, cqn,
         runs_left, tail_used_i, rqn,
         have2, nks, nkl,
         eleft, epos, eqn,
         cq, eq, rqs, rql) = st
        tail_used = tail_used_i > 0
        active = part & (emitted < d)
        tick(18)
        false_v = jnp.zeros_like(d) > 0
        cstall = false_v
        estall = false_v
        rstall = false_v

        # ---- phase A: cache refills + run loads + bulk discards --------
        for _ in range(2):
            (have2, nks, nkl, rqn, rstall) = refill_cache(
                have2, nks, nkl, runs_left, rqn, rqs, rql, rstall)
            (kstart, krem, runs_left, tail_used, have2,
             rstall) = load_runs(active, crem, kstart, krem, runs_left,
                                 tail_used, have2, nks, nkl, rstall)
        (have2, nks, nkl, rqn, rstall) = refill_cache(
            have2, nks, nkl, runs_left, rqn, rqs, rql, rstall)
        can_disc = active & (krem > 0)
        disc = jnp.where(
            can_disc,
            jnp.clip(jnp.minimum(kstart - cp, QDEPTH - cqn), 0, DU), z)
        cp = cp + disc
        cqn = cqn + disc
        cstall = cstall | (can_disc & (cp < kstart) & (cqn >= QDEPTH))

        # ---- lockstep emission sub-steps -------------------------------
        nem = jnp.int32(0)
        for u in range(U):
            if u > 0:
                # mid-trip run switch: one load + one discard per sub-step
                (kstart, krem, runs_left, tail_used, have2,
                 rstall) = load_runs(active, crem, kstart, krem, runs_left,
                                     tail_used, have2, nks, nkl, rstall)
                d1 = active & (krem > 0) & (cp < kstart) & (cqn < QDEPTH)
                cp = jnp.where(d1, cp + 1, cp)
                cqn = jnp.where(d1, cqn + 1, cqn)
            if u == U // 2:
                (have2, nks, nkl, rqn, rstall) = refill_cache(
                    have2, nks, nkl, runs_left, rqn, rqs, rql, rstall)
            cq_ok = cqn < QDEPTH
            pos_ready = (krem > 0) & (cp >= kstart)
            ch = jnp.where(pos_ready & cq_ok,
                           sel_row(cq, jnp.clip(cqn, 0, QTOP)), NEG)
            eq_ok = eqn < QDEPTH
            eh = jnp.where((eleft > 0) & eq_ok,
                           sel_row(eq, jnp.clip(eqn, 0, QTOP)), NEG)
            cstall = cstall | (active & pos_ready & ~cq_ok)
            estall = estall | (active & (eleft > 0) & ~eq_ok)
            unready = (crem > 0) & ~pos_ready
            stall = (pos_ready & ~cq_ok) | ((eleft > 0) & ~eq_ok) | unready
            go = _all(~stall | ~active)

            emit = jnp.minimum(ch, eh)
            colbuf_ref[pl.ds(fill + nem, 1), :] = flat(
                jnp.where(active, emit, 0))
            adv = (go > 0) & active
            take_c = adv & (ch <= eh)
            crem = jnp.where(take_c, crem - 1, crem)
            krem = jnp.where(take_c, krem - 1, krem)
            cp = jnp.where(take_c, cp + 1, cp)
            cqn = jnp.where(take_c, cqn + 1, cqn)
            adve = adv & ~take_c
            eleft = jnp.where(adve, eleft - 1, eleft)
            epos = jnp.where(adve, epos + 1, epos)
            eqn = jnp.where(adve, eqn + 1, eqn)
            emitted = jnp.where(adv, emitted + 1, emitted)
            nem = nem + go

        fill2 = fill + nem
        do_flush = fill2 > SLAB - U

        @pl.when(do_flush)
        def _():
            flush(gs, emitted)

        gs = jnp.where(do_flush, gs + fill2, gs)
        fill2 = jnp.where(do_flush, 0, fill2)

        # ---- per-queue demand refetch (queues start exhausted) ---------
        tick(19, _any(cstall))
        tick(20, _any(estall))
        tick(21, _any(rstall))
        cq, cqn = jax.lax.cond(
            _any(cstall) > 0,
            lambda a: (fetch_cq(a[2]), jnp.zeros_like(a[1])),
            lambda a: (a[0], a[1]), (cq, cqn, cp))
        eq, eqn = jax.lax.cond(
            _any(estall) > 0,
            lambda a: (fetch_eq(a[2]), jnp.zeros_like(a[1])),
            lambda a: (a[0], a[1]), (eq, eqn, epos))
        pulled = jnp.where(part, runs_cnt, 0) - runs_left + have2
        rqs, rql, rqn = jax.lax.cond(
            _any(rstall) > 0,
            lambda a: (*fetch_rq(a[3]), jnp.zeros_like(a[2])),
            lambda a: (a[0], a[1], a[2]), (rqs, rql, rqn, pulled))

        return (emitted, fill2, gs,
                crem, kstart, krem, cp, cqn,
                runs_left, tail_used.astype(I32), rqn,
                have2, nks, nkl,
                eleft, epos, eqn,
                cq, eq, rqs, rql)

    # queues start EXHAUSTED (dummy rows, counters at QDEPTH): the first
    # trip discovers which streams the round actually uses and fetches only
    # those — rounds without extras (or pairs) never pay those fetches
    epos0 = extra_base
    dq = tuple(z for _ in range(QDEPTH))
    full_ctr = jnp.full_like(z, QDEPTH)
    st0 = (z, jnp.int32(0), jnp.int32(0),
           jnp.where(part, copied, 0), z, z, z, full_ctr,
           jnp.where(part, runs_cnt, 0), z, full_ctr,
           z, z, z,
           jnp.where(part, extra, 0), epos0, full_ctr,
           dq, dq, dq, dq)
    st = jax.lax.while_loop(cond, body, st0)
    (emitted, fill, gs, *_r) = st

    @pl.when(fill > 0)
    def _():
        flush(gs, emitted)


# ----------------------------------------------------------------------
# P4: halo carry + DMA out
# ----------------------------------------------------------------------


def _p4_output(cfg, cnt, align, block_arcs, d, csr_excl, valid, li,
               pool_ref, pool32_ref, succ_ref, carry_ref, smem_ref,
               dma_sem, csr0):
    (_o, _r, _bc, _blk, _res, _zk, window, _mi) = cfg.skey
    HROWS, FROWS = cfg.halo_rows, cfg.final_rows
    NPF = cfg.npf
    W = max(window, 1)

    def scal(vec, i):
        """vec[lane i] as a 0-d scalar (reduction-based extraction)."""
        return jnp.sum(jnp.where(li == i, vec, 0))

    # carry the block's last (partial) CSR row for the next block's seed
    carry_ref[:] = pool_ref[pl.ds(HROWS + ((align + block_arcs) >> 7), 1), :]

    # DMA the FINAL region to the successor rows; csr0 is row-aligned via
    # the `align` shift (slack rows past the block's data are rewritten by
    # the next block / land in the output padding)
    dma = pltpu.make_async_copy(
        pool_ref.at[pl.ds(HROWS, FROWS)],
        succ_ref.at[pl.ds(csr0 >> 7, FROWS)],
        dma_sem)
    dma.start()
    dma.wait()

    # halo: move the last `window` lists to pool[0:HALO) (newest first
    # would complicate bases — store OLDEST of the 7 first? we store them
    # contiguous in node order: nodes [cnt-W, cnt); SMEM d's newest-first)
    s0 = HROWS * 128 + align + scal(csr_excl, jnp.maximum(cnt - W, 0))
    r0s = s0 >> 7
    c0 = s0 & 127
    for r in range(HROWS):
        two = jnp.concatenate(
            [pool_ref[pl.ds(r0s + r, 1), :], pool_ref[pl.ds(r0s + r + 1, 1), :]],
            axis=1)
        rolled = pltpu.roll(two, (256 - c0) & 255, 1)
        pool_ref[pl.ds(r, 1), :] = rolled[:, :128]
    # refresh the halo's f32 mirror
    pool32_refresh(pool_ref, pool32_ref, cfg.pool_rows, NPF, 0, HROWS)

    # SMEM carries: halo outdegrees (newest node first) and the halo-base
    # convention: halo lists are stored in NODE ORDER starting at slot 0
    # for node cnt-W.  We store d's newest-first (j=0 -> node cnt-1-j).
    smem_ref[1] = jnp.minimum(cnt, W)
    base_last = scal(csr_excl, jnp.maximum(cnt - W, 0))
    for j in range(7):
        idx = cnt - 1 - j
        dj = jnp.where(idx >= 0, scal(d, jnp.maximum(idx, 0)), 0)
        smem_ref[2 + j] = dj
        # pool slot of node cnt-1-j's halo copy = its csr offset - csr(cnt-W)
        bj = jnp.where(
            idx >= 0,
            scal(csr_excl, jnp.maximum(idx, 0)) - base_last, 0)
        smem_ref[9 + j] = bj


# ----------------------------------------------------------------------
# host wrapper
# ----------------------------------------------------------------------


def _u32_words(g) -> np.ndarray:
    """The graph bit stream as MSB-first uint32 words."""
    from webgraph_tpu.bits.bitstream import as_u64_words

    w64 = as_u64_words(g._words)
    w32 = np.empty(2 * len(w64), dtype=np.uint32)
    w32[0::2] = (w64 >> np.uint64(32)).astype(np.uint32)
    w32[1::2] = (w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return w32


def make_cfg(g, plan) -> KernelCfg:
    s = g.settings
    n = plan.n
    # the cross-block halo protocol carries exactly 7 lists (SMEM slots
    # 2..8 / 9..15); a larger window would silently decode wrong
    if s.window_size > 7:
        raise ValueError(
            f"in-kernel decode supports window_size <= 7 (got "
            f"{s.window_size}); use formats/bvgraph_jax or the host decoder")
    # longest code the kernel may meet: gamma of a zigzagged gap (< 2n) or
    # of an outdegree/blocks value (< n); delta/zeta are never longer
    vbits = max(int(max(n, 2)).bit_length() + 1, 2)
    need = min(64, 2 * vbits + 1)
    # pool values (successor ids, run starts/lens) are < max(n, d_max):
    # mirrored as ceil(bits/8) bf16 byte planes (exact one-hot matmuls)
    vmax_bits = max(int(max(n - 1, 1)).bit_length(),
                    int(max(plan.max_d, 1)).bit_length())
    npf = max(1, (vmax_bits + 7) // 8)
    hrows = plan.halo_arcs // 128 + 1
    frows = plan.pool_arcs // 128 + 2
    erows = (plan.extra_arcs + 127) // 128 + 2
    rrows = (plan.runs_pairs + 127) // 128 + 2
    # the P4 halo row-roll reads up to 2*HROWS + FROWS pool rows
    if erows + 2 * rrows < hrows + 1:
        erows = hrows + 1 - 2 * rrows
    mrows = int(max(
        (plan.csr_start.max(initial=0) >> 7) + frows if plan.num_blocks else frows,
        (plan.m + 127) // 128 + 1,
    ))
    return KernelCfg(
        skey=(
            s.outdegree_coding,
            s.reference_coding,
            s.block_count_coding,
            s.block_coding,
            s.residual_coding,
            s.zeta_k,
            s.window_size,
            s.min_interval_length,
        ),
        wrows=plan.window_words // 128,
        halo_rows=hrows,
        final_rows=frows,
        extra_rows=erows,
        runs_rows=rrows,
        max_bc=plan.max_bc,
        max_ic=plan.max_ic,
        max_depth=plan.max_depth,
        npf=npf,
        num_blocks=plan.num_blocks,
        n=n,
        m_pad=mrows,
        need_bits=need,
    )


@functools.lru_cache(maxsize=16)
def _compiled(cfg: KernelCfg, interpret: bool):
    kernel = build_kernel(cfg)
    nb = cfg.num_blocks
    out_specs = [
        pl.BlockSpec((1, GROUPS, GLANES), lambda t: (t, 0, 0)),  # offs_out
        pl.BlockSpec(memory_space=pl.ANY),               # succ
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, GROUPS, GLANES), I32),
        jax.ShapeDtypeStruct((cfg.m_pad, 128), I32),
    ]
    if cfg.debug_counters:
        out_specs.append(pl.BlockSpec((1, GROUPS, GLANES), lambda t: (t, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nb, GROUPS, GLANES), I32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # meta
            pl.BlockSpec((1, GROUPS, GLANES), lambda t: (t, 0, 0)),  # offs
            pl.BlockSpec(memory_space=pl.ANY),               # words
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((cfg.wrows, 128), I32),                  # win
            pltpu.VMEM((GROUPS, WTAB_COLS), I32),               # wtab
            pltpu.VMEM((GROUPS, 1), I32),                       # gwst
            pltpu.VMEM((cfg.pool_rows, 128), I32),              # pool
            pltpu.VMEM((cfg.npf * cfg.pool_rows, 128), BF16),   # pool32
            pltpu.VMEM((SLAB, LANES), I32),                     # colbuf
            pltpu.VMEM((1, 128), I32),                          # carry
            pltpu.SMEM((24,), I32),                             # smem (+counters)
            pltpu.SemaphoreType.DMA,                            # dma_sem
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    return jax.jit(fn)


def prepare(g, *, lanes: int = LANES, window_words: int = 4096,
            pool_arcs: int = 16384):
    """Plan + pack device inputs for the in-kernel decoder.

    Returns ``(cfg, meta, offs, words)`` — everything needed to invoke
    ``_compiled(cfg, interpret)(meta, offs, words)``.
    """
    from webgraph_tpu.pallas.plan import plan_blocks, scan_structure

    scan = scan_structure(g)
    plan = plan_blocks(g, scan, lanes=lanes, window_words=window_words,
                       pool_arcs=pool_arcs)
    cfg = make_cfg(g, plan)

    nb = plan.num_blocks
    meta = np.zeros((max(nb, 1), 4), dtype=np.int32)
    meta[:nb, 0] = plan.word_row
    meta[:nb, 1] = plan.node_count
    meta[:nb, 2] = plan.node_start
    meta[:nb, 3] = plan.csr_start

    bo = g.bit_offsets.astype(np.int64)
    offs = np.zeros((max(nb, 1), LANES), dtype=np.int32)
    for t in range(nb):
        a, c = int(plan.node_start[t]), int(plan.node_count[t])
        offs[t, :c] = bo[a : a + c] - (int(plan.word_row[t]) << 12)
    offs = offs.reshape(max(nb, 1), GROUPS, GLANES)

    w32 = _u32_words(g)
    wrows_total = int(plan.word_row.max(initial=0)) + cfg.wrows
    words = np.zeros(wrows_total * 128, dtype=np.uint32)
    words[: min(len(w32), len(words))] = w32[: len(words)]
    words = words.view(np.int32).reshape(wrows_total, 128)

    return cfg, plan, meta, offs, words


def decode_to_csr(g, *, interpret: bool | None = None, lanes: int = LANES,
                  window_words: int = 4096, pool_arcs: int = 16384):
    """Decode a whole BVGraph with the in-kernel Pallas decoder.

    Returns ``(offsets int64[n+1], successors int32[m])``, identical to
    ``formats/bvgraph_np.decode_to_csr`` (the scalar/vector oracle).
    Reference semantics: BVGraph.java:139-196 (record layout), :1136-1281
    (sequential window decode).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cfg, plan, meta, offs, words = prepare(
        g, lanes=lanes, window_words=window_words, pool_arcs=pool_arcs)
    fn = _compiled(cfg, bool(interpret))
    offs_out, succ = fn(meta, offs, words)
    offs_out = np.asarray(offs_out).reshape(-1, LANES)
    succ = np.asarray(succ).reshape(-1)

    n, m = plan.n, plan.m
    offsets = np.zeros(n + 1, dtype=np.int64)
    for t in range(plan.num_blocks):
        a, c = int(plan.node_start[t]), int(plan.node_count[t])
        offsets[a : a + c] = offs_out[t, :c]
    offsets[n] = m
    return offsets, succ[:m].astype(np.int32)
