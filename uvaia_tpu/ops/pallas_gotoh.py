"""Pallas TPU kernel: banded Gotoh forward pass.

The lax.scan formulation (ops/gotoh.py) dispatches ~3.7k tiny
(B, W)-row steps per 30kb reference; XLA's per-iteration overhead makes
the whole forward 300-560ms per 64-row group — ~0.3% of VPU capability
for the ~500M DP cells.  This kernel runs the row loop *inside* one
program with the DP state (H and X rows) resident in VMEM, so a row
costs ~30 vector ops and nothing else.

Semantics are identical to gotoh._row_kernel (same cost model, masks,
tie preferences, band-edge certificate accumulation); exactness is
pinned against the XLA forward in tests (interpret mode) and against
the O(nm) oracle transitively.

The score-only pass returns the final H row and the running band-edge
minimum; _final_score / certificates stay in XLA (tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gotoh import GAP_EXT, GAP_OPEN, MISMATCH, OE

INF = (1 << 28)   # python int: jnp constants would be captured consts


def _score_kernel(n, lo, W, Wp, ref_smem, q_ref, qlen_ref,
                  hout_ref, edge_ref, h_scr, x_scr):
    """One program scores a (bt, m_pad) query block against ref.

    ref_smem — (n_pad,) int32 reference bytes (scalar-prefetched: the
               per-row char read is a dynamic scalar index)
    q_ref    — (bt, m_pad) int32 query bytes, pre-padded as in
               gotoh._forward_setup (W+1 zeros in front)
    qlen_ref — (bt, 1) int32 true lengths
    hout/edge — final H row (bt, Wp) and edge minima (bt, 1)
    h_scr/x_scr — (bt, Wp) int32 VMEM scratch carrying the DP rows

    The per-row query window slides by one lane per row; Mosaic only
    allows 128-aligned dynamic lane slices, so the kernel reads an
    aligned (bt, Wp+128) super-window and rotates it into place with a
    dynamic pltpu.roll.
    """
    bt = q_ref.shape[0]
    e = GAP_EXT
    oe = OE
    inf = INF
    qlen = qlen_ref[...]                          # (bt, 1)
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    live_slot = slots < W                         # Wp-padding slots

    # row 0 init: j = slot + lo; H = cost of j leading insertions
    j0 = slots + lo
    h0 = jnp.where(j0 == 0, 0,
                   jnp.where(j0 > 0, GAP_OPEN + e * j0, inf))
    h0 = jnp.where(j0 > qlen, inf, h0)            # (bt, Wp) via bcast
    h0 = jnp.where(live_slot, h0, inf)
    h_scr[...] = jnp.broadcast_to(h0, (bt, Wp))
    x_scr[...] = jnp.full((bt, Wp), inf, jnp.int32)
    edge = jnp.minimum(h_scr[:, 0:1], h_scr[:, W - 1:W])

    def row(i, edge):
        h_prev = h_scr[...]
        x_prev = x_scr[...]
        j = i + lo + slots                        # (1, Wp)
        jv = (j >= 0) & (j <= qlen) & live_slot

        start = i + lo - 1 + (W + 1)
        aligned = pl.multiple_of((start >> 7) << 7, 128)
        wide = q_ref[:, pl.ds(aligned, Wp + 128)]  # (bt, Wp+128) uint8
        # left-rotate by d = start - aligned in [0, 128); negative
        # traced shifts miscompile on TPU, so use the positive modular
        # equivalent (size - d) % size
        d = start - aligned
        size = Wp + 128
        qwin = pltpu.roll(wide.astype(jnp.int32),   # rotate is 32-bit only
                          jax.lax.rem(size - d, size), 1)[:, :Wp]
        refc = ref_smem[i - 1]
        sub = jnp.where(qwin == refc, 0, MISMATCH)
        sub = jnp.where((j >= 1) & (j <= qlen), sub, inf)

        m_row = h_prev + sub

        # shift left by one slot, INF enters on the right
        def shl(a):
            rolled = pltpu_roll(a, -1)
            return jnp.where(slots == Wp - 1, inf, rolled)

        x_open = shl(h_prev) + oe
        x_ext = shl(x_prev) + e
        x_row = jnp.minimum(x_open, x_ext)

        g_row = jnp.minimum(m_row, x_row)
        # y via prefix cummin of (g - slot*e), shifted by one
        a = g_row - slots * e
        c = _cummin_lanes(a, Wp)
        c1 = pltpu_roll(c, 1)                     # c[t-1] at slot t
        y_row = oe + (slots - 1) * e + c1
        y_row = jnp.where(slots == 0, inf, y_row)

        h_row = jnp.minimum(g_row, y_row)
        h_row = jnp.minimum(jnp.where(jv, h_row, inf), inf)
        x_row = jnp.minimum(jnp.where(jv, x_row, inf), inf)

        h_scr[...] = h_row
        x_scr[...] = x_row
        return jnp.minimum(edge, jnp.minimum(h_row[:, 0:1],
                                             h_row[:, W - 1:W]))

    edge = jax.lax.fori_loop(1, n + 1, row, edge)
    hout_ref[...] = h_scr[...]
    edge_ref[...] = edge


def pltpu_roll(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Lane roll via static slicing (compiles to a lane rotate)."""
    if shift == 0:
        return a
    s = shift % a.shape[1]
    return jnp.concatenate([a[:, -s:], a[:, :-s]], axis=1)


def _cummin_lanes(a: jnp.ndarray, Wp: int) -> jnp.ndarray:
    """Prefix min along the lane axis in log2(Wp) shift+min steps."""
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    d = 1
    while d < Wp:
        shifted = jnp.where(slots >= d, pltpu_roll(a, d), INF)
        a = jnp.minimum(a, shifted)
        d *= 2
    return a


ROWS = 128       # DP rows per grid step in the tb-emitting forward


def _fwd_kernel(n, lo, W, Wp, rows, ref_smem, q_ref, qlen_ref,
                tb_ref, hout_ref, edge_ref, h_scr, x_scr, e_scr):
    """Traceback-emitting forward: grid (B//bt, n_pad//rows); program
    (i, k) advances rows k*rows+1 .. (k+1)*rows of batch tile i,
    carrying H/X/edge in VMEM scratch across k and writing the packed
    traceback block (rows, bt, Wp) for this chunk."""
    k = pl.program_id(1)
    bt = q_ref.shape[0]
    e = GAP_EXT
    oe = OE
    inf = INF
    qlen = qlen_ref[...]
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    live_slot = slots < W

    @pl.when(k == 0)
    def _():
        j0 = slots + lo
        h0 = jnp.where(j0 == 0, 0,
                       jnp.where(j0 > 0, GAP_OPEN + e * j0, inf))
        h0 = jnp.where(j0 > qlen, inf, h0)
        h0 = jnp.where(live_slot, h0, inf)
        h_scr[...] = jnp.broadcast_to(h0, (bt, Wp))
        x_scr[...] = jnp.full((bt, Wp), inf, jnp.int32)
        e_scr[...] = jnp.minimum(h0[:, 0:1] * jnp.ones((bt, 1), jnp.int32),
                                 jnp.broadcast_to(h0[:, W - 1:W],
                                                  (bt, 1)))

    def row(r, _):
        i = k * rows + r + 1                      # global DP row
        h_prev = h_scr[...]
        x_prev = x_scr[...]
        j = i + lo + slots
        jv = (j >= 0) & (j <= qlen) & live_slot

        start = i + lo - 1 + (W + 1)
        aligned = pl.multiple_of((start >> 7) << 7, 128)
        wide = q_ref[:, pl.ds(aligned, Wp + 128)]
        d = start - aligned
        size = Wp + 128
        qwin = pltpu.roll(wide.astype(jnp.int32),
                          jax.lax.rem(size - d, size), 1)[:, :Wp]
        refc = ref_smem[jnp.minimum(i, n) - 1]
        sub = jnp.where(qwin == refc, 0, MISMATCH)
        sub = jnp.where((j >= 1) & (j <= qlen), sub, inf)

        m_row = h_prev + sub

        def shl(a):
            rolled = pltpu_roll(a, -1)
            return jnp.where(slots == Wp - 1, inf, rolled)

        x_open = shl(h_prev) + oe
        x_ext = shl(x_prev) + e
        x_row = jnp.minimum(x_open, x_ext)
        x_from_ext = x_ext <= x_open             # prefer extend on ties

        g_row = jnp.minimum(m_row, x_row)
        a = g_row - slots * e
        c = _cummin_lanes(a, Wp)
        c1 = pltpu_roll(c, 1)
        y_row = oe + (slots - 1) * e + c1
        y_row = jnp.where(slots == 0, inf, y_row)

        h_row = jnp.minimum(g_row, y_row)
        h_row = jnp.minimum(jnp.where(jv, h_row, inf), inf)
        x_out = jnp.minimum(jnp.where(jv, x_row, inf), inf)

        # packed traceback byte (gotoh._row_kernel emit_tb semantics)
        y_open_direct = pltpu_roll(g_row, 1) + oe
        y_open_direct = jnp.where(slots == 0, inf, y_open_direct)
        y_from_ext = y_row < y_open_direct       # prefer open on ties
        g_from_x = x_row < m_row
        src = jnp.where(y_row < g_row, 2, g_from_x.astype(jnp.int32))
        tb_row = (src | (x_from_ext.astype(jnp.int32) << 2)
                  | (y_from_ext.astype(jnp.int32) << 3)
                  | (g_from_x.astype(jnp.int32) << 4))
        tb_ref[r, :, :] = tb_row.astype(jnp.uint8)

        live = i <= n
        h_scr[...] = jnp.where(live, h_row, h_prev)
        x_scr[...] = jnp.where(live, x_out, x_prev)
        new_edge = jnp.minimum(e_scr[...],
                               jnp.minimum(h_row[:, 0:1],
                                           h_row[:, W - 1:W]))
        e_scr[...] = jnp.where(live, new_edge, e_scr[...])
        return 0

    jax.lax.fori_loop(0, rows, row, 0)
    hout_ref[...] = h_scr[...]
    edge_ref[...] = e_scr[...]


@functools.partial(jax.jit,
                   static_argnames=("lo", "width", "interpret"))
def gotoh_forward_pallas(ref: jnp.ndarray, q: jnp.ndarray,
                         qlen: jnp.ndarray, lo: int, width: int,
                         interpret: bool = False):
    """Drop-in for gotoh.gotoh_forward: (tb (n, B, W) uint8, score,
    t_end, edge_min)."""
    from . import gotoh as g
    n = int(ref.shape[0])
    B, m_pad = q.shape
    W = width
    Wp = -(-W // 128) * 128
    bt = max(b for b in (64, 32, 16, 8, 1) if B % b == 0)
    n_pad = -(-n // ROWS) * ROWS
    tail = W + Wp + 257 + (n_pad - n)
    qlen_total = W + 1 + m_pad + tail
    qlen_total += (-qlen_total) % 128
    qp = jnp.concatenate(
        [jnp.zeros((B, W + 1), jnp.uint8), q,
         jnp.zeros((B, qlen_total - (W + 1) - m_pad), jnp.uint8)],
        axis=1)
    ref_i = jnp.pad(ref.astype(jnp.int32), (0, (-n) % 128),
                    constant_values=-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt, n_pad // ROWS),
        in_specs=[
            pl.BlockSpec((bt, qp.shape[1]), lambda i, k, ref: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, k, ref: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, bt, Wp), lambda i, k, ref: (k, i, 0)),
            pl.BlockSpec((bt, Wp), lambda i, k, ref: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, k, ref: (i, 0))),
        scratch_shapes=[pltpu.VMEM((bt, Wp), jnp.int32),
                        pltpu.VMEM((bt, Wp), jnp.int32),
                        pltpu.VMEM((bt, 1), jnp.int32)],
    )
    tb, h_fin, edge = pl.pallas_call(
        functools.partial(_fwd_kernel, n, lo, W, Wp, ROWS),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_pad, B, Wp), jnp.uint8),
                   jax.ShapeDtypeStruct((B, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        interpret=interpret,
    )(ref_i, qp, qlen.astype(jnp.int32)[:, None])
    score, t_end = g._final_score(h_fin[:, :W], qlen, lo, n, W)
    return tb[:n, :, :W], score, t_end, edge[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("lo", "width", "interpret"))
def gotoh_score_pallas(ref: jnp.ndarray, q: jnp.ndarray,
                       qlen: jnp.ndarray, lo: int, width: int,
                       interpret: bool = False):
    """Drop-in for gotoh.gotoh_score: (score (B,), edge_min (B,))."""
    from . import gotoh as g
    n = int(ref.shape[0])
    B, m_pad = q.shape
    W = width
    Wp = -(-W // 128) * 128
    # the row loop's scalar overhead dominates tiny (bt, Wp) vector
    # work, so take the widest batch tile that fits VMEM (queries are
    # stored uint8: a (64, ~31k) block is ~2MB)
    bt = max(b for b in (64, 32, 16, 8, 1) if B % b == 0)
    # pre-pad queries exactly as the XLA forward does, plus room for
    # the aligned super-window read; total length lane-aligned
    tail = W + Wp + 257
    qlen_total = W + 1 + m_pad + tail
    qlen_total += (-qlen_total) % 128
    qp = jnp.concatenate(
        [jnp.zeros((B, W + 1), jnp.uint8), q,
         jnp.zeros((B, qlen_total - (W + 1) - m_pad), jnp.uint8)],
        axis=1)
    ref_i = jnp.pad(ref.astype(jnp.int32), (0, (-n) % 128),
                    constant_values=-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, qp.shape[1]), lambda i, ref: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i, ref: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((bt, Wp), lambda i, ref: (i, 0)),
                   pl.BlockSpec((bt, 1), lambda i, ref: (i, 0))),
        scratch_shapes=[pltpu.VMEM((bt, Wp), jnp.int32),
                        pltpu.VMEM((bt, Wp), jnp.int32)],
    )
    h_fin, edge = pl.pallas_call(
        functools.partial(_score_kernel, n, lo, W, Wp),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        interpret=interpret,
    )(ref_i, qp, qlen.astype(jnp.int32)[:, None])
    score, _ = g._final_score(h_fin[:, :W], qlen, lo, n, W)
    return score, edge[:, 0]
