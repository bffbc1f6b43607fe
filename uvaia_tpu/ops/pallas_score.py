"""Pallas TPU kernel: fused feature-build + match-count matmuls.

The XLA path (ops/scan.site_partials) materialises per-site int8
feature planes (pure-base one-hot, mask bits, valid) in HBM before the
dots — ~9x the code bytes of traffic.  This kernel decodes the 4-bit
IUPAC codes into features inside VMEM per tile and feeds the MXU
directly, so HBM only ever sees the (B,S)/(Q,S) code matrices and the
(B,Q,3) counter output.

Counters (identical contract to site_partials' per-query part):
  out[..., 0] = sum_s a_r . a_q   (ACGT matches)
  out[..., 1] = sum_s m_r . m_q   (mask-bit intersections)
  out[..., 2] = sum_s v_r . v_q   (valid pairs)

Grid (B/Bt, Q/Qt, S/St) with revisited output blocks accumulating over
the site axis.  Exactness is tested against the XLA path (interpret
mode on CPU, real kernels on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dot(x, y):
    """The one MXU boundary shared by every kernel here: int8 operands,
    int32 accumulation, contraction over the trailing (site) axis.

    int4 operands were tried (every operand here is a 0/1 plane, and
    halved staging would admit the qt=1024 tiles the 16MB scoped-vmem
    limit rejects): a standalone gridless int4 dot compiles and is
    exact on this v5e toolchain, but the real gridded kernels fail
    Mosaic lowering ("failed to legalize operation 'arith.cmpi'"), so
    int8 stays."""
    return jax.lax.dot_general(
        x.astype(jnp.int8), y.astype(jnp.int8),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _pop4(c):
    """Popcount of a 4-bit IUPAC mask, elementwise int32."""
    return (((c >> 0) & 1) + ((c >> 1) & 1)
            + ((c >> 2) & 1) + ((c >> 3) & 1))


def _features(codes_i32):
    """(T, St) int32 codes -> (a bits[4], m bits[4], v) int32 planes.

    Stays in int32 — Mosaic has no int8 elementwise multiply; the dot
    operands are cast to int8 at the MXU boundary instead.

    This decode runs per tile VISIT and is the kernel's VPU wall at
    small query counts (the 9 int8 dots keep the MXU <15% busy), so
    the op count matters: the pure-base plane for bit b is simply the
    one-hot test ``c == 1<<b`` (1 op) — no popcount, no select."""
    bits = [((codes_i32 >> b) & 1) for b in range(4)]
    a = [(codes_i32 == (1 << b)).astype(jnp.int32) for b in range(4)]
    v = (codes_i32 != 0).astype(jnp.int32)
    return a, bits, v


def _features_rows(codes_ref):
    """Feature planes for a kernel input ref.

    A SWAR variant was built and measured (pltpu.bitcast int8->int32 so
    each 32-bit VPU op decodes 4 codes: bits[b] = (w >> b) & 0x01010101,
    pure-base = bits[b] & ~bits[b+1..3], bitcast back to int8 for the
    MXU).  It was bit-exact on v5e but consistently SLOWER at the
    headline shape — mats B=4096/Q=64: 9.4-13.5 ms vs 6.8 ms unpacked,
    back-to-back same-window A/B — and neutral at Q=1000 (9.0 vs
    9.3 ms): the (rows/4) relayouts around every bitcast cost more than
    the 4x lane saving on the decode algebra, so the unpacked int32
    decode stays (same verdict family as the int4-operand note in
    `_dot`)."""
    return _features(codes_ref[...].astype(jnp.int32))


def _kernel(r_ref, q_ref, aa_ref, mm_ref, vv_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        aa_ref[...] = jnp.zeros_like(aa_ref)
        mm_ref[...] = jnp.zeros_like(mm_ref)
        vv_ref[...] = jnp.zeros_like(vv_ref)

    ra, rm, rv = _features_rows(r_ref)
    qa, qm, qv = _features_rows(q_ref)

    s_aa = _dot(ra[0], qa[0])
    s_mm = _dot(rm[0], qm[0])
    for b in range(1, 4):
        s_aa += _dot(ra[b], qa[b])
        s_mm += _dot(rm[b], qm[b])
    s_vv = _dot(rv, qv)

    aa_ref[...] += s_aa
    mm_ref[...] += s_mm
    vv_ref[...] += s_vv


def _kernel_full(r_ref, q_ref, cons_ref, aa_ref, mm_ref, vv_ref, c_ref):
    """_kernel + the consensus-stage counters, so the reference codes
    are read from HBM exactly once per (i, k) tile.

    Three of the five consensus counters ride the MAIN dots for free:
    the caller appends three synthetic query rows (pure-masked
    consensus -> acgt_c in the aa column, all-15 -> valid in the vv
    column, raw consensus -> valid_c in the vv column).  Only text_c
    and part_c need consensus-specific planes, and their site
    reductions run on the MXU as skinny one-hot-weight dots instead of
    VPU lane reductions (the old 5-reduction block was ~15% of kernel
    time at the bench shape):
      c[:, 0] text_c  — code equality (both valid)
      c[:, 1] part_c  — mask intersection
    The consensus counters are query-independent: only the j == 0
    program accumulates them."""
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        aa_ref[...] = jnp.zeros_like(aa_ref)
        mm_ref[...] = jnp.zeros_like(mm_ref)
        vv_ref[...] = jnp.zeros_like(vv_ref)

    @pl.when((k == 0) & (j == 0))
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    ra, rm, rv = _features_rows(r_ref)
    qa, qm, qv = _features_rows(q_ref)

    s_aa = _dot(ra[0], qa[0])
    s_mm = _dot(rm[0], qm[0])
    for b in range(1, 4):
        s_aa += _dot(ra[b], qa[b])
        s_mm += _dot(rm[b], qm[b])
    s_vv = _dot(rv, qv)

    aa_ref[...] += s_aa
    mm_ref[...] += s_mm
    vv_ref[...] += s_vv

    @pl.when(j == 0)
    def _():
        cons = cons_ref[...].astype(jnp.int32)        # (1, st), 0..15
        st = cons.shape[1]
        rc = r_ref[...].astype(jnp.int32)
        eq = ((rc == cons) & (cons != 0)).astype(jnp.int32)
        inter = ((rc & cons) != 0).astype(jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, st), 0)
        w_t = (row == 0).astype(jnp.int32)
        w_p = (row == 1).astype(jnp.int32)
        c_ref[...] += _dot(eq, w_t) + _dot(inter, w_p)


@functools.partial(jax.jit, static_argnames=("bt", "qt", "st", "interpret"))
def pair_counter_mats(ref_sub: jnp.ndarray, q_sub: jnp.ndarray,
                      bt: int = 256, qt: int = 128, st: int = 512,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, Q, 3) int32 counters from code matrices (B, S), (Q, S).

    S must be padded to a multiple of `st`; B, Q to their tiles (the
    caller-side padding with code 0 contributes zero to every counter).
    """
    B, S = ref_sub.shape
    Q = q_sub.shape[0]
    bt = min(bt, B)
    qt = min(qt, Q)
    st = min(st, S)
    if B % bt or Q % qt or S % st:
        raise ValueError(f"shapes ({B},{Q},{S}) not divisible by tiles "
                         f"({bt},{qt},{st})")
    grid = (B // bt, Q // qt, S // st)
    out_spec = pl.BlockSpec((bt, qt), lambda i, j, k: (i, j))
    aa, mm, vv = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, Q), jnp.int32)
                        for _ in range(3)),
        interpret=interpret,
    )(ref_sub, q_sub)
    return jnp.stack([aa, mm, vv], axis=-1)


# ----------------------------------------------------------------------
# fused ambiguity-correction kernel.
#
# Full-mode scoring needs two rare-site corrections (scan.assemble_
# scores): corr_t adds text matches at sites where BOTH codes are the
# same ambiguity code, and corr_p fixes the mask-dot overcount at
# sites where both codes are ambiguous.  The XLA path materialises a
# (B, A, 16) one-hot in HBM before two giant dots — at Q=1000 the
# ambiguity column set A covers ~40% of the genome and that
# materialisation alone exceeds the whole scoring kernel's cost.  Here
# the one-hot planes are built per tile in VMEM and fed to the MXU
# directly, exactly like the main counter kernel.
#
# Derivation (both sums over the amb-restricted columns; pc = popcount
# of the 4-bit mask intersection; amb(x) = popcount(x) >= 2):
#   corr_t = sum_s [q == r, both ambiguous]
#          = sum_{c in AMB_CODES} oh_c(q) . oh_c(r)        (11 dots)
#   corr_p = sum_s [both ambiguous] (1 - [q&r == 0] - pc(q&r))
#     [q&r == 0, both ambiguous] happens ONLY for the three
#     complementary two-base pairs (M-K, R-Y, S-W): any three-or-more-
#     base code intersects every other ambiguity code, so
#   corr_p = amb(q).amb(r)                                  (1 dot)
#          - sum_{(a,b) in COMP2 pairs, both orders} oh_a(q).oh_b(r)
#                                                           (6 dots)
#          - sum_b (bit_b*amb)(q) . (bit_b*amb)(r)          (4 dots)

# The decode (27 compare/select planes per tile visit) is the VPU wall
# of this kernel — at Q=1000 corr+assembly is 7.6ms of a 17ms step
# (scripts/profile_step.py).  An int8-NATIVE decode (keep codes int8,
# where/compare/bitwise in int8, 4x lanes per VPU op) was tried and
# fails Mosaic compilation on this v5e toolchain (remote tpu_compile
# HTTP 500, same legalization family as the int4-operand note in
# _dot), so the int32 decode stays.
#
# every popcount>=2 code: two-base, three-base, and 15 (all four
# bases).  encode() maps no input character to 15 today, but the XLA
# path's IS_AMBIG table counts it, and the kernels are pinned exactly
# equal on ALL code matrices, not just reachable ones.
AMB_CODES = (3, 5, 6, 9, 10, 12, 7, 11, 13, 14, 15)
COMP2 = ((3, 12), (5, 10), (6, 9))             # M-K, R-Y, S-W


def _kernel_corr(r_ref, q_ref, t_ref, p_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        t_ref[...] = jnp.zeros_like(t_ref)
        p_ref[...] = jnp.zeros_like(p_ref)

    rc = r_ref[...].astype(jnp.int32)
    qc = q_ref[...].astype(jnp.int32)

    # popcount >= 2 == "not a power of two and nonzero"; c & (c-1) is
    # nonzero exactly then (0 & -1 == 0, so code 0 stays non-ambiguous)
    r_amb = ((rc & (rc - 1)) != 0).astype(jnp.int32)
    q_amb = ((qc & (qc - 1)) != 0).astype(jnp.int32)

    oh_r = {c: (rc == c).astype(jnp.int32) for c in AMB_CODES}
    oh_q = {c: (qc == c).astype(jnp.int32) for c in AMB_CODES}

    s_t = _dot(oh_r[AMB_CODES[0]], oh_q[AMB_CODES[0]])
    for c in AMB_CODES[1:]:
        s_t += _dot(oh_r[c], oh_q[c])
    t_ref[...] += s_t

    s_p = _dot(r_amb, q_amb)
    for a, b in COMP2:
        s_p -= _dot(oh_r[a], oh_q[b]) + _dot(oh_r[b], oh_q[a])
    for b in range(4):
        s_p -= _dot(((rc >> b) & 1) * r_amb, ((qc >> b) & 1) * q_amb)
    p_ref[...] += s_p


@functools.partial(jax.jit, static_argnames=("bt", "qt", "at", "interpret"))
def _corr_call(r_amb_codes, q_amb_codes, bt: int, qt: int, at: int,
               interpret: bool = False):
    B, A = r_amb_codes.shape
    Q = q_amb_codes.shape[0]
    grid = (B // bt, Q // qt, A // at)
    out_spec = pl.BlockSpec((bt, qt), lambda i, j, k: (i, j))
    return pl.pallas_call(
        _kernel_corr,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, at), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, at), lambda i, j, k: (j, k)),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32)),
        interpret=interpret,
    )(r_amb_codes, q_amb_codes)


def corr_via_pallas(r_amb_codes: jnp.ndarray, q_amb_codes: jnp.ndarray,
                    interpret: bool = False):
    """(corr_t (B, Q), corr_p (B, Q)) int32 from the amb-column code
    matrices (B, A), (Q, A).  Zero-padded rows/columns contribute zero
    (code 0 is not ambiguous)."""
    B, A = r_amb_codes.shape
    Q = q_amb_codes.shape[0]
    # qt as wide as possible: the ref one-hot planes rebuild per query
    # tile, and at Q=1000 the amb column set covers ~40% of the genome
    # (the corr pass rivals the main kernel) — same lever as the main
    # kernel's wide-qt note above
    bt, qt, at = 256, min(512, -(-Q // 128) * 128), 512
    pad = lambda n, m: (-n) % m
    r = jnp.pad(r_amb_codes, ((0, pad(B, bt)), (0, pad(A, at))))
    q = jnp.pad(q_amb_codes, ((0, pad(Q, qt)), (0, pad(A, at))))
    t, p = _corr_call(r, q, bt=min(bt, r.shape[0]), qt=min(qt, q.shape[0]),
                      at=min(at, r.shape[1]), interpret=interpret)
    return t[:B, :Q], p[:B, :Q]


def _acgt_pair_dots(r_feats, other_ref):
    """The two --acgt dots vs a query operand tile: (pure-pair count,
    ACGT-match count)."""
    ra, rp = r_feats
    qc = other_ref[...].astype(jnp.int32)
    qa, _, _ = _features(qc)
    qp = (qa[0] + qa[1] + qa[2] + qa[3])

    s_pp = _dot(rp, qp)
    s_aa = _dot(ra[0], qa[0])
    for b in range(1, 4):
        s_aa += _dot(ra[b], qa[b])
    return s_pp, s_aa


def _r_acgt_feats(r_ref):
    rc = r_ref[...].astype(jnp.int32)
    ra, _, _ = _features(rc)
    rp = (ra[0] + ra[1] + ra[2] + ra[3])          # pure_r as 0/1
    return rc, (ra, rp)


def _kernel_acgt_main(r_ref, q_ref, cons_ref, pp_ref, aa_ref, c_ref):
    """--acgt fused pass, window part: pure-pair + ACGT-match counters
    vs the query window, plus the acgt consensus stage:
      c[:, 0] mm_c  — pure-pair mismatches vs consensus
      c[:, 1] va_c  — pure-pair comparisons vs consensus
      c[:, 4] valid — ref nonzero count
    (the polymorphic-subset counters run as a second kernel of the
    same proven <=4-output shape — a single 5-output kernel faulted
    the TPU worker at large query grids)."""
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        pp_ref[...] = jnp.zeros_like(pp_ref)
        aa_ref[...] = jnp.zeros_like(aa_ref)

    @pl.when((k == 0) & (j == 0))
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    rc, r_feats = _r_acgt_feats(r_ref)
    s_pp, s_aa = _acgt_pair_dots(r_feats, q_ref)
    pp_ref[...] += s_pp
    aa_ref[...] += s_aa

    @pl.when(j == 0)
    def _():
        cons = cons_ref[...].astype(jnp.int32)        # (1, st)
        cpop = _pop4(cons)
        both = r_feats[1] * (cpop == 1)
        mm_c = jnp.sum(both * (rc != cons), axis=1)
        va_c = jnp.sum(both, axis=1)
        valid = jnp.sum((rc != 0).astype(jnp.int32), axis=1)
        z = valid * 0
        c_ref[...] += jnp.stack([mm_c, va_c, z, z, valid, z, z, z],
                                axis=-1)


def _kernel_acgt_poly(r_ref, p_ref, ppp_ref, aap_ref):
    """--acgt fused pass, polymorphic-subset part."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        ppp_ref[...] = jnp.zeros_like(ppp_ref)
        aap_ref[...] = jnp.zeros_like(aap_ref)

    _, r_feats = _r_acgt_feats(r_ref)
    s_pp, s_aa = _acgt_pair_dots(r_feats, p_ref)
    ppp_ref[...] += s_pp
    aap_ref[...] += s_aa


@functools.partial(jax.jit, static_argnames=("bt", "qt", "st", "interpret"))
def _pair_counter_acgt(ref_codes, q_full, q_poly, cons_full,
                       bt: int, qt: int, st: int, interpret: bool = False):
    B, S = ref_codes.shape
    Q = q_full.shape[0]
    grid = (B // bt, Q // qt, S // st)
    out_spec = pl.BlockSpec((bt, qt), lambda i, j, k: (i, j))
    pp, aa, cons = pl.pallas_call(
        _kernel_acgt_main,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, st), lambda i, j, k: (0, k)),
        ],
        out_specs=(out_spec, out_spec,
                   pl.BlockSpec((bt, 8), lambda i, j, k: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8), jnp.int32)),
        interpret=interpret,
    )(ref_codes, q_full, cons_full[None, :])
    ppp, aap = pl.pallas_call(
        _kernel_acgt_poly,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32)),
        interpret=interpret,
    )(ref_codes, q_poly)
    mats = jnp.stack([pp, aa, ppp, aap], axis=-1)
    # scan.assemble_scores expects cons5 = (mm_c, va_c, 0, 0, valid)
    return mats, cons[:, :5]


def mats_and_cons_acgt_via_pallas(ref_codes, q_full, q_poly, cons_full,
                                  interpret: bool = False):
    """Fused --acgt scoring pass (see _kernel_acgt).  Returns
    (mats (B, Q, 4), cons5 (B, 5))."""
    B, S = ref_codes.shape
    Q = q_full.shape[0]
    # two query operands make this kernel heavier in VMEM than the
    # full-mode one; (256, 256, 512) measured 11.8ms at B=2048, Q=1000
    # (10x faster than qt=128 shapes)
    if Q <= 64:
        bt, qt, st = 512, 64, 1024
    else:
        bt, qt, st = 256, 256, 512
    pad = lambda n, m: (-n) % m
    r = jnp.pad(ref_codes, ((0, pad(B, bt)), (0, pad(S, st))))
    q = jnp.pad(q_full, ((0, pad(Q, qt)), (0, pad(S, st))))
    p = jnp.pad(q_poly, ((0, pad(Q, qt)), (0, pad(S, st))))
    c = jnp.pad(cons_full, (0, pad(S, st)))
    mats, cons5 = _pair_counter_acgt(r, q, p, c, bt=min(bt, r.shape[0]),
                                     qt=min(qt, q.shape[0]),
                                     st=min(st, r.shape[1]),
                                     interpret=interpret)
    return mats[:B, :Q], cons5[:B]


# ----------------------------------------------------------------------
# packed-input variant: score straight from the 4-bit packed reference
# matrix.  The scoring kernels are element-touch-bound (the (B, W)
# uint8 code matrix is the dominant HBM read); feeding the (B, W/2)
# packed matrix halves that read.  The per-tile unpack emits sites in
# DE-INTERLEAVED order — concat(hi nibbles, lo nibbles) = sites
# [0,2,4,...,1,3,5,...] of the tile — because a lane interleave is a
# cross-lane shuffle Mosaic would serialise; instead the QUERY operands
# are permuted once to the same order (site sums are permutation-
# invariant when both operands agree).

def _kernel_full_packed(rp_ref, q_ref, cons_ref, aa_ref, mm_ref, vv_ref,
                        c_ref):
    """_kernel_full with a packed (bt, st/2) reference block; q_ref and
    cons_ref arrive in the de-interleaved per-tile site order."""
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        aa_ref[...] = jnp.zeros_like(aa_ref)
        mm_ref[...] = jnp.zeros_like(mm_ref)
        vv_ref[...] = jnp.zeros_like(vv_ref)

    @pl.when((k == 0) & (j == 0))
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    pk = rp_ref[...].astype(jnp.int32)                   # (bt, st/2)
    rc = jnp.concatenate([(pk >> 4) & 0xF, pk & 0xF], axis=1)

    ra, rm, rv = _features(rc)
    qa, qm, qv = _features_rows(q_ref)

    s_aa = _dot(ra[0], qa[0])
    s_mm = _dot(rm[0], qm[0])
    for b in range(1, 4):
        s_aa += _dot(ra[b], qa[b])
        s_mm += _dot(rm[b], qm[b])
    s_vv = _dot(rv, qv)

    aa_ref[...] += s_aa
    mm_ref[...] += s_mm
    vv_ref[...] += s_vv

    @pl.when(j == 0)
    def _():
        cons = cons_ref[...].astype(jnp.int32)        # (1, st), permuted
        st = cons.shape[1]
        eq = ((rc == cons) & (cons != 0)).astype(jnp.int32)
        inter = ((rc & cons) != 0).astype(jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, st), 0)
        w_t = (row == 0).astype(jnp.int32)
        w_p = (row == 1).astype(jnp.int32)
        c_ref[...] += _dot(eq, w_t) + _dot(inter, w_p)


@functools.partial(jax.jit, static_argnames=("bt", "qt", "st", "interpret"))
def _pair_counter_full_packed(ref_packed, q_perm, cons_perm,
                              bt: int, qt: int, st: int,
                              interpret: bool = False):
    B, S2 = ref_packed.shape
    S = 2 * S2
    Q = q_perm.shape[0]
    grid = (B // bt, Q // qt, S // st)
    out_spec = pl.BlockSpec((bt, qt), lambda i, j, k: (i, j))
    aa, mm, vv, cons = pl.pallas_call(
        _kernel_full_packed,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, st), lambda i, j, k: (0, k)),
        ],
        out_specs=(out_spec, out_spec, out_spec,
                   pl.BlockSpec((bt, 8), lambda i, j, k: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8), jnp.int32)),
        interpret=interpret,
    )(ref_packed, q_perm, cons_perm[None, :])
    return aa, mm, vv, cons


def deinterleave_perm(width: int, st: int) -> jnp.ndarray:
    """(width,) int32 site permutation matching the packed kernel's
    per-tile unpack order: within each st-site block, evens then odds.
    perm[p] = the ORIGINAL site index that position p reads."""
    import numpy as np
    p = np.arange(width, dtype=np.int32)
    blk, off = p // st, p % st
    half = st // 2
    orig = np.where(off < half, 2 * off, 2 * (off - half) + 1)
    return jnp.asarray(blk * st + orig)


def mats_and_cons_via_pallas_packed(ref_packed: jnp.ndarray,
                                    q_full: jnp.ndarray,
                                    cons_full: jnp.ndarray,
                                    interpret: bool = False):
    """mats_and_cons_via_pallas fed by the 4-bit PACKED reference
    matrix (scan.pack_codes layout: even site in the high nibble).
    ref_packed width may be ceil(L/2) < W/2; it is zero-padded here
    (code-0 pairs score nothing).  Same synthetic-row construction and
    tile choices as the unpacked wrapper; the query/consensus operands
    are gathered into the de-interleaved order per tile (a (Q, W) int8
    gather, ~2MB at the bench shape — noise next to the 61MB packed
    read it enables halving)."""
    Q, W = q_full.shape
    B = ref_packed.shape[0]
    pad = lambda n, m: (-n) % m
    cf = cons_full.astype(jnp.int32)
    pure_c = ((cf & (cf - 1)) == 0) & (cf != 0)
    row_x = jnp.where(pure_c, cons_full, 0).astype(q_full.dtype)
    row_y = jnp.full((W,), 15, dtype=q_full.dtype)
    row_z = cons_full.astype(q_full.dtype)
    q_ext = jnp.concatenate(
        [q_full, row_x[None], row_y[None], row_z[None]], axis=0)
    Qe = Q + 3
    # measured on v5e at the bench shape (B=4096, Q=64, S=30720),
    # kernel-only in-loop: (1024, 72, 1024) = 2.64ms vs (512, 72,
    # 1024) = 2.87ms and (256, 72, 2048) = 2.66ms; bt=2048 / st=4096 /
    # (1024, 2048) fail to compile (VMEM).  Unpacked best was 3.7ms —
    # the halved HBM read is worth ~1.4x at the kernel.
    if Qe <= 72:
        bt, st = 1024, 1024
        qt = max(64, -(-Qe // 8) * 8)
    else:
        bt, st = 256, 512
        qt = min(512, -(-Qe // 128) * 128)
    Wp = W + pad(W, st)
    r = jnp.pad(ref_packed, ((0, pad(B, bt)), (0, Wp // 2 - ref_packed.shape[1])))
    q = jnp.pad(q_ext, ((0, pad(Qe, qt)), (0, Wp - W)))
    c = jnp.pad(cons_full, (0, Wp - W))
    perm = deinterleave_perm(Wp, min(st, Wp))
    q = jnp.take(q, perm, axis=1)
    c = jnp.take(c, perm)
    aa, mm, vv, cons = _pair_counter_full_packed(
        r, q, c, bt=min(bt, r.shape[0]), qt=min(qt, q.shape[0]),
        st=min(st, Wp), interpret=interpret)
    cons5 = jnp.stack([aa[:, Q], cons[:, 0], cons[:, 1], vv[:, Q + 2],
                       vv[:, Q + 1]], axis=-1)
    mats = jnp.stack([aa[:, :Q], mm[:, :Q], vv[:, :Q]], axis=-1)
    return mats[:B], cons5[:B]


def _kernel_acgt_main_packed(rp_ref, q_ref, cons_ref, pp_ref, aa_ref,
                             c_ref):
    """_kernel_acgt_main with a packed (bt, st/2) reference block;
    q_ref and cons_ref arrive in the de-interleaved per-tile site order
    (see the packed-variant section comment).  The consensus-stage
    counters are site sums, so the shared permutation cancels."""
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        pp_ref[...] = jnp.zeros_like(pp_ref)
        aa_ref[...] = jnp.zeros_like(aa_ref)

    @pl.when((k == 0) & (j == 0))
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)

    pk = rp_ref[...].astype(jnp.int32)                   # (bt, st/2)
    rc = jnp.concatenate([(pk >> 4) & 0xF, pk & 0xF], axis=1)
    ra, _, _ = _features(rc)
    rp = (ra[0] + ra[1] + ra[2] + ra[3])
    r_feats = (ra, rp)
    s_pp, s_aa = _acgt_pair_dots(r_feats, q_ref)
    pp_ref[...] += s_pp
    aa_ref[...] += s_aa

    @pl.when(j == 0)
    def _():
        cons = cons_ref[...].astype(jnp.int32)        # (1, st), permuted
        cpop = _pop4(cons)
        both = rp * (cpop == 1)
        mm_c = jnp.sum(both * (rc != cons), axis=1)
        va_c = jnp.sum(both, axis=1)
        valid = jnp.sum((rc != 0).astype(jnp.int32), axis=1)
        z = valid * 0
        c_ref[...] += jnp.stack([mm_c, va_c, z, z, valid, z, z, z],
                                axis=-1)


def _kernel_acgt_poly_packed(rp_ref, p_ref, ppp_ref, aap_ref):
    """_kernel_acgt_poly with a packed reference block (p_ref arrives
    de-interleaved)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        ppp_ref[...] = jnp.zeros_like(ppp_ref)
        aap_ref[...] = jnp.zeros_like(aap_ref)

    pk = rp_ref[...].astype(jnp.int32)
    rc = jnp.concatenate([(pk >> 4) & 0xF, pk & 0xF], axis=1)
    ra, _, _ = _features(rc)
    rp = (ra[0] + ra[1] + ra[2] + ra[3])
    s_pp, s_aa = _acgt_pair_dots((ra, rp), p_ref)
    ppp_ref[...] += s_pp
    aap_ref[...] += s_aa


@functools.partial(jax.jit, static_argnames=("bt", "qt", "st", "interpret"))
def _pair_counter_acgt_packed(ref_packed, q_perm, p_perm, cons_perm,
                              bt: int, qt: int, st: int,
                              interpret: bool = False):
    B, S2 = ref_packed.shape
    S = 2 * S2
    Q = q_perm.shape[0]
    grid = (B // bt, Q // qt, S // st)
    out_spec = pl.BlockSpec((bt, qt), lambda i, j, k: (i, j))
    pp, aa, cons = pl.pallas_call(
        _kernel_acgt_main_packed,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, st), lambda i, j, k: (0, k)),
        ],
        out_specs=(out_spec, out_spec,
                   pl.BlockSpec((bt, 8), lambda i, j, k: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8), jnp.int32)),
        interpret=interpret,
    )(ref_packed, q_perm, cons_perm[None, :])
    ppp, aap = pl.pallas_call(
        _kernel_acgt_poly_packed,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st // 2), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32)),
        interpret=interpret,
    )(ref_packed, p_perm)
    mats = jnp.stack([pp, aa, ppp, aap], axis=-1)
    return mats, cons[:, :5]


def mats_and_cons_acgt_via_pallas_packed(ref_packed: jnp.ndarray,
                                         q_full: jnp.ndarray,
                                         q_poly: jnp.ndarray,
                                         cons_full: jnp.ndarray,
                                         interpret: bool = False):
    """mats_and_cons_acgt_via_pallas fed by the 4-bit PACKED reference
    matrix — the --acgt twin of mats_and_cons_via_pallas_packed: both
    acgt kernels read the (B, W/2) packed matrix and unpack nibbles in
    VMEM, halving their dominant HBM read; the query/poly/consensus
    operands are permuted once to the kernels' de-interleaved site
    order (site sums are permutation-invariant when operands agree)."""
    Q, W = q_full.shape
    B = ref_packed.shape[0]
    pad = lambda n, m: (-n) % m
    # the acgt decode carries more live int32 planes than the full-mode
    # kernel (ra[4] + rp + rc ~ 24 bytes/site at bt=1024/st=1024), so
    # the in-loop compile blows the 16MB scoped-vmem limit at the
    # full-mode tiles (measured: 25.42M requested) — bt stays 512 as in
    # the unpacked acgt kernel; the packed read is still halved
    if Q <= 64:
        bt, st = 512, 1024
        qt = max(64, -(-Q // 8) * 8)
    else:
        bt, st = 256, 512
        qt = min(256, -(-Q // 128) * 128)
    Wp = W + pad(W, st)
    r = jnp.pad(ref_packed,
                ((0, pad(B, bt)), (0, Wp // 2 - ref_packed.shape[1])))
    q = jnp.pad(q_full, ((0, pad(Q, qt)), (0, Wp - W)))
    p = jnp.pad(q_poly, ((0, pad(Q, qt)), (0, Wp - W)))
    c = jnp.pad(cons_full, (0, Wp - W))
    perm = deinterleave_perm(Wp, min(st, Wp))
    q = jnp.take(q, perm, axis=1)
    p = jnp.take(p, perm, axis=1)
    c = jnp.take(c, perm)
    mats, cons5 = _pair_counter_acgt_packed(
        r, q, p, c, bt=min(bt, r.shape[0]), qt=min(qt, q.shape[0]),
        st=min(st, Wp), interpret=interpret)
    return mats[:B, :Q], cons5[:B]


def mats_via_pallas(ref_sub: jnp.ndarray, q_sub: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for the XLA feature-matmul trio: pads shapes to kernel
    tiles (zero codes contribute zero) and slices back."""
    B, S = ref_sub.shape
    Q = q_sub.shape[0]
    bt, qt, st = 256, 128, 512
    pad = lambda n, m: (-n) % m
    r = jnp.pad(ref_sub, ((0, pad(B, bt)), (0, pad(S, st))))
    q = jnp.pad(q_sub, ((0, pad(Q, qt)), (0, pad(S, st))))
    mats = pair_counter_mats(r, q, bt=bt, qt=qt, st=st)
    return mats[:B, :Q]


@functools.partial(jax.jit, static_argnames=("bt", "qt", "st", "interpret"))
def _pair_counter_full(ref_codes, q_full, cons_full,
                       bt: int, qt: int, st: int, interpret: bool = False):
    B, S = ref_codes.shape
    Q = q_full.shape[0]
    grid = (B // bt, Q // qt, S // st)
    out_spec = pl.BlockSpec((bt, qt), lambda i, j, k: (i, j))
    aa, mm, vv, cons = pl.pallas_call(
        _kernel_full,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, st), lambda i, j, k: (i, k)),
            pl.BlockSpec((qt, st), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, st), lambda i, j, k: (0, k)),
        ],
        out_specs=(out_spec, out_spec, out_spec,
                   pl.BlockSpec((bt, 8), lambda i, j, k: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, Q), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8), jnp.int32)),
        interpret=interpret,
    )(ref_codes, q_full, cons_full[None, :])
    return aa, mm, vv, cons


def mats_and_cons_via_pallas(ref_codes: jnp.ndarray, q_full: jnp.ndarray,
                             cons_full: jnp.ndarray,
                             interpret: bool = False):
    """Fused full-mode scoring pass: per-query counter matmuls AND the
    five consensus-stage counters in one HBM read of the reference
    codes.  Returns (mats (B, Q, 3), cons5 (B, 5)).  The site width of
    ref_codes, q_full and cons_full must already agree (site_partials
    guarantees this; zero columns count nothing).

    Three synthetic query rows are appended so three consensus
    counters fall out of the main dots (see _kernel_full):
      row Q   — consensus masked to its pure sites: its aa column is
                acgt_c (rc == cons at a pure-consensus site implies rc
                is that same pure base, so the one-hot product hits)
      row Q+1 — code 15 everywhere: its vv column is the per-ref
                valid-site count (15 is nonzero, never pure)
      row Q+2 — the consensus itself: its vv column is valid_c
    Their other counter columns are meaningless and dropped."""
    B, S = ref_codes.shape
    Q = q_full.shape[0]
    pad = lambda n, m: (-n) % m
    cf = cons_full.astype(jnp.int32)
    pure_c = ((cf & (cf - 1)) == 0) & (cf != 0)
    row_x = jnp.where(pure_c, cons_full, 0).astype(q_full.dtype)
    row_y = jnp.full((S,), 15, dtype=q_full.dtype)
    row_z = cons_full.astype(q_full.dtype)
    q_ext = jnp.concatenate(
        [q_full, row_x[None], row_y[None], row_z[None]], axis=0)
    Qe = Q + 3
    # measured on v5e at the bench shape (B=4096, Q=64, S=29952):
    # (512, 64, 1024) = 2.92ms vs (256, 128, 512) = 3.36ms.  For big
    # query packs the reference tile is re-fetched per query tile, so
    # qt should be as wide as VMEM allows: at B=2048/Q=1000,
    # (256, 512, 512) = 7.5ms vs (256, 256, 512) = 47ms.  A
    # query-plane-resident variant (precompute (9, Q, S) int8 planes,
    # single query tile) was built and measured SLOWER end-to-end at
    # Q=1000 (135k vs 144k genomes/s): the plane re-reads per ref tile
    # (~9 GB/step at the VMEM-forced bt=128) cost more than the
    # per-visit query feature rebuild they replaced.
    if Qe <= 72:
        bt, st = 512, 1024
        # floor at 64: 64 and 72 are the hardware-verified lane tiles;
        # tinier non-power-of-two tiles are only exercised in interpret
        # mode, where a Mosaic layout failure would go unseen (padding
        # columns are zero queries and cost ~nothing)
        qt = max(64, -(-Qe // 8) * 8)
    else:
        bt, st = 256, 512
        qt = min(512, -(-Qe // 128) * 128)
    r = jnp.pad(ref_codes, ((0, pad(B, bt)), (0, pad(S, st))))
    q = jnp.pad(q_ext, ((0, pad(Qe, qt)), (0, pad(S, st))))
    c = jnp.pad(cons_full, (0, pad(S, st)))
    aa, mm, vv, cons = _pair_counter_full(
        r, q, c, bt=min(bt, r.shape[0]), qt=min(qt, q.shape[0]),
        st=min(st, r.shape[1]), interpret=interpret)
    cons5 = jnp.stack([aa[:, Q], cons[:, 0], cons[:, 1], vv[:, Q + 2],
                       vv[:, Q + 1]], axis=-1)
    mats = jnp.stack([aa[:, :Q], mm[:, :Q], vv[:, :Q]], axis=-1)
    return mats[:B], cons5[:B]
