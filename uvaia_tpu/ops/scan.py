"""TPU scan kernels: dense match-count scoring + exact top-k merge.

The reference computes per-(ref,query) match counters with branchy
early-exit scalar loops (fastaseq.c:522-596, biomcmc-lib kernels) and a
per-query binary min-heap (min_heap.c).  Here the same *exact* scores
come out of dense MXU matmuls over per-site feature vectors, and the
top-k state is maintained with a multi-key `lax.sort` merge:

* per-site features (int8): pure-base one-hot ``a`` (4), base-mask bits
  ``m`` (4), valid ``v`` (1), pure ``p`` (1)
* ``acgt_matches  = a_q . a_r``                      (exact)
* ``valid_pairs   = v_q . v_r``                      (exact)
* ``text_matches  = a_q . a_r + corr_t``             (corr at rare
  both-ambiguous sites: equal ambiguity codes)
* ``partial       = m_q . m_r + corr_p``             (corr subtracts the
  overcount when two ambiguity codes share >=2 bases)

The consensus stage (constant gap-free sites, idx_c) is a single
elementwise pass per reference — exactly the reference's
``queue_distance_to_consensus`` factorisation (nearest.c:428-433).

Ranking keys: the six int scores are packed into three int32 keys
(s0<<15|s1, s2<<15|s3, s4<<15|s5) when the alignment length fits 15
bits, else six separate keys; `lax.sort` with the database index as the
final key reproduces the C heap's first-seen-wins tie behaviour
(min_heap.c:93-117).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.encoding import IS_AMBIG, IS_PURE, POPCOUNT4
from ..engine.query import QueryPack

INT32_MIN = np.int32(-2**31)
IDX_SENTINEL = np.int32(2**31 - 1)


def _pad_to(x: np.ndarray, mult: int, axis: int = 0, value=0) -> np.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value)


@dataclass
class QueryDeviceData:
    """Device-resident, static per-run query data."""

    acgt: bool
    n_query: int
    n_sites: int
    k: int
    pack_keys: bool            # six scores fit 3 packed int32 keys
    idx_c: jnp.ndarray         # (Lc,) int32 (padded, pad -> cons 0)
    cons_c: jnp.ndarray        # (Lc,) uint8 consensus codes at idx_c
    idx_mq: jnp.ndarray        # (S,) int32 (padded)
    q_sub: jnp.ndarray         # (Q, S) uint8 query codes at idx_mq
    amb_pos: jnp.ndarray | None  # (A,) int32 positions within S
    w_part: jnp.ndarray | None   # (Q, A, 16) int8 partial-match correction
    w_text: jnp.ndarray | None   # (Q, A, 16) int8 text-match correction


def build_device_data(pack: QueryPack, k: int) -> QueryDeviceData:
    idx_mq = pack.idx_mq.astype(np.int32)
    q_sub = pack.codes[:, idx_mq]
    idx_mq_p = _pad_to(idx_mq, 128)
    q_sub_p = _pad_to(q_sub, 128, axis=1)

    idx_c = pack.idx_c.astype(np.int32)
    cons_c = pack.consensus[idx_c]
    idx_c_p = _pad_to(idx_c, 128)
    cons_c_p = _pad_to(cons_c, 128)

    amb_pos = w_part = w_text = None
    if not pack.acgt:
        amb_cols = np.nonzero((IS_AMBIG[q_sub_p] != 0).any(axis=0))[0]
        if len(amb_cols):
            amb_cols = _pad_to(amb_cols.astype(np.int32), 8)
            cq = q_sub_p[:, amb_cols]                      # (Q, A)
            codes16 = np.arange(16, dtype=np.uint8)
            inter = cq[..., None] & codes16                # (Q, A, 16)
            cnt = POPCOUNT4[inter].astype(np.int8)
            w_part = ((cnt > 0).astype(np.int8) - cnt)     # <= 0
            eq_amb = ((cq[..., None] == codes16)
                      & (IS_AMBIG[cq][..., None] != 0))
            w_text = eq_amb.astype(np.int8)
            amb_pos = amb_cols

    return QueryDeviceData(
        acgt=pack.acgt,
        n_query=pack.n_query,
        n_sites=pack.n_sites,
        k=k,
        pack_keys=pack.n_sites < 2**15,
        idx_c=jnp.asarray(idx_c_p),
        cons_c=jnp.asarray(cons_c_p),
        idx_mq=jnp.asarray(idx_mq_p),
        q_sub=jnp.asarray(q_sub_p),
        amb_pos=None if amb_pos is None else jnp.asarray(amb_pos),
        w_part=None if w_part is None else jnp.asarray(w_part),
        w_text=None if w_text is None else jnp.asarray(w_text),
    )


# ----------------------------------------------------------------------
# feature extraction (VPU elementwise, from uint8 codes)

def _bits(codes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) int8 base-mask bits."""
    c = codes.astype(jnp.int32)
    return jnp.stack([(c >> i) & 1 for i in range(4)], axis=-1).astype(jnp.int8)


def _pure(codes: jnp.ndarray) -> jnp.ndarray:
    c = codes.astype(jnp.int32)
    pop = ((c >> 0) & 1) + ((c >> 1) & 1) + ((c >> 2) & 1) + ((c >> 3) & 1)
    return (pop == 1).astype(jnp.int8)


def _imm(a, b):
    """int8 x int8 -> int32 contraction over the last axes flattened."""
    a2 = a.reshape(a.shape[0], -1)
    b2 = b.reshape(b.shape[0], -1)
    return jax.lax.dot_general(
        a2, b2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


# ----------------------------------------------------------------------
# scoring

def score_batch(qd: QueryDeviceData, ref_codes: jnp.ndarray) -> tuple:
    """(B, Q, 6) int32 six-score tensor + per-ref valid-site counts."""
    valid_sites = jnp.sum((ref_codes != 0).astype(jnp.int32), axis=1)

    rc = jnp.take(ref_codes, qd.idx_c, axis=1)        # (B, Lc)
    cons = qd.cons_c[None, :]
    rs = jnp.take(ref_codes, qd.idx_mq, axis=1)       # (B, S)

    if qd.acgt:
        # consensus stage: acgt mismatches / valid acgt pairs
        both = (_pure(rc) & _pure(cons)).astype(jnp.int32)
        mm_c = jnp.sum(both * (rc != cons), axis=1)
        va_c = jnp.sum(both, axis=1)

        p_r = _pure(rs)                               # (B, S)
        a_r = _bits(rs) * p_r[..., None]              # (B, S, 4)
        p_q = _pure(qd.q_sub)
        a_q = _bits(qd.q_sub) * p_q[..., None]
        s_pp = _imm(p_r, p_q)                         # valid acgt pairs
        s_aa = _imm(a_r, a_q)                         # acgt matches
        mm_m = s_pp - s_aa
        s0 = (va_c - mm_c)[:, None] + s_aa            # ACGT_matches
        s1 = va_c[:, None] + s_pp                     # valid_ACGT_comparisons
        s2 = s_aa                                     # ACGT_matches_unique
        s3 = jnp.broadcast_to(valid_sites[:, None], s2.shape)
        s4 = jnp.broadcast_to(mm_c[:, None], s2.shape)   # dist_consensus
        s5 = mm_m                                     # dist_unique
    else:
        v_rc = (rc != 0) & (cons != 0)
        eq_c = (rc == cons) & v_rc
        pure_cons = _pure(cons) != 0
        acgt_c = jnp.sum((eq_c & pure_cons).astype(jnp.int32), axis=1)
        text_c = jnp.sum(eq_c.astype(jnp.int32), axis=1)
        part_c = jnp.sum(((rc & cons) != 0).astype(jnp.int32), axis=1)
        valid_c = jnp.sum(v_rc.astype(jnp.int32), axis=1)

        p_r = _pure(rs)
        a_r = _bits(rs) * p_r[..., None]
        m_r = _bits(rs)
        v_r = (rs != 0).astype(jnp.int8)
        p_q = _pure(qd.q_sub)
        a_q = _bits(qd.q_sub) * p_q[..., None]
        m_q = _bits(qd.q_sub)
        v_q = (qd.q_sub != 0).astype(jnp.int8)

        s_aa = _imm(a_r, a_q)
        s_mm = _imm(m_r, m_q)
        s_vv = _imm(v_r, v_q)

        corr_t = corr_p = 0
        if qd.amb_pos is not None:
            ra = jnp.take(rs, qd.amb_pos, axis=1)     # (B, A)
            oh = (ra[..., None] == jnp.arange(16, dtype=ra.dtype)
                  ).astype(jnp.int8)                  # (B, A, 16)
            corr_t = _imm(oh, qd.w_text)
            corr_p = _imm(oh, qd.w_part)

        s0 = acgt_c[:, None] + s_aa
        s1 = text_c[:, None] + s_aa + corr_t
        s2 = part_c[:, None] + s_mm + corr_p
        s3 = valid_c[:, None] + s_vv
        s4 = s_aa
        s5 = jnp.broadcast_to(valid_sites[:, None], s_aa.shape)

    scores = jnp.stack([s0, s1, s2, s3, s4, s5], axis=-1)  # (B, Q, 6)
    return scores, valid_sites


# ----------------------------------------------------------------------
# top-k state + merge

def _pack3(scores: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3) packed keys. Requires each score < 2**15."""
    s = scores.astype(jnp.int32)
    return jnp.stack([
        s[..., 0] * 32768 + s[..., 1],
        s[..., 2] * 32768 + s[..., 3],
        s[..., 4] * 32768 + s[..., 5],
    ], axis=-1)


def _keys(qd: QueryDeviceData, scores: jnp.ndarray) -> jnp.ndarray:
    return _pack3(scores) if qd.pack_keys else scores.astype(jnp.int32)


def init_state(n_query: int, k: int):
    """(scores, idx): sentinel-filled running top-k state."""
    return (jnp.full((n_query, k, 6), -1, dtype=jnp.int32),
            jnp.full((n_query, k), IDX_SENTINEL, dtype=jnp.int32))


def _lex_gt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a > b over the trailing key axis."""
    nk = a.shape[-1]
    out = a[..., nk - 1] > b[..., nk - 1]
    for i in range(nk - 2, -1, -1):
        out = (a[..., i] > b[..., i]) | ((a[..., i] == b[..., i]) & out)
    return out


def merge_topk(qd: QueryDeviceData, state, scores, ok, base_idx):
    """Merge a scored batch into the running per-query top-k.

    state  — (scores (Q,k,6), idx (Q,k))
    scores — (B, Q, 6) int32 batch scores
    ok     — (B,) bool valid-row mask (padding/QC rejects False)
    base_idx — scalar int32 global index of batch row 0
    Returns (new_state, is_best (B,) bool).
    """
    st_scores, st_idx = state
    k = qd.k
    B = scores.shape[0]

    cand_keys = _keys(qd, scores)                     # (B, Q, nk)
    cand_keys = jnp.where(ok[:, None, None], cand_keys, INT32_MIN)
    thr = _keys(qd, st_scores[:, k - 1, :])           # (Q, nk)
    is_best = jnp.any(_lex_gt(cand_keys, thr[None, :, :]), axis=1) & ok

    batch_idx = base_idx + jnp.arange(B, dtype=jnp.int32)
    batch_idx = jnp.where(ok, batch_idx, IDX_SENTINEL)

    all_scores = jnp.concatenate(
        [st_scores, jnp.transpose(scores, (1, 0, 2))], axis=1)  # (Q, k+B, 6)
    all_idx = jnp.concatenate(
        [st_idx, jnp.broadcast_to(batch_idx[None, :], (qd.n_query, B))],
        axis=1)
    # negate for descending sort; sentinel rows forced to the very end
    # (note: -INT32_MIN overflows, so mask AFTER negation)
    neg_keys = -_keys(qd, all_scores)
    neg_keys = jnp.where(all_idx[..., None] == IDX_SENTINEL,
                         jnp.int32(2**31 - 1), neg_keys)
    nk = neg_keys.shape[-1]
    operands = tuple(neg_keys[..., i] for i in range(nk)) + (all_idx,) + \
        tuple(all_scores[..., i] for i in range(6))
    sorted_ops = jax.lax.sort(operands, dimension=1, num_keys=nk + 1)
    new_idx = sorted_ops[nk][:, :k]
    new_scores = jnp.stack([o[:, :k] for o in sorted_ops[nk + 1:]], axis=-1)
    return (new_scores, new_idx), is_best


# ----------------------------------------------------------------------
# full jitted step

@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def scan_step(qd: QueryDeviceData, state, ref_codes, ok, base_idx):
    """One database batch: score + merge. Returns (state, is_best)."""
    scores, _ = score_batch(qd, ref_codes)
    return merge_topk(qd, state, scores, ok, base_idx)


# QueryDeviceData must be hashable for static_argnums: use identity.
QueryDeviceData.__hash__ = lambda self: id(self)
QueryDeviceData.__eq__ = lambda self, other: self is other
