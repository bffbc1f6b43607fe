"""Pallas fused counter kernel == XLA feature-matmul path (interpret
mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

from uvaia_tpu.core.encoding import encode
from uvaia_tpu.ops import pallas_score, scan

from test_scan import random_alignment


def test_pallas_counters_match_xla():
    import jax.numpy as jnp
    rng = np.random.default_rng(12)
    B, Q, S = 64, 16, 512
    refs = np.stack([encode(s) for s in random_alignment(rng, B, S, 0.1)])
    qs = np.stack([encode(s) for s in random_alignment(rng, Q, S, 0.1)])

    out = np.asarray(pallas_score.pair_counter_mats(
        jnp.asarray(refs), jnp.asarray(qs), bt=32, qt=8, st=128,
        interpret=True))

    a_r = scan._bits(jnp.asarray(refs)) * scan._pure(
        jnp.asarray(refs))[..., None]
    a_q = scan._bits(jnp.asarray(qs)) * scan._pure(jnp.asarray(qs))[..., None]
    m_r, m_q = scan._bits(jnp.asarray(refs)), scan._bits(jnp.asarray(qs))
    v_r = (jnp.asarray(refs) != 0).astype(jnp.int8)
    v_q = (jnp.asarray(qs) != 0).astype(jnp.int8)
    exp = np.stack([np.asarray(scan._imm(a_r, a_q)),
                    np.asarray(scan._imm(m_r, m_q)),
                    np.asarray(scan._imm(v_r, v_q))], axis=-1)
    np.testing.assert_array_equal(out, exp)


def test_pallas_tile_divisibility_error():
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="not divisible"):
        pallas_score.pair_counter_mats(
            jnp.zeros((10, 128), jnp.uint8), jnp.zeros((4, 128), jnp.uint8),
            bt=8, qt=4, st=128, interpret=True)


def test_pallas_delta_reconstruction_matches_encode():
    """MXU one-hot reconstruction (interpret mode) inverts delta_encode,
    including sentinel padding and masked (empty) rows."""
    import jax.numpy as jnp
    from uvaia_tpu.ops import pallas_recon, scan

    rng = np.random.default_rng(9)
    B, L = 16, 700
    base = rng.integers(0, 16, L).astype(np.uint8)
    codes = np.tile(base, (B, 1))
    mut = rng.random((B, L)) < 0.06
    codes[mut] = rng.integers(0, 16, mut.sum()).astype(np.uint8)
    ok = np.ones(B, bool)
    ok[3] = False
    pos, val = scan.delta_encode(codes, ok, base)
    rec = np.asarray(pallas_recon.reconstruct_image(
        jnp.asarray(pos), jnp.asarray(val), jnp.asarray(base), L,
        interpret=True))
    np.testing.assert_array_equal(rec[ok], codes[ok])
    # masked rows rebuild as the base (their scores are masked downstream)
    np.testing.assert_array_equal(rec[3], base)


@pytest.mark.parametrize("Q", [6, 100])   # small-Q vs wide-query-tile
def test_pallas_fused_cons_matches_xla(Q):
    """Fused mats+consensus kernels == the XLA site_partials path
    (Q=6 covers the small-pack tile; Q=100 covers the wide-qt tiled
    kernel used above 64 queries)."""
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import pallas_score, scan
    from test_scan import random_alignment

    rng = np.random.default_rng(12)
    L, B = 700, 24
    qseqs = random_alignment(rng, Q, L)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=np.stack([encode(s) for s in qseqs]),
                     acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=3)
    refs = random_alignment(rng, B, L)
    ref_codes = np.stack([encode(r) for r in refs])
    rc = np.asarray(scan._to_width(jnp.asarray(ref_codes),
                                   int(qd.q_full.shape[1])))

    # XLA reference partials (pallas off on CPU by default)
    cons5_x, mats_x = scan.site_partials(False, qd.cons_full, qd.q_full,
                                         jnp.asarray(rc))
    mats_p, cons5_p = pallas_score.mats_and_cons_via_pallas(
        jnp.asarray(rc), qd.q_full, qd.cons_full, interpret=True)
    np.testing.assert_array_equal(np.asarray(mats_x), np.asarray(mats_p))
    np.testing.assert_array_equal(np.asarray(cons5_x), np.asarray(cons5_p))


def test_pallas_fused_acgt_matches_xla():
    """Fused --acgt kernel == the XLA site_partials path."""
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import pallas_score, scan
    from test_scan import random_alignment

    rng = np.random.default_rng(13)
    L, Q, B = 700, 6, 24
    qseqs = random_alignment(rng, Q, L)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=np.stack([encode(s) for s in qseqs]),
                     acgt=True, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=3)
    refs = random_alignment(rng, B, L)
    ref_codes = np.stack([encode(r) for r in refs])
    rc = np.asarray(scan._to_width(jnp.asarray(ref_codes),
                                   int(qd.q_full.shape[1])))

    cons5_x, mats_x = scan.site_partials(True, qd.cons_full, qd.q_full,
                                         jnp.asarray(rc), qd.q_poly)
    mats_p, cons5_p = pallas_score.mats_and_cons_acgt_via_pallas(
        jnp.asarray(rc), qd.q_full, qd.q_poly, qd.cons_full,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(mats_x), np.asarray(mats_p))
    np.testing.assert_array_equal(np.asarray(cons5_x), np.asarray(cons5_p))


def test_pallas_corr_matches_weight_tables():
    """Fused ambiguity-correction kernel == the (B, A, 16) one-hot /
    weight-table path, on codes dense in ambiguity characters."""
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import IS_AMBIG, POPCOUNT4

    rng = np.random.default_rng(13)
    B, Q, A = 48, 12, 200
    # heavy ambiguity mix incl. zeros, pure bases, and 15 (no input
    # character encodes to 15 today, but the exactness pin covers ALL
    # code matrices: the kernel once dropped 15-vs-15 text matches)
    codes = np.array([0, 1, 2, 4, 8, 3, 5, 6, 7, 9, 10, 11, 12, 13, 14,
                      15], dtype=np.uint8)
    ra = codes[rng.integers(0, len(codes), (B, A))]
    qa = codes[rng.integers(0, len(codes), (Q, A))]

    got_t, got_p = pallas_score.corr_via_pallas(
        jnp.asarray(ra), jnp.asarray(qa), interpret=True)

    # oracle: per-site definitions
    exp_t = np.zeros((B, Q), np.int32)
    exp_p = np.zeros((B, Q), np.int32)
    for b in range(B):
        for q in range(Q):
            r, s = ra[b], qa[q]
            both = (IS_AMBIG[r] != 0) & (IS_AMBIG[s] != 0)
            exp_t[b, q] = int((both & (r == s)).sum())
            inter = r & s
            pc = POPCOUNT4[inter].astype(np.int32)
            exp_p[b, q] = int((both * ((inter != 0).astype(np.int32) - pc))
                              .sum())
    np.testing.assert_array_equal(np.asarray(got_t), exp_t)
    np.testing.assert_array_equal(np.asarray(got_p), exp_p)


@pytest.mark.parametrize("Q", [6, 100])
def test_pallas_packed_fused_matches_xla(Q):
    """Packed-input fused kernel (VMEM nibble unpack, de-interleaved
    query operands) == the XLA site_partials path on the same rows,
    including the nibble-gathered ambiguity corrections."""
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import pallas_score, scan
    from test_scan import random_alignment

    rng = np.random.default_rng(21)
    L, B = 700, 24
    qseqs = random_alignment(rng, Q, L)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=np.stack([encode(s) for s in qseqs]),
                     acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=3)
    refs = random_alignment(rng, B, L)
    ref_codes = np.stack([encode(r) for r in refs])
    W = int(qd.q_full.shape[1])
    rc = np.asarray(scan._to_width(jnp.asarray(ref_codes), W))
    packed = jnp.asarray(scan.pack_codes(ref_codes))

    cons5_x, mats_x = scan.site_partials(False, qd.cons_full, qd.q_full,
                                         jnp.asarray(rc))
    mats_p, cons5_p = pallas_score.mats_and_cons_via_pallas_packed(
        packed, qd.q_full, qd.cons_full, interpret=True)
    np.testing.assert_array_equal(np.asarray(mats_x), np.asarray(mats_p))
    np.testing.assert_array_equal(np.asarray(cons5_x), np.asarray(cons5_p))

    # nibble gather == take on the unpacked matrix (amb corrections)
    if qd.amb_sites is not None:
        want = np.asarray(jnp.take(jnp.asarray(rc), qd.amb_sites, axis=1,
                                   mode="fill", fill_value=0))
        got = np.asarray(scan.gather_packed_nibbles(packed, qd.amb_sites))
        np.testing.assert_array_equal(got, want)

    # full planes: packed pipeline (pallas forced via interpret pieces)
    # vs the unpacked scoring — exercised end-to-end on TPU; here we
    # pin the pure-jnp fallback path stays bit-identical
    planes_u, _ = scan.score_batch_planes(qd, jnp.asarray(ref_codes))
    planes_f, _ = scan.score_batch_planes_packed(qd, packed)
    for a, b in zip(planes_u, planes_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_packed_acgt_matches_xla():
    """Packed-input --acgt kernels (VMEM nibble unpack, de-interleaved
    query/poly/consensus operands) == the XLA site_partials path."""
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import pallas_score, scan
    from test_scan import random_alignment

    rng = np.random.default_rng(29)
    L, Q, B = 700, 6, 24
    qseqs = random_alignment(rng, Q, L)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=np.stack([encode(s) for s in qseqs]),
                     acgt=True, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=3)
    refs = random_alignment(rng, B, L)
    ref_codes = np.stack([encode(r) for r in refs])
    W = int(qd.q_full.shape[1])
    rc = np.asarray(scan._to_width(jnp.asarray(ref_codes), W))
    packed = jnp.asarray(scan.pack_codes(ref_codes))

    cons5_x, mats_x = scan.site_partials(True, qd.cons_full, qd.q_full,
                                         jnp.asarray(rc), qd.q_poly)
    mats_p, cons5_p = pallas_score.mats_and_cons_acgt_via_pallas_packed(
        packed, qd.q_full, qd.q_poly, qd.cons_full, interpret=True)
    np.testing.assert_array_equal(np.asarray(mats_x), np.asarray(mats_p))
    np.testing.assert_array_equal(np.asarray(cons5_x), np.asarray(cons5_p))

    # full planes through the packed acgt dispatch (CPU falls back to
    # unpack-then-score; pinned bit-identical to the unpacked scoring)
    planes_u, _ = scan.score_batch_planes(qd, jnp.asarray(ref_codes))
    planes_f, _ = scan.score_batch_planes_packed(qd, packed)
    for a, b in zip(planes_u, planes_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
