"""JAX scan kernel vs the NumPy oracle on random alignments."""

import numpy as np
import pytest

from uvaia_tpu.core.encoding import DECODE_LUT, encode
from uvaia_tpu.core import oracle
from uvaia_tpu.engine.query import QueryPack
from uvaia_tpu.ops import scan

ALPHABET = np.array([ord(c) for c in "ACGTACGTACGTACGTN-RYMKSWBDHV"],
                    dtype=np.uint8)


def random_alignment(rng, n, L, mut=0.02):
    """Aligned sequences: shared backbone + sprinkled mutations/Ns/ambigs."""
    backbone = ALPHABET[rng.integers(0, 4, size=L)]
    seqs = np.tile(backbone, (n, 1))
    mask = rng.random((n, L)) < mut
    seqs[mask] = ALPHABET[rng.integers(0, len(ALPHABET), size=mask.sum())]
    return seqs


def make_pack(rng, n_query=7, L=600, acgt=False, trim=0):
    qseqs = random_alignment(rng, n_query, L)
    names = [f"q{i}" for i in range(n_query)]
    codes = np.stack([encode(s) for s in qseqs])
    pack = QueryPack(names=names, codes=codes, acgt=acgt, trim=trim)
    pack.create_indices()
    return pack


@pytest.mark.parametrize("acgt", [False, True])
@pytest.mark.parametrize("trim", [0, 13])
def test_scores_match_oracle(acgt, trim):
    rng = np.random.default_rng(7 + trim)
    L = 600
    pack = make_pack(rng, n_query=6, L=L, acgt=acgt, trim=trim)
    refs = random_alignment(rng, 23, L)
    ref_codes = np.stack([encode(r) for r in refs])
    ref_valid = (ref_codes != 0).sum(axis=1)

    ora_scores, _ = oracle.nearest_oracle(
        ref_codes, ref_valid, pack.codes, pack.consensus,
        pack.idx_c, pack.idx_m, pack.idx, k=5, acgt=acgt)

    qd = scan.build_device_data(pack, k=5)
    import jax.numpy as jnp
    jax_scores, _ = scan.score_batch(qd, jnp.asarray(ref_codes))
    np.testing.assert_array_equal(np.asarray(jax_scores), ora_scores)


@pytest.mark.parametrize("acgt", [False, True])
def test_streamed_topk_matches_oracle(acgt):
    """Multiple merge steps over batches == oracle global top-k."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    L = 400
    k = 6
    pack = make_pack(rng, n_query=5, L=L, acgt=acgt)
    refs = random_alignment(rng, 50, L)
    ref_codes = np.stack([encode(r) for r in refs])
    ref_valid = (ref_codes != 0).sum(axis=1)

    ora_scores, ora_topk = oracle.nearest_oracle(
        ref_codes, ref_valid, pack.codes, pack.consensus,
        pack.idx_c, pack.idx_m, pack.idx, k=k, acgt=acgt)

    qd = scan.build_device_data(pack, k=k)
    state = scan.init_state(pack.n_query, k)
    B = 16  # batches of 16, last one padded
    flags_all = []
    for start in range(0, 64, B):
        batch = np.zeros((B, L), dtype=np.uint8)
        n = max(0, min(B, 50 - start))
        ok = np.zeros(B, dtype=bool)
        if n:
            batch[:n] = ref_codes[start:start + n]
            ok[:n] = True
        state, flags = scan.scan_step(qd, state, jnp.asarray(batch),
                                      jnp.asarray(ok), np.int32(start))
        flags_all.append(np.asarray(flags)[:n])

    topk_idx = np.asarray(state[1])
    topk_scores = np.asarray(state[0])
    np.testing.assert_array_equal(topk_idx, ora_topk)
    for q in range(pack.n_query):
        np.testing.assert_array_equal(
            topk_scores[q], ora_scores[ora_topk[q], q, :])
    # every final top-k member must have been flagged for the dump
    flags_all = np.concatenate(flags_all)
    assert all(flags_all[i] for i in np.unique(topk_idx))


def test_decode_roundtrip():
    s = b"ACGTRYSWKMBDHVN-"
    out = DECODE_LUT[encode(s)].tobytes()
    assert out == b"ACGTRYSWKMBDHVNN"


def test_pack_unpack_roundtrip():
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    for L in (10, 11, 256, 29903):
        codes = rng.integers(0, 15, (3, L)).astype(np.uint8)
        packed = scan.pack_codes(codes)
        out = np.asarray(scan.unpack_codes(jnp.asarray(packed), L))
        np.testing.assert_array_equal(out, codes)
