"""ops/distance kernels vs the NumPy oracle."""

import numpy as np
import pytest

from uvaia_tpu.core.encoding import encode
from uvaia_tpu.core import oracle
from uvaia_tpu.ops import distance as dist_ops

from test_scan import random_alignment


@pytest.mark.parametrize("acgt", [False, True])
def test_pair_mismatches(acgt):
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    refs = np.stack([encode(s) for s in random_alignment(rng, 12, 200, 0.1)])
    qs = np.stack([encode(s) for s in random_alignment(rng, 5, 200, 0.1)])
    w = dist_ops.mismatch_weights(qs, acgt)
    got = np.asarray(dist_ops.pair_mismatches(jnp.asarray(refs),
                                              jnp.asarray(w)))
    fn = oracle.pair_mismatch_acgt if acgt else oracle.pair_hamming_indelcheck
    for b in range(refs.shape[0]):
        for q in range(qs.shape[0]):
            assert got[b, q] == fn(qs[q], refs[b])


@pytest.mark.parametrize("acgt", [False, True])
def test_cons_mismatches(acgt):
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    refs = np.stack([encode(s) for s in random_alignment(rng, 9, 300, 0.08)])
    cons = encode(random_alignment(rng, 1, 300, 0.08)[0])
    sites = np.arange(300, dtype=np.int32)
    got = np.asarray(dist_ops.cons_mismatches(
        jnp.asarray(refs), jnp.asarray(sites), jnp.asarray(cons), acgt))
    fn = oracle.pair_mismatch_acgt if acgt else oracle.pair_hamming_indelcheck
    for b in range(9):
        assert got[b] == fn(cons, refs[b])


def test_legacy_scores_vs_oracle():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    refs = np.stack([encode(s) for s in random_alignment(rng, 7, 250, 0.1)])
    qs = np.stack([encode(s) for s in random_alignment(rng, 3, 250, 0.1)])
    qdata = dist_ops.build_legacy_query_data(qs, trim=0)
    got = np.asarray(dist_ops.legacy_scores(qdata, jnp.asarray(refs)))
    for b in range(7):
        for q in range(3):
            a, t, p, v = oracle.pair_counters(qs[q], refs[b])
            w = sum(oracle.partial_weight(int(c1), int(c2))
                    for c1, c2 in zip(qs[q], refs[b]))
            assert got[b, q, 0] == a
            assert got[b, q, 1] == t
            np.testing.assert_allclose(got[b, q, 2], w, atol=1e-3)
            assert got[b, q, 3] == v


def test_legacy_scores_trim():
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    refs = np.stack([encode(s) for s in random_alignment(rng, 4, 100, 0.1)])
    qs = np.stack([encode(s) for s in random_alignment(rng, 2, 100, 0.1)])
    t = 20
    qdata = dist_ops.build_legacy_query_data(qs, trim=t)
    got = np.asarray(dist_ops.legacy_scores(qdata, jnp.asarray(refs)))
    for b in range(4):
        for q in range(2):
            a, _, _, v = oracle.pair_counters(qs[q][t:-t], refs[b][t:-t])
            assert got[b, q, 0] == a
            assert got[b, q, 3] == v
