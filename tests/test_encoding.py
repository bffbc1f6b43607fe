"""Encoding + oracle semantics vs the reference's documented contract.

The worked examples come from the reference README.md:307-330; the
predicate semantics from src/utils.c:255-295.
"""

import numpy as np

from uvaia_tpu.core import encoding as enc
from uvaia_tpu.core.oracle import (pair_counters, pair_counters_acgt,
                                   pair_hamming_indelcheck, partial_weight)


def test_basic_codes():
    codes = enc.encode("ACGTN-RYMKU")
    assert list(codes[:4]) == [1, 2, 4, 8]
    assert codes[4] == 0 and codes[5] == 0        # N and gap invalid
    assert codes[6] == 5 and codes[7] == 10       # R=A|G, Y=C|T
    assert codes[8] == 3 and codes[9] == 12       # M=A|C, K=G|T
    assert codes[10] == 8                         # U -> T


def test_lowercase_and_indel_set():
    assert np.array_equal(enc.encode("acgt"), enc.encode("ACGT"))
    for ch in "NnXx-?Oo.":
        assert enc.encode(ch)[0] == 0


def test_counts():
    codes = enc.encode("ACGT-NMRV")
    assert enc.count_valid(codes) == 7
    assert enc.count_acgt(codes) == 4


def test_readme_worked_example():
    """README.md:307-316: three sequences, all pairwise counters."""
    s1 = enc.encode("AACGTTA--")
    s2 = enc.encode("AACG-TAM-")
    s3 = enc.encode("MNCGTTMC-")

    assert enc.count_valid(s1) == 7
    assert enc.count_valid(s2) == 7
    assert enc.count_valid(s3) == 7

    a, t, p, v = pair_counters(s1, s2)
    assert (a, p, v) == (6, 6, 6)
    a, t, p, v = pair_counters(s1, s3)
    assert (a, p, v) == (4, 6, 6)
    assert t == 4   # M vs A is not a text match
    a, t, p, v = pair_counters(s2, s3)
    assert (a, p, v) == (3, 6, 6)


def test_readme_K_incompatibility():
    """README.md:328-330: K={G,T} mismatches A and M={A,C}."""
    k = enc.encode("K")[0]
    a = enc.encode("A")[0]
    m = enc.encode("M")[0]
    assert (k & a) == 0 and (k & m) == 0          # partial mismatch
    assert (m & a) != 0                           # M-A partial match


def test_text_match_of_equal_ambiguity_codes():
    a, t, p, v = pair_counters(enc.encode("MMM"), enc.encode("MAC"))
    assert v == 3 and p == 3        # all intersect
    assert t == 1                   # only M-M text-matches
    assert a == 0                   # no pure-base match


def test_acgt_mode_counters():
    mm, valid = pair_counters_acgt(enc.encode("ACGTMN-"), enc.encode("AGGTAC-"))
    # pairs: AA CG GG TT MA NC -- ; both-acgt: AA CG GG TT (M,N,- excluded)
    assert valid == 4
    assert mm == 1                  # C vs G


def test_hamming_indelcheck():
    d = pair_hamming_indelcheck(enc.encode("ACGT-N"), enc.encode("AGGTAC"))
    assert d == 1                   # C/G only; gaps and N skipped


def test_partial_weight():
    t = enc.encode("T")[0]
    w = enc.encode("W")[0]
    assert partial_weight(t, w) == 0.5            # utils.c:73 comment
    assert partial_weight(t, t) == 1.0
    assert partial_weight(0, t) == 0.0


def test_acgt_six_scores_handcrafted():
    """Pins the --acgt dist column split (nearest.c:443-477): score[4]
    covers idx_c + idx_m mismatches, score[5] the polymorphic idx only."""
    from uvaia_tpu.core.oracle import six_scores_acgt

    #            0    1    2    3
    # consensus  A    C    G    (T)
    cons = np.array([1, 2, 4, 8], dtype=np.uint8)
    query = np.array([1, 2, 4, 8], dtype=np.uint8)
    # ref mismatches at site 0 (idx_c), site 1 (idx_m), site 3 (idx)
    ref = np.array([2, 4, 4, 1], dtype=np.uint8)
    idx_c = np.array([0])
    idx_m = np.array([1, 2])
    idx_p = np.array([3])
    s = six_scores_acgt(ref, query, cons, idx_c, idx_m, idx_p,
                        ref_valid_sites=4)
    # matches: only site 2; valid acgt pairs: all 4
    assert s[0] == 1 and s[1] == 4
    assert s[4] == 2     # dist_consensus = mm(idx_c) + mm(idx_m) = 1+1
    assert s[5] == 1     # dist_unique = mm(idx) = 1
