"""End-to-end ball / cluster / legacy engines on synthetic alignments."""

import lzma

import numpy as np
import pytest

from uvaia_tpu.core.encoding import encode
from uvaia_tpu.core.oracle import pair_hamming_indelcheck, pair_mismatch_acgt
from uvaia_tpu.engine.ball import BallConfig, run_ball
from uvaia_tpu.engine.cluster import ClusterConfig, run_cluster
from uvaia_tpu.engine.legacy import LegacyConfig, run_legacy
from uvaia_tpu.io.fasta import read_fasta_all

from test_nearest import random_seqs, write_fasta


def ball_oracle(ref_seqs, query_seqs, dist, acgt):
    """Brute-force radius decision: min over queries of full mismatch."""
    keep = []
    fn = pair_mismatch_acgt if acgt else pair_hamming_indelcheck
    for r in ref_seqs:
        rc = encode(r)
        d = min(fn(encode(q), rc) for q in query_seqs)
        keep.append(d <= dist)
    return keep


@pytest.mark.parametrize("acgt", [False, True])
def test_ball_close_to_bruteforce(tmp_path, monkeypatch, acgt):
    """The staged consensus decomposition equals brute force whenever the
    query set is a single sequence (consensus == query)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(21)
    L = 400
    seqs = random_seqs(rng, 30, L, mut=0.01)
    write_fasta("q.fa", ["q0"], seqs[:1])
    write_fasta("db.fa", [f"r{i}" for i in range(29)], seqs[1:])
    res = run_ball(["db.fa"], "q.fa",
                   BallConfig(distance=4, acgt=acgt, pool=8, output="b"))
    kept = {r.name for r in read_fasta_all("b.aln.xz")}
    expect = ball_oracle(seqs[1:], seqs[:1], 4, acgt)
    expect_names = {f"r{i}" for i, k in enumerate(expect) if k}
    assert kept == expect_names
    assert res["kept"] == len(expect_names)


def staged_ball_oracle(ref_codes, q_codes, idx_c, idx_m, idx, cons, dist,
                       acgt):
    """Direct numpy emulation of seq_ball_against_query_structure
    (fastaseq.c:660-696) called with ball_radius = dist+1 (ball.c:250),
    kept iff final mindist <= dist (ball.c:255) — including the C's
    skipped-stage-3 quirk: with *min_dist == c_dist == d_cons on entry,
    the per-query loop guard `(*min_dist + c_dist) >= ball_radius` never
    fires when 2*d_cons <= dist, keeping the ref unconditionally."""
    fn = pair_mismatch_acgt if acgt else pair_hamming_indelcheck
    keep = []
    for r in ref_codes:
        d_cons = fn(cons, r, idx_c) + fn(cons, r, idx_m)
        if 2 * d_cons <= dist:
            keep.append(True)
            continue
        d_min = min((fn(q, r, idx) for q in q_codes), default=0)
        keep.append(d_cons + d_min <= dist)
    return keep


@pytest.mark.parametrize("acgt", [False, True])
def test_ball_multiquery_staged_semantics(tmp_path, monkeypatch, acgt):
    """Q=4 queries sharing a consensus, refs pinned at every decision
    boundary: d == dist (keep), d == dist+1 (drop), and small-consensus/
    large-polymorphic refs that only the C's stage-3 shortcut keeps."""
    monkeypatch.chdir(tmp_path)
    L, dist = 400, 5
    backbone = np.frombuffer(b"ACGT" * (L // 4), dtype=np.uint8).copy()
    backbone[:30] = ord("A")   # deterministic region for crafted sites

    def with_muts(base, muts):
        s = base.copy()
        for pos, ch in muts:
            s[pos] = ord(ch)
        return s

    # polymorphic sites 0..11: q0,q1 = A (backbone), q2,q3 = C;
    # unique-site conflicts at 20..23 so no query is redundant;
    # q0 has N at 100..109 -> those sites fall in idx_m.
    qs = []
    for i in range(4):
        muts = [(p, "C") for p in range(12)] if i >= 2 else []
        muts += [(20 + i, "CGTC"[i])]   # backbone[:30] is all 'A'
        q = with_muts(backbone, muts)
        if i == 0:
            q[100:110] = ord("N")
        qs.append(q)
    q_names = [f"q{i}" for i in range(4)]
    write_fasta("q.fa", q_names, [q.tobytes().decode() for q in qs])

    # consensus-site mutations (constant & gap-free in queries); mutate to
    # the "next" base so the change is never a no-op
    def cmut(j):
        p = 200 + j
        return (p, "CGTA"["ACGT".index(chr(backbone[p]))])

    mmut = (105, "T")          # inside q0's N block -> idx_m site (base C)
    # NB every query conflicts with the others at its unique site 20+i;
    # refs meant to sit near q0/q2 must match that query's unique base too.
    refs = {
        # d_cons=0, min_q d_idx >= 12 -> only the C shortcut keeps it
        "r_quirk": with_muts(backbone, [(p, "G") for p in range(12)]),
        # d_cons=2 (2*2<=5) + huge polymorphic distance -> shortcut keeps
        "r_short2": with_muts(backbone, [(p, "G") for p in range(12)]
                              + [cmut(0), cmut(1)]),
        # d_cons=3 (2*3>5), poly dist 2 to q0 -> total 5 == dist: keep
        "r_edge_keep": with_muts(backbone, [(0, "G"), (1, "G"), (20, "C")]
                                 + [cmut(j) for j in range(3)]),
        # d_cons=3, poly dist 3 to q0 -> total 6 == dist+1: drop
        "r_edge_drop": with_muts(backbone,
                                 [(0, "G"), (1, "G"), (2, "G"), (20, "C")]
                                 + [cmut(j) for j in range(3)]),
        # d_cons=5 via idx_c(4)+idx_m(1), poly dist 0 to q0 -> 5: keep
        "r_m_keep": with_muts(backbone, [(20, "C"), mmut]
                              + [cmut(j) for j in range(4)]),
        # same +1 more consensus mutation -> 6: drop
        "r_m_drop": with_muts(backbone, [(20, "C"), mmut]
                              + [cmut(j) for j in range(5)]),
        # matches q2 at all poly sites, d_cons=4 -> 2*4>5, poly dist 0: keep
        "r_q2": with_muts(backbone, [(p, "C") for p in range(12)]
                          + [(22, "T")] + [cmut(j) for j in range(4)]),
    }
    names = list(refs)
    write_fasta("db.fa", names, [r.tobytes().decode() for r in refs.values()])

    res = run_ball(["db.fa"], "q.fa",
                   BallConfig(distance=dist, acgt=acgt, pool=4, output="b"))
    kept = {r.name for r in read_fasta_all("b.aln.xz")}

    from uvaia_tpu.engine.query import build_query_pack
    pack = build_query_pack("q.fa", acgt=acgt, always_exclude_redundant=True)
    assert pack.n_query == 4, "crafted queries must all conflict"
    expect = staged_ball_oracle([encode(r) for r in refs.values()],
                                list(pack.codes),
                                pack.idx_c, pack.idx_m, pack.idx,
                                pack.consensus, dist, acgt)
    assert kept == {n for n, k in zip(names, expect) if k}
    # explicit pins for the decision boundaries
    assert {"r_quirk", "r_short2", "r_edge_keep", "r_m_keep", "r_q2"} <= kept
    assert {"r_edge_drop", "r_m_drop"}.isdisjoint(kept)
    assert res["kept"] == len(kept)


def test_cluster_dedup(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(31)
    L = 300
    base = random_seqs(rng, 3, L, mut=0.0)[0]

    def mut(s, positions, char="A"):
        b = bytearray(s.encode())
        for p in positions:
            b[p] = ord(char) if b[p] != ord(char) else ord("C")
        return bytes(b).decode()

    # group A: identical x3 ; group B: 10 SNPs away, x2 (one with Ns)
    ga = [base, base, base]
    gb_seq = mut(base, range(50, 60))
    gb = [gb_seq, gb_seq[:100] + "N" * 10 + gb_seq[110:]]
    names = ["a1", "a2", "a3", "b1", "bN"]
    write_fasta("all.fa", names, ga + gb)
    merged = run_cluster(["all.fa"], ClusterConfig(distance=1, pool=2,
                                                   output="cl"))
    got = {c.name: sorted(c.neighbours) for c in merged}
    assert len(merged) == 2
    assert got["a1"] == ["a2", "a3"]
    assert got["b1"] == ["bN"]

    med = read_fasta_all("cl.aln.xz")
    assert {m.name for m in med} == {"a1", "b1"}
    lines = lzma.open("cl.csv.xz", "rt").read().strip().split("\n")
    assert sorted(lines) == ["a1,a2,a3", "b1,bN"]


def test_legacy_table_and_save(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(41)
    L = 240
    seqs = random_seqs(rng, 8, L, mut=0.02)
    write_fasta("db.fa", [f"r{i}" for i in range(6)], seqs[:6])
    write_fasta("q.fa", ["qq"], [seqs[0]])   # identical to r0
    run_legacy("db.fa", "q.fa",
               LegacyConfig(nbest=2, output="legacy_out"))
    cap = capsys.readouterr()
    lines = [l for l in cap.out.strip().split("\n") if l]
    assert "query sequence" in lines[0]
    rows = [l.split(",") for l in lines[1:]]
    assert all(r[0].strip() == "qq" for r in rows)
    # best hit must be r0 (identical)
    assert rows[0][1].strip() == "r0"
    saved = read_fasta_all("legacy_out.fa.xz")
    assert {s.name for s in saved} >= {"r0"}


def test_legacy_long_alignment_no_uint16_wrap(tmp_path, monkeypatch,
                                              capsys):
    """Alignments with L >= 2^16 (bacterial cores) must not wrap the
    compact score store (round-2 advisor): an identical pair's ACGT
    match count equals L, which exceeds uint16."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(42)
    L = 70_000
    base = "".join(rng.choice(list("ACGT"), L))
    write_fasta("db.fa", ["r0", "r1"], [base, "N" * 50 + base[50:]])
    write_fasta("q.fa", ["qq"], [base])
    run_legacy("db.fa", "q.fa", LegacyConfig(nbest=1))
    cap = capsys.readouterr()
    rows = [l.split(",") for l in cap.out.strip().split("\n")[1:]]
    assert rows[0][1].strip() == "r0"
    # valid_sites and ACGT_matches both = L, un-wrapped
    assert int(float(rows[0][2])) == L
    assert int(float(rows[0][3])) == L


def test_cluster_partial_saves(tmp_path, monkeypatch):
    """Periodic partial membership tables (cluster.c:197-200 parity):
    with save_interval=0 every batch flushes a usable csv."""
    import lzma
    import numpy as np
    from uvaia_tpu.engine.cluster import ClusterConfig, run_cluster

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(2)
    L = 120
    bb = rng.choice(list("ACGT"), L)
    with open("db.fa", "w") as f:
        for i in range(40):
            s = bb.copy()
            for p in rng.integers(0, L, i % 3):
                s[p] = rng.choice(list("ACGT"))
            f.write(f">s{i}\n{''.join(s)}\n")

    # capture the partial table bytes at replace time: a crashed run
    # leaves exactly these bytes at cl.csv.xz, so they MUST be valid xz
    # (round-2 advisor: the temp suffix used to route past the codec)
    import os as _os
    partials = []
    real_replace = _os.replace

    def spy_replace(src, dst):
        if str(dst).endswith("cl.csv.xz"):
            partials.append(open(src, "rb").read())
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", spy_replace)
    run_cluster(["db.fa"], ClusterConfig(distance=2, pool=8, output="cl",
                                         save_interval=0.0))
    # the final table exists and every sequence is accounted for
    rows = lzma.open("cl.csv.xz", "rt").read().strip().split("\n")
    names = [n for r in rows for n in r.split(",")]
    assert sorted(names) == sorted(f"s{i}" for i in range(40))
    # every periodic partial save produced an xz-decodable table
    assert partials
    for blob in partials:
        text = lzma.decompress(blob).decode()
        assert text.startswith("s") and "," in text or "\n" in text


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cluster_properties_randomized(tmp_path, monkeypatch, seed):
    """Property-pin what run_cluster DOES guarantee (fastaseq.c:140-261
    capability; the canopy itself is order-dependent in both C and
    here):

    1. partition: every input sequence appears in exactly one cluster;
    2. linkage soundness: within each cluster, the graph over members
       with edges dist(a, b) <= distance is CONNECTED — every member
       joined a then-medoid or chained to a batch row that remains a
       member, and merges add a <=distance medoid-medoid edge;
    3. medoid resolution: each cluster's medoid has the maximal non-N
       count among its members (add_seq_to_cluster fastaseq.c:182);
    4. determinism: the same input yields the same output.
    """
    import numpy as np
    from uvaia_tpu.core import oracle
    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.cluster import ClusterConfig, run_cluster

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(100 + seed)
    L, N, DIST = 160, 60, 2
    bb = rng.choice(list("ACGTN"), L, p=[0.24, 0.24, 0.24, 0.24, 0.04])
    seqs = {}
    centres = [bb.copy() for _ in range(6)]
    for c in centres:
        for p in rng.integers(0, L, 8):
            c[p] = rng.choice(list("ACGT"))
    for i in range(N):
        s = centres[rng.integers(0, 6)].copy()
        for p in rng.integers(0, L, rng.integers(0, 3)):
            s[p] = rng.choice(list("ACGTN-"))
        if rng.random() < 0.2:          # an N run (low resolution)
            st = int(rng.integers(0, L - 12))
            s[st:st + 12] = "N"
        seqs[f"s{i}"] = "".join(s)
    with open("db.fa", "w") as f:
        for n, s in seqs.items():
            f.write(f">{n}\n{s}\n")

    def run(out):
        return run_cluster(["db.fa"],
                           ClusterConfig(distance=DIST, pool=16,
                                         output=out))

    merged = run("c1")

    # 1. exact partition
    all_names = [n for c in merged for n in [c.name] + c.neighbours]
    assert sorted(all_names) == sorted(seqs)

    # 2. member graph connectivity at <= DIST
    codes = {n: encode(s) for n, s in seqs.items()}
    for c in merged:
        members = [c.name] + c.neighbours
        if len(members) == 1:
            continue
        reach = {members[0]}
        frontier = [members[0]]
        while frontier:
            a = frontier.pop()
            for b in members:
                if b not in reach and oracle.pair_hamming_indelcheck(
                        codes[a], codes[b]) <= DIST:
                    reach.add(b)
                    frontier.append(b)
        assert reach == set(members), \
            f"cluster {c.name} not <= {DIST}-connected"

    # 3. medoid is maximally resolved among members
    for c in merged:
        non_n = {n: int(np.count_nonzero(codes[n])) for n in
                 [c.name] + c.neighbours}
        assert non_n[c.name] == max(non_n.values())

    # 4. determinism
    merged2 = run("c2")
    assert [(c.name, sorted(c.neighbours)) for c in merged] == \
           [(c.name, sorted(c.neighbours)) for c in merged2]


def test_cluster_device_stats_match_host_spec():
    """MedoidIndex.assign's folded device stats (non_n / dist_ref /
    first-SNP positions) must equal the host numpy spec _seq_stats,
    for BOTH upload paths (sparse delta and dense packed fallback) —
    the engine uses the device fold, the spec stays as this oracle."""
    import numpy as np
    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.cluster import MedoidIndex, _seq_stats

    rng = np.random.default_rng(7)
    L, B, trim, n_snps = 96, 12, 10, 3
    ref = encode(bytes(rng.choice(list(b"ACGTN"), L).astype(np.uint8)))
    window = np.zeros(L, bool)
    window[trim:L - trim] = True

    # sparse batch (delta upload path): few SNPs off the base
    sparse = np.tile(ref, (B, 1))
    for b in range(B):
        for p in rng.integers(0, L, rng.integers(0, 6)):
            sparse[b, p] = rng.integers(0, 16)
    # dense batch (packed fallback path): arbitrary 4-bit codes
    # including N(0) and ambiguity masks
    dense = rng.integers(0, 16, (B, L)).astype(np.uint8)

    ok = np.ones(B, bool)
    for codes in (sparse.astype(np.uint8), dense):
        idx = MedoidIndex(L, 1 << 10, trim, initial_tier=16,
                          delta_base=ref, stats_ref=ref, n_snps=n_snps)
        idx.append(codes[:2])
        _, _, non_n, dist_ref, snp, codes_d = idx.assign(codes, ok, 2)
        e_non, e_dist, e_snp = _seq_stats(codes, ref, window, n_snps)
        np.testing.assert_array_equal(non_n, e_non)
        np.testing.assert_array_equal(dist_ref, e_dist)
        assert [tuple(int(p) for p in r) for r in snp] == e_snp
        # the returned device codes are the exact batch (medoid
        # append/replace gathers rows from them)
        np.testing.assert_array_equal(np.asarray(codes_d), codes)

    # store-payload path: a pre-encoded delta payload against a base
    # DIFFERENT from the index's own delta base must reconstruct and
    # produce identical outputs to the host-codes path
    import jax.numpy as jnp
    from uvaia_tpu.ops import scan as scan_ops
    store_base = sparse[0].astype(np.uint8)        # != ref
    enc = scan_ops.delta_encode(sparse.astype(np.uint8), ok, store_base)
    assert enc is not None
    idx = MedoidIndex(L, 1 << 10, trim, initial_tier=16,
                      delta_base=ref, stats_ref=ref, n_snps=n_snps)
    idx.append(sparse[:2].astype(np.uint8))
    want = idx.assign(sparse.astype(np.uint8), ok, 2)
    idx2 = MedoidIndex(L, 1 << 10, trim, initial_tier=16,
                       delta_base=ref, stats_ref=ref, n_snps=n_snps)
    idx2.append(sparse[:2].astype(np.uint8))
    got = idx2.assign(None, ok, 2,
                      payload=("delta", enc[0], enc[1]),
                      base_d=jnp.asarray(store_base))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # packed payload kind too
    got_pk = idx2.assign(None, ok, 2,
                         payload=("packed",
                                  scan_ops.pack_codes(
                                      sparse.astype(np.uint8))),
                         base_d=None)
    for w, g in zip(want, got_pk):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
