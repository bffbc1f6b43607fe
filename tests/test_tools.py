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
