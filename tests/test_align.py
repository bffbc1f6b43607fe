"""End-to-end align engine: unaligned FASTA -> ref-projected alignment."""

import lzma

import numpy as np

from uvaia_tpu.engine.align import AlignConfig, run_align
from uvaia_tpu.io.fasta import read_fasta_all

from test_gotoh import rand_dna


def test_run_align_end_to_end(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(9)
    n = 300
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">wuhan\n{ref.decode()}\n")

    # queries: identical; SNPs; deletion; insertion; too-short (rejected);
    # too-ambiguous (rejected)
    q_snp = bytearray(ref)
    q_snp[10] = ord("A") if ref[10] != ord("A") else ord("C")
    q_del = ref[:50] + ref[58:]
    q_ins = ref[:100] + b"ACGTAC" + ref[100:]
    qs = {
        "ident": bytes(ref),
        "snp": bytes(q_snp),
        "del8": q_del,
        "ins6": q_ins,
        "short": ref[:100],
        "ambig": b"N" * n,
    }
    with open("q.fa", "w") as f:
        for k, v in qs.items():
            f.write(f">{k}\n{v.decode()}\n")

    cfg = AlignConfig(pool=4, output="al_out")
    stats = run_align("ref.fa", ["q.fa"], cfg)
    assert stats.count == 6
    assert stats.n_output == 4
    assert stats.rejected_length == 1
    assert stats.rejected_ambiguity == 1

    out = {r.name: r.seq for r in read_fasta_all("al_out.aln.xz")}
    assert set(out) == {"ident", "snp", "del8", "ins6"}
    for name, seq in out.items():
        assert len(seq) == n
    assert out["ident"] == ref
    assert out["snp"] == bytes(q_snp)
    assert out["del8"].count(b"-") == 8
    # insertion dropped: projected equals ref exactly
    assert out["ins6"] == ref


def test_align_stdout(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(2)
    ref = rand_dna(rng, 200)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    with open("q.fa", "w") as f:
        f.write(f">a\n{ref.decode()}\n")
    run_align("ref.fa", ["q.fa"], AlignConfig(to_stdout=True))
    cap = capsys.readouterr()
    assert cap.out == f">a\n{ref.decode()}\n"


def test_hybrid_two_pass_path_vs_oracle(tmp_path, monkeypatch):
    """>8 queries per group exercises _align_hybrid (score-only pass 1,
    minimal certified band pass 2); outputs must match the O(nm) oracle
    scores and project to ref length."""
    monkeypatch.chdir(tmp_path)
    from test_gotoh import oracle_score
    rng = np.random.default_rng(12)
    n = 240
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    qs = []
    for b in range(24):
        q = bytearray(ref)
        for _ in range(int(rng.integers(0, 8))):
            q[rng.integers(0, len(q))] = b"ACGT"[int(rng.integers(0, 4))]
        if rng.random() < 0.5:
            p = int(rng.integers(0, len(q) - 10))
            ln = int(rng.integers(1, 9))
            if rng.random() < 0.5:
                del q[p:p + ln]
            else:
                q[p:p] = rand_dna(rng, ln)
        qs.append(bytes(q))
    with open("q.fa", "w") as f:
        for i, q in enumerate(qs):
            f.write(f">q{i}\n{q.decode()}\n")

    stats = run_align("ref.fa", ["q.fa"], AlignConfig(output="hy"))
    assert stats.n_output == 24 and stats.failed_band == 0
    recs = {r.name: r.seq for r in read_fasta_all("hy.aln.xz")}
    assert len(recs) == 24
    for i, q in enumerate(qs):
        out = recs[f"q{i}"]
        assert len(out) == n
        # recompute the walked alignment's cost from the projection is
        # not possible (insertions dropped), but the projected row must
        # agree with the query on all non-gap columns unless mismatched
        # deliberately; pin optimal score via the kernel instead
    from uvaia_tpu.ops import gotoh
    m_pad = max(len(q) for q in qs)
    arr = np.zeros((24, m_pad), np.uint8)
    lens = np.zeros(24, np.int32)
    for b, q in enumerate(qs):
        arr[b, :len(q)] = np.frombuffer(q, np.uint8)
        lens[b] = len(q)
    _, score, ok, _, _ = gotoh.align_batch(
        np.frombuffer(ref, np.uint8), arr, lens, -64, 129)
    assert ok.all()
    for b in (0, 7, 23):
        assert score[b] == oracle_score(ref, qs[b])


def test_uncertified_sidecar(tmp_path, monkeypatch):
    """Rows accepted without an optimality certificate are named in
    <prefix>.uncertified.txt for auditing (the reference's WFA-Adapt
    silently accepts the same class)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(13)
    n = 400
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    # N-heavy same-length query: mismatch cost 800 beats any gap route,
    # but certifying that needs a band far beyond the tiny cap
    q = b"N" * 200 + ref[200:]
    with open("q.fa", "w") as f:
        f.write(f">nheavy\n{q.decode()}\n>clean\n{ref.decode()}\n")
    stats = run_align("ref.fa", ["q.fa"], AlignConfig(output="u",
                                                      band=64))
    assert stats.n_output == 2
    assert stats.uncertified == 1
    names = open("u.uncertified.txt").read().split()
    assert names == ["nheavy"]
