"""End-to-end align engine: unaligned FASTA -> ref-projected alignment."""

import lzma
import os

import numpy as np

from uvaia_tpu.engine.align import AlignConfig, run_align
from uvaia_tpu.io.fasta import FastaRecord, read_fasta_all

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


def test_parallel_xz_writer_roundtrip(tmp_path):
    """Chunked multi-stream xz output reads back in order through both
    read_fasta and a plain lzma reader (concatenated xz streams are
    valid .xz files)."""
    from uvaia_tpu.io.fasta import ParallelXzFastaWriter

    path = str(tmp_path / "out.fa.xz")
    with ParallelXzFastaWriter(path, chunk=64) as w:   # force many streams
        for i in range(200):
            w.write(f"s{i}", b"ACGT" * (i % 7 + 1))
    assert w.n_written == 200
    recs = read_fasta_all(path)
    assert [r.name for r in recs] == [f"s{i}" for i in range(200)]
    assert recs[3].seq == b"ACGT" * 4
    data = lzma.open(path, "rb").read()
    assert data.count(b">") == 200


def test_event_overflow_dense_fallback(tmp_path, monkeypatch):
    """Rows whose gap-run count exceeds the event-checkpoint capacity
    must fall back to the dense per-character walk and emit rows
    identical to the event path's."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(5)
    n = 400
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    qs = []
    for b in range(6):
        q = bytearray(ref)
        for p in (280, 200, 120, 50):   # 4 separate 2-base deletions
            del q[p:p + 2]
        q[10 + b] = b"ACGT"[(ref[10 + b] + 1) % 4]
        qs.append(bytes(q))
    with open("q.fa", "w") as f:
        for i, q in enumerate(qs):
            f.write(f">q{i}\n{q.decode()}\n")
    stats = run_align("ref.fa", ["q.fa"], AlignConfig(output="full"))
    assert stats.n_output == 6

    from uvaia_tpu.ops import gotoh
    monkeypatch.setattr(gotoh, "EV_CAP", 4)   # 8 gap-run events > 4
    stats = run_align("ref.fa", ["q.fa"], AlignConfig(output="ovf"))
    assert stats.n_output == 6
    full = {r.name: r.seq for r in read_fasta_all("full.aln.xz")}
    ovf = {r.name: r.seq for r in read_fasta_all("ovf.aln.xz")}
    assert full == ovf
    assert full["q0"].count(b"-") == 8


def test_device_batch_4bit_pack_paths():
    """The halved H2D upload (4-bit indices + LUT) must reproduce the
    raw query bytes exactly; batches with >16 distinct byte values use
    the dense upload."""
    from uvaia_tpu.engine.align import _make_device_batch
    from uvaia_tpu.io.fasta import FastaRecord

    ref = np.frombuffer(b"ACGT" * 16, np.uint8)
    seq15 = b"ACGTRYKMSWBDHVNA" * 4            # 15 distinct values
    # full 16-letter alphabet + a SHORTER second row, so the padding
    # byte 0 must alias into the LUT without burning a slot
    seq16 = b"ACGTRYKMSWBDHVNU" * 4
    seq_many = bytes(range(65, 91)) + b"ACGTAC"  # 26 distinct values
    for seqs in ([seq15], [seq16, b"ACGT" * 8], [seq_many]):
        recs = [FastaRecord(name=f"x{i}", seq=s)
                for i, s in enumerate(seqs)]
        db = _make_device_batch(ref, recs)
        for i, s in enumerate(seqs):
            got = np.asarray(db.arr_d)[i, :len(s)]
            np.testing.assert_array_equal(got, np.frombuffer(s, np.uint8))


def test_exact_fallback_certifies_beyond_band(tmp_path, monkeypatch):
    """A consistent row the --band cap cannot certify re-aligns at the
    certificate-2 band (beyond --band) and comes out provably optimal:
    uncertified == 0, no sidecar — strictly stronger than WFA-Adapt's
    silent acceptance (align.c:309)."""
    import lzma
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
    assert stats.uncertified == 0
    assert stats.exact_certified == 1
    assert not os.path.exists("u.uncertified.txt")
    rows = {}
    with lzma.open("u.aln.xz", "rt") as fh:
        name = None
        for ln in fh:
            if ln.startswith(">"):
                name = ln[1:].strip()
            else:
                rows[name] = ln.strip().encode()
    # the optimal alignment is the identity projection (mismatches only)
    assert rows["nheavy"] == q
    assert rows["clean"] == ref


def test_uncertified_sidecar_without_fallback(tmp_path, monkeypatch):
    """exact_fallback=False restores the WFA-Adapt-parity behaviour:
    the row is accepted uncertified and named in the audit sidecar."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(13)
    n = 400
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    q = b"N" * 200 + ref[200:]
    with open("q.fa", "w") as f:
        f.write(f">nheavy\n{q.decode()}\n>clean\n{ref.decode()}\n")
    stats = run_align("ref.fa", ["q.fa"],
                      AlignConfig(output="u", band=64,
                                  exact_fallback=False))
    assert stats.n_output == 2
    assert stats.uncertified == 1
    assert stats.exact_certified == 0
    names = open("u.uncertified.txt").read().split()
    assert names == ["nheavy"]


def test_dispatch_chunk_fits_int32_offsets():
    """A dispatch chunk's PADDED traceback buffer must keep
    B_pad * n_p * w_p below 2^31 (the kernels compute flat int32
    offsets and _pad_idx rounds the batch up to b_mult rows).  The
    1409-width case is the regression: max_rows computed to 46 but the
    old fixed 64-row padding pushed the kernel batch back over the
    cap (reachable via the cap-rows band for a query ~1.2kb shorter
    than a 30kb reference — inside the reference's 2/3..3/2 gate)."""
    from uvaia_tpu.engine import align as al
    for n, width in [(29903, 3073), (29903, 129), (29903, 1409),
                     (29903, 15001), (200000, 2049), (5_000_000, 641)]:
        n_p = -(-n // 128) * 128
        w_p = -(-width // 128) * 128
        max_rows, b_mult = al._chunk_plan(n, width)
        if max_rows == 0:
            # undispatchable: even one padded row overflows
            assert 1 * n_p * w_p >= 2 ** 31
            continue
        assert max_rows % b_mult == 0
        # worst chunk: full max_rows; worst tail chunk: 1 row padded
        # to b_mult — both must fit
        assert max_rows * n_p * w_p < 2 ** 31
        assert b_mult * n_p * w_p < 2 ** 31
        assert max_rows * n_p * w_p <= al.TB_BUDGET


def test_run_align_small_chunk_plan_end_to_end(tmp_path, monkeypatch):
    """Force max_rows < 64 (b_mult 8) via a tiny TB budget and run the
    whole aligner: chunks must pad to b_mult (not 64) and outputs stay
    correct — the end-to-end form of the padded-batch budget fix."""
    from uvaia_tpu.engine import align as al
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(31)
    n = 600
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    with open("q.fa", "w") as f:
        for i in range(20):
            q = bytearray(ref)
            q[7 + i] = ord("A") if ref[7 + i] != ord("A") else ord("C")
            del q[100:103]
            f.write(f">q{i}\n{bytes(q).decode()}\n")

    n_p, w_p = 640, 256           # padded (n, width) for band level 64
    monkeypatch.setattr(al, "TB_BUDGET", n_p * w_p * 10)
    max_rows, b_mult = al._chunk_plan(n, 129)
    assert b_mult == 8 and max_rows == 8   # the sub-64 plan is in force

    stats = run_align("ref.fa", ["q.fa"], AlignConfig(output="out"))
    assert stats.n_output == 20 and stats.failed_band == 0
    import lzma
    text = lzma.open("out.aln.xz", "rt").read()
    assert text.count(">") == 20
    for row in text.split(">")[1:]:
        body = "".join(row.splitlines()[1:])
        assert len(body) == n and body.count("-") == 3


def test_dispatch_group_skips_undispatchable_band(tmp_path):
    """b_mult == 0 (traceback index budget exceeded at this n/width)
    must skip the rows with failed_band counted, not dispatch garbage."""
    from uvaia_tpu.engine import align as al
    n, width = 5_000_000, 641
    assert al._chunk_plan(n, width) == (0, 0)

    class _DB:
        ref_arr = np.zeros(n, dtype=np.uint8)

    stats = al.AlignStats()
    rec = FastaRecord(name="big", seq=b"ACGT")
    pending = al._dispatch_group(_DB(), [(rec, 0)], -320, width, stats)
    assert pending == []
    assert stats.failed_band == 1


def test_run_align_multi_file_pipelined(tmp_path, monkeypatch):
    """Several input files through the prefetch-reader + 1-ahead
    dispatch pipeline: every record lands exactly once, in output,
    with a pool smaller than each file (forces multiple in-flight
    pools)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(21)
    n = 250
    ref = rand_dna(rng, n)
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    names = []
    for fi in range(3):
        with open(f"q{fi}.fa", "w") as f:
            for i in range(7):
                q = bytearray(ref)
                q[rng.integers(0, n)] = ord("ACGT"[rng.integers(0, 4)])
                nm = f"f{fi}_s{i}"
                names.append(nm)
                f.write(f">{nm}\n{bytes(q).decode()}\n")
    stats = run_align("ref.fa", [f"q{i}.fa" for i in range(3)],
                      AlignConfig(pool=4, output="mf"))
    assert stats.count == 21
    assert stats.n_output == 21
    out = {r.name: r.seq for r in read_fasta_all("mf.aln.xz")}
    assert sorted(out) == sorted(names)
    assert all(len(s) == n for s in out.values())


def test_band_edge_indel_adversarial(tmp_path, monkeypatch):
    """VERDICT r4 #6: a query whose NET length offset is ~0 (routed to
    the smallest canonical band) but whose optimal path wanders +-150
    diagonals (a 150bp insertion later cancelled by a 150bp deletion).
    The certificate must refuse the small band, escalation must find
    the optimum, and the emitted row must be certified — the class of
    input where WFA-Adapt silently accepts a suboptimal reduced-
    wavefront result (align.c:309)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(1234)
    n = 3000
    ref = rand_dna(rng, n)
    ins = rand_dna(rng, 150)
    q = ref[:1000] + ins + ref[1000:2000] + ref[2150:]
    assert len(q) == n                      # net offset 0
    with open("ref.fa", "w") as f:
        f.write(f">r\n{ref.decode()}\n")
    with open("q.fa", "w") as f:
        f.write(f">wander\n{q.decode()}\n")

    stats = run_align("ref.fa", ["q.fa"], AlignConfig(output="adv"))
    assert stats.n_output == 1
    assert stats.uncertified == 0
    assert stats.failed_band == 0
    row = read_fasta_all("adv.aln.xz")[0].seq
    assert len(row) == n
    # one 150-gap deletion run; every aligned char agrees with ref
    # after refilling the gap (boundary may shift a few bases when the
    # random flanks happen to match)
    assert row.count(b"-") == 150
    refill = bytearray(row)
    for i, ch in enumerate(row):
        if ch == ord("-"):
            refill[i] = ref[i]
    assert bytes(refill) == ref
