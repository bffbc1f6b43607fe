"""End-to-end nearest search: files in, .aln.xz/.csv.xz out, vs oracle."""

import lzma
import os

import numpy as np
import pytest

from uvaia_tpu.core.encoding import encode
from uvaia_tpu.core import oracle
from uvaia_tpu.engine.nearest import NearestConfig, run_nearest
from uvaia_tpu.engine.query import build_query_pack
from uvaia_tpu.io.fasta import read_fasta_all

ALPHABET = "ACGTACGTACGTACGTN-RYMKSWBDHV"


def write_fasta(path, names, seqs):
    comp = lzma.open(path, "wt") if str(path).endswith(".xz") else \
        open(path, "w")
    with comp as f:
        for n, s in zip(names, seqs):
            f.write(f">{n}\n{s}\n")


def random_seqs(rng, n, L, mut=0.03):
    backbone = np.array([ALPHABET[i] for i in rng.integers(0, 4, L)])
    out = []
    for _ in range(n):
        s = backbone.copy()
        m = rng.random(L) < mut
        s[m] = [ALPHABET[i]
                for i in rng.integers(0, len(ALPHABET), int(m.sum()))]
        out.append("".join(s))
    return out


@pytest.mark.parametrize("acgt", [False, True])
def test_run_nearest_end_to_end(tmp_path, acgt, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(3)
    L, nq, nr, k = 500, 4, 37, 5
    qnames = [f"q{i}" for i in range(nq)]
    rnames = [f"r{i}" for i in range(nr)]
    write_fasta("q.fa.xz", qnames, random_seqs(rng, nq, L))
    write_fasta("db.fa", rnames, random_seqs(rng, nr, L))

    cfg = NearestConfig(nbest=k, acgt=acgt, pool=16)  # 3 batches, last padded
    res = run_nearest(["db.fa"], "q.fa.xz", cfg)

    # oracle on the same preprocessed pack
    pack = build_query_pack("q.fa.xz", acgt=acgt)
    db = read_fasta_all("db.fa")
    ref_codes = np.stack([encode(r.seq) for r in db])
    ref_valid = (ref_codes != 0).sum(axis=1)
    ora_scores, ora_topk = oracle.nearest_oracle(
        ref_codes, ref_valid, pack.codes, pack.consensus,
        pack.idx_c, pack.idx_m, pack.idx, k=k, acgt=acgt)

    np.testing.assert_array_equal(res.indices, ora_topk)
    for qi in range(nq):
        np.testing.assert_array_equal(
            res.scores[qi], ora_scores[ora_topk[qi], qi, :])

    # csv exists, has header + nq*k rows, ranks ascending per query
    prefix = "nn_uvaia_acgt" if acgt else "nn_uvaia"
    with lzma.open(prefix + ".csv.xz", "rt") as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 1 + nq * k
    assert lines[0].startswith("query,reference,rank,ACGT_matches")
    for qi in range(nq):
        ranks = [int(l.split(",")[2]) for l in
                 lines[1 + qi * k: 1 + (qi + 1) * k]]
        assert ranks == list(range(1, k + 1))

    # every reference named in the csv must be in the dumped alignment
    dumped = {r.name for r in read_fasta_all(prefix + ".aln.xz")}
    csv_refs = {l.split(",")[1] for l in lines[1:]}
    assert csv_refs <= dumped


def test_exclude_self_and_reject(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(5)
    L = 300
    seqs = random_seqs(rng, 6, L)
    write_fasta("q.fa", ["q0", "shared"], seqs[:2])
    # db: one shares a query name, one is all-N (rejected), rest valid
    write_fasta("db.fa", ["shared", "junk", "a", "b"],
                [seqs[2], "N" * L, seqs[3], seqs[4]])
    cfg = NearestConfig(nbest=3, pool=8, exclude_self=True, output="out")
    res = run_nearest(["db.fa"], "q.fa", cfg)
    assert res.same_name == 1
    assert res.n_invalid == 1
    kept = set(res.names.values())
    assert "shared" not in kept and "junk" not in kept
    assert os.path.exists("out.csv.xz") and os.path.exists("out.aln.xz")


@pytest.mark.parametrize("acgt", [False, True])
@pytest.mark.parametrize("trim", [0, 17])
def test_pruned_equals_dense(tmp_path, acgt, trim, monkeypatch):
    """The two-phase upper-bound prefilter is lossless: identical CSV."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(55)
    L, nq, nr, k = 450, 5, 120, 6
    write_fasta("q.fa", [f"q{i}" for i in range(nq)],
                random_seqs(rng, nq, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L, mut=0.05))
    dense = run_nearest(["db.fa"], "q.fa",
                        NearestConfig(nbest=k, pool=16, output="dense",
                                      acgt=acgt, trim=trim, prune=False))
    pruned = run_nearest(["db.fa"], "q.fa",
                         NearestConfig(nbest=k, pool=16, output="pruned",
                                       acgt=acgt, trim=trim, prune=True))
    np.testing.assert_array_equal(pruned.indices, dense.indices)
    np.testing.assert_array_equal(pruned.scores, dense.scores)
    with lzma.open("dense.csv.xz", "rt") as f:
        d = f.read()
    with lzma.open("pruned.csv.xz", "rt") as f:
        p = f.read()
    assert d == p


@pytest.mark.parametrize("acgt", [False, True])
@pytest.mark.parametrize("trim", [0, 13])
def test_site_class_rederivation_synthetic(acgt, trim):
    """The realdata gate's independent char-space site-class oracle
    (test_realdata.site_class_oracle) vs QueryPack.create_indices on a
    randomized IUPAC alignment — the cheap always-on version of the
    gate (VERDICT r4 #3)."""
    from test_realdata import site_class_oracle, assert_site_classes_match
    from uvaia_tpu.core.encoding import ENCODE_LUT
    from uvaia_tpu.engine.query import QueryPack

    rng = np.random.default_rng(99)
    Q, L = 40, 700
    seqs = [s.encode() for s in random_seqs(rng, Q, L, mut=0.05)]
    names = [f"q{i}" for i in range(Q)]
    arr = np.stack([np.frombuffer(s, np.uint8) for s in seqs])
    pack = QueryPack(names=names, codes=ENCODE_LUT[arr], acgt=acgt,
                     trim=trim)
    pack.create_indices()
    assert_site_classes_match(pack, dict(zip(names, seqs)))
    # sanity: the random alphabet must exercise all three classes
    cons, idx_c, idx_m, idx = site_class_oracle(seqs, trim, acgt)
    assert len(idx_c) and len(idx_m) and len(idx)


@pytest.mark.parametrize("codec,suffix", [("bz2", ".bz2"), ("gz", ".gz"),
                                          ("raw", "")])
def test_output_codec_ladder(tmp_path, codec, suffix, monkeypatch):
    """--codec writes the reference's biomcmc_open_compress ladder
    alternatives (nearest.c:234-236): dump + CSV round-trip and match
    the default xz run byte-for-byte after decompression."""
    import bz2 as bz2_mod
    import gzip

    from uvaia_tpu.io.fasta import read_fasta_all

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(3)
    L, nq, nr = 300, 3, 40
    write_fasta("q.fa", [f"q{i}" for i in range(nq)],
                random_seqs(rng, nq, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L))
    run_nearest(["db.fa"], "q.fa", NearestConfig(nbest=4, output="x"))
    run_nearest(["db.fa"], "q.fa", NearestConfig(nbest=4, output="c",
                                                 codec=codec))
    opener = {"bz2": bz2_mod.open, "gz": gzip.open,
              "raw": open}[codec]
    with opener(f"c.csv{suffix}", "rb") as f:
        got_csv = f.read()
    with lzma.open("x.csv.xz", "rb") as f:
        want_csv = f.read()
    assert got_csv == want_csv
    got = {(r.name, r.seq) for r in read_fasta_all(f"c.aln{suffix}")}
    want = {(r.name, r.seq) for r in read_fasta_all("x.aln.xz")}
    assert got == want


def test_strict_chars_modes(tmp_path, monkeypatch, capsys):
    """UVAIA_TPU_STRICT_CHARS surfaces the opaque-valid-character
    deviation (utils.c:258-264): silent by default, stderr warning in
    warn mode, SystemExit in error mode."""
    monkeypatch.chdir(tmp_path)
    from uvaia_tpu.core.encoding import count_unrecognised
    from uvaia_tpu.engine.query import qc_filter

    dirty = b"ACGTZZACGTACGTJ*"
    assert count_unrecognised(dirty) == 4
    assert count_unrecognised(b"ACGTRYMKSWBDHVNnXx-?Oo.acgtu") == 0

    monkeypatch.delenv("UVAIA_TPU_STRICT_CHARS", raising=False)
    names, seqs = qc_filter(["d"], [dirty], 0.5, check_aligned=False)
    assert names == ["d"]

    monkeypatch.setenv("UVAIA_TPU_STRICT_CHARS", "warn")
    qc_filter(["d"], [dirty], 0.5, check_aligned=False)
    assert "4 unrecognised character(s)" in capsys.readouterr().err

    monkeypatch.setenv("UVAIA_TPU_STRICT_CHARS", "error")
    with pytest.raises(SystemExit):
        qc_filter(["d"], [dirty], 0.5, check_aligned=False)


def test_codec_dump_from_frames_store(tmp_path, monkeypatch):
    """Review r5 #1: a frames-enabled store scanned with a non-xz
    --codec must re-encode the pre-compressed dump frames instead of
    crashing on the xz-only splice path."""
    import gzip

    from uvaia_tpu.io.fasta import read_fasta_all
    from uvaia_tpu.io.store import ingest

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(8)
    L, nq, nr = 300, 2, 30
    write_fasta("q.fa", [f"q{i}" for i in range(nq)],
                random_seqs(rng, nq, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L))
    ingest(["db.fa"], "db.uvst", frames=True)
    run_nearest(["db.uvst"], "q.fa",
                NearestConfig(nbest=3, output="g", codec="gz"))
    run_nearest(["db.uvst"], "q.fa",
                NearestConfig(nbest=3, output="x"))
    got = {(r.name, r.seq) for r in read_fasta_all("g.aln.gz")}
    want = {(r.name, r.seq) for r in read_fasta_all("x.aln.xz")}
    assert got == want and got
    with gzip.open("g.csv.gz", "rb") as f, \
            lzma.open("x.csv.xz", "rb") as g:
        assert f.read() == g.read()


def test_checkpoint_codec_mismatch_refused(tmp_path, monkeypatch):
    """Review r5 #2: resuming a checkpoint under a different --codec
    must fail the config check (the dump file it would truncate is
    codec-named)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(9)
    L, nq, nr = 300, 2, 40
    write_fasta("q.fa", [f"q{i}" for i in range(nq)],
                random_seqs(rng, nq, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L))
    run_nearest(["db.fa"], "q.fa",
                NearestConfig(nbest=3, output="o", codec="gz",
                              checkpoint="ck", checkpoint_every=0.0))
    assert os.path.exists("ck")
    with pytest.raises(SystemExit, match="different run configuration"):
        run_nearest(["db.fa"], "q.fa",
                    NearestConfig(nbest=3, output="o",
                                  checkpoint="ck"))


def test_strict_chars_fails_closed(monkeypatch, capsys):
    """Review r5 #4: any truthy UVAIA_TPU_STRICT_CHARS value other
    than warn/off errors out — a strictness knob never silently
    downgrades on spelling."""
    from uvaia_tpu.core.encoding import strict_chars_check

    for v in ("ERROR", "1", "strict", "error"):
        monkeypatch.setenv("UVAIA_TPU_STRICT_CHARS", v)
        with pytest.raises(SystemExit):
            strict_chars_check("d", b"ACGTZ")
    for v in ("WARN", "warn"):
        monkeypatch.setenv("UVAIA_TPU_STRICT_CHARS", v)
        strict_chars_check("d", b"ACGTZ")
        assert "unrecognised" in capsys.readouterr().err
    for v in ("", "0", "off", "false"):
        monkeypatch.setenv("UVAIA_TPU_STRICT_CHARS", v)
        strict_chars_check("d", b"ACGTZ")
        assert capsys.readouterr().err == ""
