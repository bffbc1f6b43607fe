"""Checkpoint/resume: interrupted scan + resume == uninterrupted scan."""

import lzma

import numpy as np
import pytest

from uvaia_tpu.engine.nearest import NearestConfig, run_nearest
from uvaia_tpu.io.fasta import read_fasta_all

from test_nearest import random_seqs, write_fasta


class _Boom(RuntimeError):
    pass


@pytest.mark.parametrize("prune", [False, True])
def test_resume_matches_single_run(tmp_path, monkeypatch, prune):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(77)
    L, nq, nr, k = 400, 3, 70, 5
    write_fasta("q.fa", [f"q{i}" for i in range(nq)],
                random_seqs(rng, nq, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L))

    # ground truth: one uninterrupted run
    ref = run_nearest(["db.fa"], "q.fa",
                      NearestConfig(nbest=k, pool=16, output="full",
                                    prune=prune))

    # interrupted run: checkpoint every batch, crash after a few steps
    import uvaia_tpu.engine.nearest as nearest_mod
    count = {"n": 0}
    target = "flush_survivors" if prune else "scan_step_delta"
    orig_step = getattr(nearest_mod.scan, target)

    def crashing_step(*a, **kw):
        if count["n"] >= 2:
            raise _Boom("simulated crash")
        count["n"] += 1
        return orig_step(*a, **kw)

    monkeypatch.setattr(nearest_mod.scan, target, crashing_step)
    cfg = NearestConfig(nbest=k, pool=16, output="part", prune=prune,
                        checkpoint="scan.ckpt", checkpoint_every=0.0)
    with pytest.raises(_Boom):
        run_nearest(["db.fa"], "q.fa", cfg)
    monkeypatch.setattr(nearest_mod.scan, target, orig_step)
    import os
    assert os.path.exists("scan.ckpt")

    # resume from the checkpoint and finish
    cfg2 = NearestConfig(nbest=k, pool=16, output="part", prune=prune,
                         checkpoint="scan.ckpt", checkpoint_every=1e9)
    res = run_nearest(["db.fa"], "q.fa", cfg2)

    np.testing.assert_array_equal(res.indices, ref.indices)
    np.testing.assert_array_equal(res.scores, ref.scores)
    with lzma.open("full.csv.xz", "rt") as f:
        full_csv = f.read()
    with lzma.open("part.csv.xz", "rt") as f:
        part_csv = f.read()
    assert full_csv == part_csv
    # dump (possibly with a few duplicated refs around the crash) must
    # still cover every reference named in the csv
    dumped = {r.name for r in read_fasta_all("part.aln.xz")}
    csv_refs = {l.split(",")[1] for l in part_csv.strip().split("\n")[1:]}
    assert csv_refs <= dumped


def test_checkpoint_config_mismatch(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(78)
    write_fasta("q.fa", ["q0"], random_seqs(rng, 1, 200))
    write_fasta("db.fa", [f"r{i}" for i in range(20)],
                random_seqs(rng, 20, 200))
    cfg = NearestConfig(nbest=2, pool=8, output="a",
                        checkpoint="c.ckpt", checkpoint_every=0.0)
    run_nearest(["db.fa"], "q.fa", cfg)
    # different nbest must refuse the old checkpoint
    cfg2 = NearestConfig(nbest=3, pool=8, output="a",
                         checkpoint="c.ckpt")
    with pytest.raises(SystemExit, match="different run configuration"):
        run_nearest(["db.fa"], "q.fa", cfg2)


def test_resume_python_reader_path(tmp_path, monkeypatch):
    """skip_records must behave identically through the pure-Python
    reader (bz2 / no native lib)."""
    monkeypatch.setenv("UVAIA_TPU_NO_NATIVE", "1")
    import uvaia_tpu.io.native as native
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_failed", False)
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(91)
    L, nr, k = 350, 50, 4
    write_fasta("q.fa", ["q0"], random_seqs(rng, 1, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L))
    ref = run_nearest(["db.fa"], "q.fa",
                      NearestConfig(nbest=k, pool=16, output="full"))
    import uvaia_tpu.engine.nearest as nearest_mod
    count = {"n": 0}
    orig = nearest_mod.scan.flush_survivors

    def crashing(*a, **kw):
        if count["n"] >= 1:
            raise _Boom("x")
        count["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(nearest_mod.scan, "flush_survivors", crashing)
    with pytest.raises(_Boom):
        run_nearest(["db.fa"], "q.fa",
                    NearestConfig(nbest=k, pool=16, output="p",
                                  checkpoint="c2.ckpt",
                                  checkpoint_every=0.0))
    monkeypatch.setattr(nearest_mod.scan, "flush_survivors", orig)
    res = run_nearest(["db.fa"], "q.fa",
                      NearestConfig(nbest=k, pool=16, output="p",
                                    checkpoint="c2.ckpt",
                                    checkpoint_every=1e9))
    np.testing.assert_array_equal(res.indices, ref.indices)
    np.testing.assert_array_equal(res.scores, ref.scores)
