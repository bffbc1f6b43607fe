"""Reference-named entry points (uvaia, uvaialign, ...) wrap the
multiplexed CLI with the subcommand pre-selected (src/Makefile.am:7-22
installs five binaries; pyproject mirrors them)."""

import lzma

import numpy as np
import pytest

from uvaia_tpu.cli import main as cli


@pytest.mark.parametrize("fn", [cli.main_nearest, cli.main_align,
                                cli.main_ball, cli.main_cluster,
                                cli.main_legacy])
def test_alias_help_exits_zero(fn):
    with pytest.raises(SystemExit) as e:
        fn(["--help"])
    assert e.value.code == 0


def test_alias_nearest_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(3)
    L = 200
    ref = bytes(bytearray(b"ACGT"[i] for i in rng.integers(0, 4, L)))
    with open("db.fa", "w") as f:
        for i in range(6):
            row = bytearray(ref)
            row[i] = b"ACGT"[(ref[i] + 1) % 4]
            f.write(f">r{i}\n{bytes(row).decode()}\n")
    with open("q.fa", "w") as f:
        f.write(f">q0\n{ref.decode()}\n")
    rc = cli.main_nearest(["-n", "2", "-o", "out", "-r", "db.fa", "q.fa"])
    assert rc == 0
    table = lzma.open("out.csv.xz", "rt").read()
    assert table.splitlines()[0].startswith("query,reference,rank")
    assert len(table.splitlines()) == 3      # header + k=2 rows


def test_cli_ingest_then_store_scan(tmp_path, monkeypatch):
    """`ingest` subcommand (incl. --frames) -> nearest on the store:
    same ranked CSV as the direct FASTA scan (the CLI surface of the
    index-and-query path, SURVEY.md §7)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(7)
    L = 200
    ref = bytes(bytearray(b"ACGT"[i] for i in rng.integers(0, 4, L)))
    with open("db.fa", "w") as f:
        for i in range(6):
            row = bytearray(ref)
            row[i] = b"ACGT"[(ref[i] + 1) % 4]
            f.write(f">r{i}\n{bytes(row).decode()}\n")
    with open("q.fa", "w") as f:
        f.write(f">q0\n{ref.decode()}\n")
    assert cli.main(["ingest", "-o", "db.uvst", "--frames",
                     "db.fa"]) == 0
    assert cli.main(["nearest", "-n", "2", "-o", "fromfa",
                     "-r", "db.fa", "q.fa"]) == 0
    assert cli.main(["nearest", "-n", "2", "-o", "fromst",
                     "-r", "db.uvst", "q.fa"]) == 0
    fa = lzma.open("fromfa.csv.xz", "rt").read()
    st = lzma.open("fromst.csv.xz", "rt").read()
    assert fa == st
    assert len(st.splitlines()) == 3          # header + k=2 rows
