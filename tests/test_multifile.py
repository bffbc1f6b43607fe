"""Multi-file reference databases (the C tool accepts several -r)."""

import numpy as np

from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

from test_nearest import random_seqs, write_fasta


def test_multiple_reference_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(88)
    L = 300
    seqs = random_seqs(rng, 41, L)
    write_fasta("q.fa", ["q0"], seqs[:1])
    write_fasta("db1.fa", [f"a{i}" for i in range(20)], seqs[1:21])
    write_fasta("db2.fa", [f"b{i}" for i in range(20)], seqs[21:41])
    write_fasta("db_all.fa", [f"a{i}" for i in range(20)]
                + [f"b{i}" for i in range(20)], seqs[1:41])

    split = run_nearest(["db1.fa", "db2.fa"], "q.fa",
                        NearestConfig(nbest=5, pool=16, output="split"))
    joint = run_nearest(["db_all.fa"], "q.fa",
                        NearestConfig(nbest=5, pool=16, output="joint"))
    np.testing.assert_array_equal(split.indices, joint.indices)
    np.testing.assert_array_equal(split.scores, joint.scores)
    # names resolve identically across the file boundary
    assert [split.names[int(i)] for i in split.indices[0]] == \
        [joint.names[int(i)] for i in joint.indices[0]]
