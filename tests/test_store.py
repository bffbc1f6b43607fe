"""Persistent-store (io/store.py) tests: ingest round-trip, streamer
equivalence against the FASTA path, and full-engine CSV/dump parity.

The store is the 'index' half of SURVEY.md §7's index-and-query
engine; everything here pins that scanning a store is byte-equivalent
to scanning the FASTA it was ingested from."""

import lzma
import os

import numpy as np
import pytest

from uvaia_tpu.core.encoding import ENCODE_LUT
from uvaia_tpu.io import store as store_mod
from uvaia_tpu.io.fasta import read_fasta_all


def _write_fasta(path, names, seqs):
    op = lzma.open if str(path).endswith(".xz") else open
    with op(path, "wt") as f:
        for nm, sq in zip(names, seqs):
            if isinstance(sq, bytes):
                sq = sq.decode("latin1")
            f.write(f">{nm}\n{sq}\n")


def _mk_genomes(rng, n, L, tricky=True):
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = alphabet[rng.integers(0, 4, size=L)]
    seqs = np.tile(backbone, (n, 1))
    mut = rng.random((n, L)) < 0.01
    seqs[mut] = alphabet[rng.integers(0, 4, size=mut.sum())]
    out = []
    for i in range(n):
        s = bytearray(seqs[i].tobytes())
        if tricky:
            if i % 3 == 0:            # leading N + trailing gap runs
                s[: L // 10] = b"N" * (L // 10)
                s[-L // 12:] = b"-" * (L // 12)
            if i % 4 == 1:            # mid-sequence gap run
                s[L // 2: L // 2 + 7] = b"-" * 7
            if i % 5 == 2:            # IUPAC + exception chars
                s[10] = ord("R")
                s[11] = ord("Y")
                s[12] = ord("?")      # encodes to 0, decodes via exc
                s[13] = ord("U")      # encodes as T, decodes via exc
        out.append(bytes(s))
    return out


@pytest.fixture(scope="module")
def tiny_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("store")
    rng = np.random.default_rng(7)
    L = 600
    names = [f"seq_{i:03d}|x" for i in range(37)]
    seqs = _mk_genomes(rng, 37, L)
    fa = d / "db.fa.xz"
    _write_fasta(fa, names, seqs)
    st_path = d / "db.uvst"
    # frames=True: this shared fixture carries the frame-path coverage
    # (ingest defaults to frames=False since round 4 — see ingest())
    stats = store_mod.ingest([str(fa)], str(st_path), block=8,
                             frames=True)
    return dict(dir=d, fa=str(fa), store=str(st_path), names=names,
                seqs=seqs, L=L, stats=stats)


def test_ingest_roundtrip(tiny_db):
    st = store_mod.Store(tiny_db["store"])
    assert st.n_rows == len(tiny_db["names"])
    assert st.n_sites == tiny_db["L"]
    assert store_mod.is_store(tiny_db["store"])
    assert not store_mod.is_store(tiny_db["fa"])
    for r in range(st.n_rows):
        assert st.name(r) == tiny_db["names"][r]
        expect = tiny_db["seqs"][r].upper()
        assert st.seq_row(r) == expect, f"row {r} decode mismatch"
        np.testing.assert_array_equal(
            st.codes_row(r),
            ENCODE_LUT[np.frombuffer(expect, dtype=np.uint8)])
        assert st.valid[r] == int(
            np.count_nonzero(ENCODE_LUT[np.frombuffer(expect, np.uint8)]))


def test_streamer_equivalence(tiny_db):
    """StoreStreamer batches must mirror RefStreamer+EncodedStream:
    same names/base_idx/records_read and payloads that rebuild the same
    codes — including a pool that does not divide the store block."""
    from uvaia_tpu.engine.stream import EncodedStream, RefStreamer
    from uvaia_tpu.ops import scan

    L = tiny_db["L"]
    pool = 12                       # store block is 8: forces splicing
    excl = {tiny_db["names"][5]}

    ss = store_mod.StoreStreamer([tiny_db["store"]], L, pool,
                                 ref_ambiguity=0.5, exclude_names=excl)
    base = ss.base if ss.base is not None else np.zeros(L, np.uint8)
    rs = RefStreamer([tiny_db["fa"]], L, pool, ref_ambiguity=0.5,
                     exclude_names=excl)
    got = list(ss)
    want_b = list(EncodedStream(rs, base))

    assert len(got) == len(want_b)
    for (sb, sp), (rb, _rp) in zip(got, want_b):
        assert sb.names == rb.names
        assert sb.base_idx == rb.base_idx
        assert sb.n == rb.n
        assert sb.records_read == rb.records_read
        np.testing.assert_array_equal(sb.ok, rb.ok)
        # payload rebuilds the exact codes of the kept rows
        if sp[0] == "delta":
            import jax.numpy as jnp
            codes = np.asarray(scan.reconstruct_delta(
                jnp.asarray(base), jnp.asarray(sp[1]), jnp.asarray(sp[2])))
        else:
            codes = np.asarray(scan.unpack_codes(sp[1], L))
        np.testing.assert_array_equal(codes[: sb.n], rb.codes[: rb.n])
        # on-demand decode for dump survivors
        for i in (0, sb.n - 1):
            assert sb.seq(i) == rb.seq(i)
    assert ss.stats.count == rs.stats.count
    assert ss.stats.same_name == rs.stats.same_name == 1
    assert ss.stats.n_invalid == rs.stats.n_invalid


def test_streamer_skip_records(tiny_db):
    from uvaia_tpu.engine.stream import RefStreamer

    L = tiny_db["L"]
    ss = store_mod.StoreStreamer([tiny_db["store"]], L, 8,
                                 skip_records=13, initial_base=100)
    rs = RefStreamer([tiny_db["fa"]], L, 8,
                     skip_records=13, initial_base=100)
    # the engine seeds the resumed count (nearest.py); StoreStreamer
    # derives records_read from absolute row indices either way
    rs.stats.count = 13
    got = list(ss)
    want = list(rs)
    assert [b.names for b, _ in got] == [b.names for b in want]
    assert [b.base_idx for b, _ in got] == [b.base_idx for b in want]
    assert [b.records_read for b, _ in got] == \
        [b.records_read for b in want]


def test_nearest_store_equivalence(tiny_db, tmp_path):
    """Full-engine parity: CSV rows and neighbour-dump content of a
    store scan == the FASTA scan (prune on, the default path)."""
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    qp = tmp_path / "q.fa"
    _write_fasta(qp, tiny_db["names"][:5],
                 [s.decode("latin1") for s in tiny_db["seqs"][:5]])

    r_fa = run_nearest([tiny_db["fa"]], str(qp),
                       NearestConfig(nbest=6, pool=16,
                                     output=str(tmp_path / "fa")))
    r_st = run_nearest([tiny_db["store"]], str(qp),
                       NearestConfig(nbest=6, pool=16,
                                     output=str(tmp_path / "st")))
    assert list(r_fa.rows()) == list(r_st.rows())
    assert r_fa.n_scanned == r_st.n_scanned
    assert r_fa.n_invalid == r_st.n_invalid

    def dump(prefix):
        return [(r.name, r.seq) for r in
                read_fasta_all(str(prefix) + ".aln.xz")]
    assert dump(tmp_path / "fa") == dump(tmp_path / "st")


def test_nearest_store_no_prune(tiny_db, tmp_path):
    """Store inputs through the dense (--no-prune) loop: the loop must
    consume the StoreStreamer's (batch, payload) pairs directly, not
    re-wrap it in an EncodedStream (which expects FASTA RefBatches)."""
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    qp = tmp_path / "q.fa"
    _write_fasta(qp, tiny_db["names"][:4],
                 [s.decode("latin1") for s in tiny_db["seqs"][:4]])
    r_fa = run_nearest([tiny_db["fa"]], str(qp),
                       NearestConfig(nbest=5, pool=16, prune=False,
                                     output=str(tmp_path / "nfa")))
    r_st = run_nearest([tiny_db["store"]], str(qp),
                       NearestConfig(nbest=5, pool=16, prune=False,
                                     output=str(tmp_path / "nst")))
    assert list(r_fa.rows()) == list(r_st.rows())
    a = read_fasta_all(str(tmp_path / "nfa") + ".aln.xz")
    b = read_fasta_all(str(tmp_path / "nst") + ".aln.xz")
    assert [(r.name, r.seq) for r in a] == [(r.name, r.seq) for r in b]


@pytest.mark.parametrize("prune", [True, False])
def test_nearest_store_acgt_equivalence(tiny_db, tmp_path, prune):
    """--acgt scans from a store == from the FASTA (both loop shapes):
    the StoreStreamer's delta payloads feed the acgt scoring path,
    whose consensus handling differs from full mode (nearest.c:428-433
    semantics) — pin that the store transport is mode-agnostic."""
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    qp = tmp_path / "q.fa"
    _write_fasta(qp, tiny_db["names"][:4],
                 [s.decode("latin1") for s in tiny_db["seqs"][:4]])
    r_fa = run_nearest([tiny_db["fa"]], str(qp),
                       NearestConfig(nbest=6, pool=16, acgt=True,
                                     prune=prune,
                                     output=str(tmp_path / "afa")))
    r_st = run_nearest([tiny_db["store"]], str(qp),
                       NearestConfig(nbest=6, pool=16, acgt=True,
                                     prune=prune,
                                     output=str(tmp_path / "ast")))
    assert list(r_fa.rows()) == list(r_st.rows())
    assert r_fa.n_scanned == r_st.n_scanned
    a = read_fasta_all(str(tmp_path / "afa") + ".aln.xz")
    b = read_fasta_all(str(tmp_path / "ast") + ".aln.xz")
    assert [(r.name, r.seq) for r in a] == [(r.name, r.seq) for r in b]


def test_nearest_store_mixed_inputs_rejected(tiny_db, tmp_path):
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    qp = tmp_path / "q.fa"
    _write_fasta(qp, tiny_db["names"][:2],
                 [s.decode("latin1") for s in tiny_db["seqs"][:2]])
    with pytest.raises(SystemExit, match="mix"):
        run_nearest([tiny_db["store"], tiny_db["fa"]], str(qp),
                    NearestConfig(nbest=2, output=str(tmp_path / "mx")))


def test_ball_store_equivalence(tiny_db, tmp_path):
    from uvaia_tpu.engine.ball import BallConfig, run_ball

    qp = tmp_path / "q.fa"
    _write_fasta(qp, ["q0"], [tiny_db["seqs"][0].decode("latin1")])
    s_fa = run_ball([tiny_db["fa"]], str(qp),
                    BallConfig(distance=8, pool=16,
                               output=str(tmp_path / "bfa")))
    s_st = run_ball([tiny_db["store"]], str(qp),
                    BallConfig(distance=8, pool=16,
                               output=str(tmp_path / "bst")))
    assert s_fa["kept"] == s_st["kept"]
    assert s_fa["count"] == s_st["count"]
    a = read_fasta_all(str(tmp_path / "bfa") + ".aln.xz")
    b = read_fasta_all(str(tmp_path / "bst") + ".aln.xz")
    assert [(r.name, r.seq) for r in a] == [(r.name, r.seq) for r in b]


def test_cluster_store_equivalence(tiny_db, tmp_path):
    """Cluster from a store == cluster from the FASTA it was ingested
    from: same medoids, same membership, same dump — the store path
    materialises host codes by nibble-unpacking mmap-ed packed rows
    (StoreBatch.codes) instead of decode+encode."""
    from uvaia_tpu.engine.cluster import ClusterConfig, run_cluster

    def run(src, tag):
        old = os.getcwd()
        os.chdir(tmp_path)
        try:
            merged = run_cluster([src], ClusterConfig(
                distance=3, pool=16, output=f"cl_{tag}"))
        finally:
            os.chdir(old)
        return merged

    m_fa = run(tiny_db["fa"], "fa")
    m_st = run(tiny_db["store"], "st")
    key = lambda ms: [(c.name, sorted(c.neighbours), c.non_n,
                       c.dist_ref, c.snp_pos) for c in ms]
    assert key(m_fa) == key(m_st)
    a = read_fasta_all(str(tmp_path / "cl_fa.aln.xz"))
    b = read_fasta_all(str(tmp_path / "cl_st.aln.xz"))
    assert [(r.name, r.seq) for r in a] == [(r.name, r.seq) for r in b]


def test_nearest_store_sharded_equals_single(tiny_db, tmp_path):
    """Store input through the 8-virtual-device sharded pruned path ==
    the single-device FASTA scan (the store payloads feed the same
    delta/packed sharded steps a FASTA stream does)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import lzma

    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    qp = tmp_path / "q.fa"
    _write_fasta(qp, tiny_db["names"][:4],
                 [s.decode("latin1") for s in tiny_db["seqs"][:4]])
    run_nearest([tiny_db["fa"]], str(qp),
                NearestConfig(nbest=6, pool=16,
                              output=str(tmp_path / "sg")))
    run_nearest([tiny_db["store"]], str(qp),
                NearestConfig(nbest=6, pool=16, n_devices=8,
                              site_shards=2,
                              output=str(tmp_path / "sh")))
    a = lzma.open(str(tmp_path / "sg") + ".csv.xz", "rb").read()
    b = lzma.open(str(tmp_path / "sh") + ".csv.xz", "rb").read()
    assert a == b


def test_cluster_store_mixed_inputs_rejected(tiny_db, tmp_path):
    from uvaia_tpu.engine.cluster import ClusterConfig, run_cluster

    with pytest.raises(SystemExit, match="mix"):
        run_cluster([tiny_db["store"], tiny_db["fa"]],
                    ClusterConfig(distance=2,
                                  output=str(tmp_path / "mx")))


def test_packed_fallback_block(tmp_path):
    """Rows whose diff count overflows every delta bucket force the
    block to packed-only — the scan must still be exact."""
    rng = np.random.default_rng(11)
    L = 6000
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = alphabet[rng.integers(0, 4, size=L)]
    seqs = []
    for i in range(12):
        if i < 6:
            s = backbone.copy()     # delta-friendly block
            mut = rng.random(L) < 0.01
            s[mut] = alphabet[rng.integers(0, 4, size=mut.sum())]
        else:
            s = alphabet[rng.integers(0, 4, size=L)]  # ~75% diffs
        seqs.append(s.tobytes())
    names = [f"g{i}" for i in range(12)]
    fa = tmp_path / "db.fa"
    _write_fasta(fa, names, [s.decode() for s in seqs])
    stp = tmp_path / "db.uvst"
    stats = store_mod.ingest([str(fa)], str(stp), block=6)
    assert stats.n_packed_blocks >= 1 and stats.n_delta_blocks >= 1

    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest
    qp = tmp_path / "q.fa"
    _write_fasta(qp, names[:2], [seqs[0].decode(), seqs[7].decode()])
    r_fa = run_nearest([str(fa)], str(qp),
                       NearestConfig(nbest=4, pool=6,
                                     output=str(tmp_path / "fa")))
    r_st = run_nearest([str(stp)], str(qp),
                       NearestConfig(nbest=4, pool=6,
                                     output=str(tmp_path / "st")))
    assert list(r_fa.rows()) == list(r_st.rows())


def test_ingest_no_frames(tiny_db, tmp_path):
    """frames=False (the DEFAULT) store: no rowxz section, frame()
    returns None, and the engines fall back to seq-byte dump writes
    (content parity with a frames store)."""
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    stp = tmp_path / "nf.uvst"
    store_mod.ingest([tiny_db["fa"]], str(stp), block=8)
    st = store_mod.Store(stp)
    assert st.frame_row(0) is None
    qp = tmp_path / "q.fa"
    _write_fasta(qp, tiny_db["names"][:2], tiny_db["seqs"][:2])
    r_nf = run_nearest([str(stp)], str(qp),
                       NearestConfig(nbest=3, pool=16,
                                     output=str(tmp_path / "nf")))
    r_fr = run_nearest([tiny_db["store"]], str(qp),
                       NearestConfig(nbest=3, pool=16,
                                     output=str(tmp_path / "fr")))
    assert list(r_nf.rows()) == list(r_fr.rows())
    a = read_fasta_all(str(tmp_path / "nf") + ".aln.xz")
    b = read_fasta_all(str(tmp_path / "fr") + ".aln.xz")
    assert [(r.name, r.seq) for r in a] == [(r.name, r.seq) for r in b]


def test_ingest_append_equals_one_shot(tmp_path):
    """ingest(A) then append(B) must equal ingest(A+B): same meta,
    packed rows, names, exact decodes, frames, and a byte-identical
    nearest CSV from either store."""
    import lzma

    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest

    rng = np.random.default_rng(31)
    L = 600
    seqs = _mk_genomes(rng, 41, L)
    names = [f"s{i:03d}" for i in range(41)]
    fa_a, fa_b = tmp_path / "a.fa.xz", tmp_path / "b.fa.xz"
    _write_fasta(fa_a, names[:23], seqs[:23])
    _write_fasta(fa_b, names[23:], seqs[23:])

    one = tmp_path / "one.uvst"
    store_mod.ingest([str(fa_a), str(fa_b)], str(one), block=8,
                     frames=True)
    two = tmp_path / "two.uvst"
    st_a = store_mod.ingest([str(fa_a)], str(two), block=8, frames=True)
    st_b = store_mod.ingest([str(fa_b)], str(two), block=8, append=True)
    assert st_b.n_rows == 18                   # this run's rows only

    s1, s2 = store_mod.Store(str(one)), store_mod.Store(str(two))
    assert s2.n_rows == s1.n_rows == 41
    assert s2.meta["has_rowxz"] and s2.meta["has_delta"]
    np.testing.assert_array_equal(np.asarray(s1.packed),
                                  np.asarray(s2.packed))
    np.testing.assert_array_equal(s1.valid, s2.valid)
    for r in range(s1.n_rows):
        assert s2.name(r) == s1.name(r) == names[r]
        assert s2.seq_row(r) == s1.seq_row(r)
        assert s2.frame_row(r) == s1.frame_row(r)

    qp = tmp_path / "q.fa"
    _write_fasta(qp, names[:3], [s.decode("latin1") for s in seqs[:3]])
    r1 = run_nearest([str(one)], str(qp),
                     NearestConfig(nbest=5, pool=16,
                                   output=str(tmp_path / "o1")))
    r2 = run_nearest([str(two)], str(qp),
                     NearestConfig(nbest=5, pool=16,
                                   output=str(tmp_path / "o2")))
    assert (lzma.open(str(tmp_path / "o1") + ".csv.xz").read()
            == lzma.open(str(tmp_path / "o2") + ".csv.xz").read())


def test_ingest_append_crash_rerun(tmp_path):
    """An append that crashed at the WORST point (every section
    extended, offsets arrays saved, meta not yet committed) leaves the
    old store readable, and simply re-running the append produces the
    exact one-shot store — the truncate-to-meta pass drops orphans."""
    import shutil

    rng = np.random.default_rng(37)
    L = 600                    # _mk_genomes' gap-run slices need 12 | L
    seqs = _mk_genomes(rng, 30, L)
    names = [f"c{i:03d}" for i in range(30)]
    fa_a, fa_b = tmp_path / "a.fa.xz", tmp_path / "b.fa.xz"
    _write_fasta(fa_a, names[:17], seqs[:17])
    _write_fasta(fa_b, names[17:], seqs[17:])

    one = tmp_path / "one.uvst"
    store_mod.ingest([str(fa_a), str(fa_b)], str(one), block=8,
                     frames=True)

    two = tmp_path / "two.uvst"
    store_mod.ingest([str(fa_a)], str(two), block=8, frames=True)
    meta_before = (two / "meta.json").read_bytes()
    store_mod.ingest([str(fa_b)], str(two), block=8, append=True)
    # crash simulation: everything the append wrote survives EXCEPT
    # the meta commit
    (two / "meta.json").write_bytes(meta_before)

    st = store_mod.Store(str(two))          # old store still readable
    assert st.n_rows == 17
    assert st.seq_row(16) == seqs[16].upper()

    store_mod.ingest([str(fa_b)], str(two), block=8, append=True)

    # a clean (never-crashed) append with the same splits: the rerun
    # must reproduce it byte-for-byte, orphans and all gone
    three = tmp_path / "three.uvst"
    store_mod.ingest([str(fa_a)], str(three), block=8, frames=True)
    store_mod.ingest([str(fa_b)], str(three), block=8, append=True)
    for p in sorted(three.iterdir()):
        assert (two / p.name).read_bytes() == p.read_bytes(), p.name

    # and row-level content matches the one-shot ingest (block
    # boundaries legitimately differ: 17 rows don't fill block 3)
    s1, s2 = store_mod.Store(str(one)), store_mod.Store(str(two))
    assert s2.n_rows == 30
    np.testing.assert_array_equal(np.asarray(s1.packed),
                                  np.asarray(s2.packed))
    np.testing.assert_array_equal(s1.valid, s2.valid)
    for r in range(30):
        assert s2.name(r) == s1.name(r)
        assert s2.seq_row(r) == s1.seq_row(r)
        assert s2.frame_row(r) == s1.frame_row(r)
    shutil.rmtree(two)


def test_ingest_append_guards(tmp_path, tiny_db):
    """--append needs an existing store and matching site count."""
    with pytest.raises(SystemExit, match="existing store"):
        store_mod.ingest([tiny_db["fa"]], str(tmp_path / "nope.uvst"),
                         append=True)
    short = tmp_path / "short.fa"
    _write_fasta(short, ["x"], ["ACGT"])
    dst = tmp_path / "st.uvst"
    store_mod.ingest([tiny_db["fa"]], str(dst), block=8)
    with pytest.raises(SystemExit, match="aligned"):
        store_mod.ingest([str(short)], str(dst), append=True)


def test_ingest_refuses_overwrite(tiny_db):
    with pytest.raises(SystemExit, match="exists"):
        store_mod.ingest([tiny_db["fa"]], tiny_db["store"])
    assert store_mod.is_store(tiny_db["store"])


def test_info_matches_store(tiny_db, capsys):
    """`store.info` + the `info` CLI report the committed meta exactly
    (rows, sites, block mix, frames, valid-site spread)."""
    rec = store_mod.info(tiny_db["store"])
    st = store_mod.Store(tiny_db["store"])
    assert rec["n_rows"] == st.n_rows == len(tiny_db["names"])
    assert rec["n_sites"] == tiny_db["L"]
    assert rec["has_rowxz"] is True
    stats = tiny_db["stats"]
    assert rec["n_delta_blocks"] == stats.n_delta_blocks
    assert rec["n_packed_only_blocks"] == stats.n_packed_blocks
    assert rec["n_blocks"] == stats.n_delta_blocks + stats.n_packed_blocks
    v = np.asarray(st.valid)
    assert rec["valid_sites"] == {"min": int(v.min()),
                                  "mean": round(float(v.mean()), 1),
                                  "max": int(v.max())}
    assert rec["total_bytes"] == sum(rec["component_bytes"].values()) > 0
    assert tiny_db["fa"] in rec["sources"]

    import json

    from uvaia_tpu.cli import main as cli
    assert cli.main(["info", tiny_db["store"], "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out == rec
    assert cli.main(["info", tiny_db["store"]]) == 0
    human = capsys.readouterr().out
    assert f"{rec['n_rows']} x {rec['n_sites']}" in human

    with pytest.raises(ValueError):
        store_mod.info(tiny_db["dir"])  # not a store



def test_verify_detects_corruption(tiny_db, tmp_path, capsys):
    """verify(): clean store OK; a flipped byte in a committed packed
    row or a delta section is pinned to its block; --append extends
    the CRC array; a pre-checksum store reports unknown, not corrupt."""
    import shutil

    st_path = str(tmp_path / "v.uvst")
    shutil.copytree(tiny_db["store"], st_path)
    rep = store_mod.verify(st_path)
    assert rep["ok"] and not rep["bad_blocks"] and not rep["errors"]
    assert rep["checked"] == store_mod.info(st_path)["n_blocks"]
    assert rep["unknown"] == 0

    # flip one nibble in packed.bin inside block 1's rows
    blocks = np.load(os.path.join(st_path, "blocks.npy"))
    w2 = store_mod.Store(st_path).meta["w2"]
    row0 = int(blocks[1, 0])
    with open(os.path.join(st_path, "packed.bin"), "r+b") as f:
        f.seek(row0 * w2 + 3)
        b = f.read(1)
        f.seek(row0 * w2 + 3)
        f.write(bytes([b[0] ^ 0x11]))
    rep = store_mod.verify(st_path)
    assert not rep["ok"] and rep["bad_blocks"] == [1]

    # CLI surfaces it with exit 1 (both output modes)
    from uvaia_tpu.cli import main as cli
    assert cli.main(["info", st_path, "--verify"]) == 1
    assert "CORRUPT" in capsys.readouterr().out
    assert cli.main(["info", st_path, "--verify", "--json"]) == 1
    capsys.readouterr()

    # a delta-section flip is caught too (block 0 is delta: E > 0)
    shutil.rmtree(st_path)
    shutil.copytree(tiny_db["store"], st_path)
    assert int(blocks[0, 2]) > 0
    with open(os.path.join(st_path, "delta_pos.bin"), "r+b") as f:
        f.seek(int(blocks[0, 3]) + 1)
        b = f.read(1)
        f.seek(int(blocks[0, 3]) + 1)
        f.write(bytes([b[0] ^ 0x40]))
    rep = store_mod.verify(st_path)
    assert not rep["ok"] and 0 in rep["bad_blocks"]

    # append keeps verification green and extends coverage
    shutil.rmtree(st_path)
    shutil.copytree(tiny_db["store"], st_path)
    n0 = store_mod.info(st_path)["n_blocks"]
    fa2 = str(tmp_path / "more.fa")
    _write_fasta(fa2, ["extra_a", "extra_b"],
                 [tiny_db["seqs"][0], tiny_db["seqs"][1]])
    store_mod.ingest([fa2], st_path, append=True)
    rep = store_mod.verify(st_path)
    assert rep["ok"] and rep["checked"] == n0 + 1

    # legacy store (pre-checksum): unknown blocks, still ok
    os.unlink(os.path.join(st_path, "block_crc.npy"))
    rep = store_mod.verify(st_path)
    assert rep["ok"] and rep["checked"] == 0
    assert rep["unknown"] == n0 + 1
    # and appending to it marks old blocks unknown, checksums new ones
    store_mod.ingest([fa2], st_path, append=True)
    rep = store_mod.verify(st_path)
    assert rep["ok"] and rep["checked"] == 1 and rep["unknown"] == n0 + 1


def test_legacy_store_equivalence(tiny_db, tmp_path, monkeypatch, capsys):
    """`legacy` accepts a store wherever it accepts reference FASTA:
    same QC drops (tightened ref_ambiguity forces some), same score
    table, same saved dump bytes, same stdout."""
    from uvaia_tpu.engine.legacy import LegacyConfig, run_legacy

    monkeypatch.chdir(tmp_path)
    qp = str(tmp_path / "q.fa")
    _write_fasta(qp, ["q0", "q1", "q2"], tiny_db["seqs"][:3])

    def run(ref, out):
        cfg = LegacyConfig(nbest=2, ref_ambiguity=0.12, output=out)
        res = run_legacy(ref, qp, cfg)
        return res, capsys.readouterr().out

    (s_fa, qn_fa, rn_fa), out_fa = run(tiny_db["fa"], "lf")
    (s_st, qn_st, rn_st), out_st = run(tiny_db["store"], "ls")

    assert rn_fa == rn_st and len(rn_fa) < len(tiny_db["names"])
    assert qn_fa == qn_st
    for a, b in zip(s_fa, s_st):
        np.testing.assert_array_equal(a, b)
    assert out_fa == out_st
    assert read_fasta_all("lf.fa.xz") == read_fasta_all("ls.fa.xz")


def test_verify_covers_every_section(tiny_db, tmp_path):
    """CRC coverage is store-wide: a single flipped byte in names.bin,
    valid.npy, gapruns.bin, exc_chr.bin or rowxz.bin must fail verify
    (not just packed/delta), and a destroyed offsets array must come
    back as a reported error, never a traceback."""
    import shutil

    def fresh():
        d = str(tmp_path / "c.uvst")
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(tiny_db["store"], d)
        return d

    for binf in ("names.bin", "gapruns.bin", "exc_chr.bin", "rowxz.bin"):
        d = fresh()
        with open(os.path.join(d, binf), "r+b") as f:
            f.seek(2)
            b = f.read(1)
            f.seek(2)
            f.write(bytes([b[0] ^ 0x01]))
        rep = store_mod.verify(d)
        assert not rep["ok"] and rep["bad_blocks"], (binf, rep)

    d = fresh()                      # valid.npy payload flip
    v = np.load(os.path.join(d, "valid.npy"))
    v[5] ^= 1
    np.save(os.path.join(d, "valid.npy"), v)
    rep = store_mod.verify(d)
    assert not rep["ok"] and rep["bad_blocks"]

    d = fresh()                      # empty offsets: error, no crash
    np.save(os.path.join(d, "name_offsets.npy"),
            np.empty(0, dtype=np.int64))
    rep = store_mod.verify(d)
    assert not rep["ok"] and any("name_offsets" in e
                                 for e in rep["errors"])

    d = fresh()                      # missing delta file: error report
    os.unlink(os.path.join(d, "delta_pos.bin"))
    rep = store_mod.verify(d)
    assert not rep["ok"] and any("delta_pos" in e for e in rep["errors"])


def test_store_roundtrip_arbitrary_bytes(tmp_path):
    """Decode exactness for ADVERSARIAL sequence content, not just the
    crafted fixture: random draws over the full IUPAC set plus gaps,
    exception chars ('?', 'U', '*', '.'), and lowercase — seq_row must
    return the uppercased original byte-for-byte (encode is lossy;
    gap runs + exceptions restore it), and verify must stay ok."""
    rng = np.random.default_rng(11)
    alphabet = np.frombuffer(
        b"ACGTRYSWKMBDHVN-acgtryn?U*.", dtype=np.uint8)
    L, n = 257, 23                    # odd L: exercises the nibble pad
    rows = alphabet[rng.integers(0, len(alphabet), size=(n, L))]
    names = [f"w{i}|odd name (x){i}" for i in range(n)]
    fa = str(tmp_path / "w.fa.xz")
    _write_fasta(fa, names, [r.tobytes() for r in rows])

    st_path = str(tmp_path / "w.uvst")
    store_mod.ingest([fa], st_path, block=7, frames=True)
    st = store_mod.Store(st_path)
    assert st.n_rows == n
    for i in range(n):
        expect = rows[i].tobytes().upper()
        assert st.name(i) == names[i]
        assert st.seq_row(i) == expect, f"row {i}"
    rep = store_mod.verify(st_path)
    assert rep["ok"], rep
