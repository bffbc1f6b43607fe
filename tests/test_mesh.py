"""Sharded (db x site) scan == single-device scan, on 8 virtual CPUs."""

import numpy as np
import pytest

from uvaia_tpu.core.encoding import encode
from uvaia_tpu.engine.query import QueryPack
from uvaia_tpu.ops import scan
from uvaia_tpu.parallel import mesh as pmesh

from test_scan import random_alignment


def _build(rng, acgt, L=520, n_query=5, site_shards=1):
    qseqs = random_alignment(rng, n_query, L)
    codes = np.stack([encode(s) for s in qseqs])
    pack = QueryPack(names=[f"q{i}" for i in range(n_query)], codes=codes,
                     acgt=acgt, trim=0)
    pack.create_indices()
    return pack


@pytest.mark.parametrize("acgt", [False, True])
@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_equals_single(acgt, shape):
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(17)
    L, k, B = 520, 4, 16
    pack = _build(rng, acgt, L=L)
    refs = random_alignment(rng, 40, L)
    ref_codes = np.stack([encode(r) for r in refs])

    n_db, n_site = shape
    m = pmesh.make_mesh(n_db, n_site)
    qd_s = scan.build_device_data(pack, k=k, site_shards=n_site)
    qd_1 = scan.build_device_data(pack, k=k)
    step = pmesh.make_sharded_scan_step(qd_s, m)

    st_s = scan.init_state(pack.n_query, k)
    st_1 = scan.init_state(pack.n_query, k)
    for start in range(0, 48, B):
        batch = np.zeros((B, L), dtype=np.uint8)
        n = max(0, min(B, 40 - start))
        ok = np.zeros(B, dtype=bool)
        batch[:n] = ref_codes[start:start + n]
        ok[:n] = True
        st_s, fl_s = step(st_s, jnp.asarray(scan.pack_codes(batch)),
                          jnp.asarray(ok),
                          jnp.asarray(start + np.arange(B, dtype=np.int32)))
        st_1, fl_1 = scan.scan_step(qd_1, st_1, jnp.asarray(batch),
                                    jnp.asarray(ok), np.int32(start))
        np.testing.assert_array_equal(np.asarray(fl_s), np.asarray(fl_1))

    np.testing.assert_array_equal(np.asarray(st_s[1]), np.asarray(st_1[1]))
    np.testing.assert_array_equal(np.asarray(st_s[0]), np.asarray(st_1[0]))


@pytest.mark.parametrize("acgt", [False, True])
def test_sharded_prune_mask_is_superset_and_exact(acgt):
    """Sharded phase-1 mask == single-device phase-1 mask."""
    import jax.numpy as jnp
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(23)
    L, k, B = 520, 4, 16
    pack = _build(rng, acgt, L=L)
    refs = random_alignment(rng, B, L)
    ref_codes = np.stack([encode(r) for r in refs])
    m = pmesh.make_mesh(4, 2)
    qd_s = scan.build_device_data(pack, k=k, site_shards=2)
    qd_1 = scan.build_device_data(pack, k=k)
    scan.build_prune_data(qd_s, pack)
    scan.build_prune_data(qd_1, pack)
    prune = pmesh.make_sharded_prune_step(qd_s, m)

    # tighten the state first so the prefilter has real thresholds
    st = scan.init_state(pack.n_query, k)
    st, _ = scan.scan_step(qd_1, st, jnp.asarray(ref_codes[:B]),
                           jnp.ones(B, bool), np.int32(0))
    packed = jnp.asarray(scan.pack_codes(ref_codes))
    ok = jnp.ones(B, bool)
    got = np.asarray(prune((st[0], st[1]), packed, ok))
    want = np.asarray(scan.prune_step(qd_1, st, jnp.asarray(ref_codes), ok))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("prune", [False, True])
def test_sharded_nearest_end_to_end_equals_single(tmp_path, monkeypatch,
                                                  prune):
    """run_nearest over an 8-device virtual mesh (incl. the pruned
    two-phase path) produces the same CSV as the single-device scan."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import lzma
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest
    from test_nearest import random_seqs, write_fasta

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(29)
    L, nq, nr, k = 400, 6, 150, 5
    write_fasta("q.fa", [f"q{i}" for i in range(nq)],
                random_seqs(rng, nq, L))
    write_fasta("db.fa", [f"r{i}" for i in range(nr)],
                random_seqs(rng, nr, L))

    run_nearest(["db.fa"], "q.fa",
                NearestConfig(nbest=k, pool=32, output="single",
                              prune=False))
    run_nearest(["db.fa"], "q.fa",
                NearestConfig(nbest=k, pool=32, output="shard",
                              n_devices=8, site_shards=2, prune=prune))
    single = lzma.open("single.csv.xz", "rb").read()
    shard = lzma.open("shard.csv.xz", "rb").read()
    assert single == shard


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_sharded_delta_equals_single(shape):
    """Sparse-delta sharded step == dense single-chip, bit for bit."""
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(23)
    L, k, B = 520, 4, 16
    pack = _build(rng, False, L=L)
    refs = random_alignment(rng, 40, L)
    ref_codes = np.stack([encode(r) for r in refs])

    n_db, n_site = shape
    m = pmesh.make_mesh(n_db, n_site)
    qd_s = scan.build_device_data(pack, k=k, site_shards=n_site)
    qd_1 = scan.build_device_data(pack, k=k)
    step_d = pmesh.make_sharded_scan_step(qd_s, m, delta=True)
    base = np.asarray(qd_s.delta_base)

    st_s = scan.init_state(pack.n_query, k)
    st_1 = scan.init_state(pack.n_query, k)
    for start in range(0, 48, B):
        batch = np.zeros((B, L), dtype=np.uint8)
        n = max(0, min(B, 40 - start))
        ok = np.zeros(B, dtype=bool)
        batch[:n] = ref_codes[start:start + n]
        ok[:n] = True
        pos, val = scan.delta_encode(batch, ok, base)
        st_s, fl_s = step_d(st_s, jnp.asarray(pos), jnp.asarray(val),
                            jnp.asarray(ok),
                            jnp.asarray(start + np.arange(B, dtype=np.int32)))
        st_1, fl_1 = scan.scan_step(qd_1, st_1, jnp.asarray(batch),
                                    jnp.asarray(ok), np.int32(start))
        np.testing.assert_array_equal(np.asarray(fl_s), np.asarray(fl_1))

    np.testing.assert_array_equal(np.asarray(st_s[1]), np.asarray(st_1[1]))
    np.testing.assert_array_equal(np.asarray(st_s[0]), np.asarray(st_1[0]))


@pytest.mark.parametrize("acgt", [False, True])
def test_sharded_survivor_buffers_equal_dense(acgt):
    """Device-resident sharded survivor path (prune_acc + flush) lands
    the same final top-k as the dense single-device scan — no survivor
    row ever re-uploaded (the buffers live on device between steps)."""
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(31)
    L, k, B, n_db = 520, 3, 16, 4
    pack = _build(rng, acgt, L=L)
    refs = random_alignment(rng, 64, L)
    ref_codes = np.stack([encode(r) for r in refs])

    m = pmesh.make_mesh(n_db, 2)
    qd_s = scan.build_device_data(pack, k=k, site_shards=2)
    qd_1 = scan.build_device_data(pack, k=k)
    scan.build_prune_data(qd_s, pack)
    cap_loc = 2 * (B // n_db)
    sv_init, acc, acc_delta, flush = pmesh.make_sharded_survivor_ops(
        qd_s, m, cap_loc)

    bufs = sv_init()
    st_s = scan.init_state(pack.n_query, k)
    st_1 = scan.init_state(pack.n_query, k)
    flagged = set()
    for start in range(0, 64, B):
        batch = ref_codes[start:start + B]
        ok = np.ones(B, dtype=bool)
        ridx = jnp.asarray(start + np.arange(B, dtype=np.int32))
        if start % (2 * B) == 0:
            survive, bufs = acc(st_s, bufs,
                                jnp.asarray(scan.pack_codes(batch)),
                                jnp.asarray(ok), ridx)
        else:
            base = np.asarray(qd_s.delta_base)
            pos, val = scan.delta_encode(batch, ok, base)
            survive, bufs = acc_delta(st_s, bufs, jnp.asarray(pos),
                                      jnp.asarray(val), jnp.asarray(ok),
                                      ridx)
        if int(np.asarray(bufs[2]).max()) + B // n_db > cap_loc:
            idxs = np.asarray(bufs[1])
            st_s, flags, bufs = flush(st_s, bufs)
            flagged |= {int(idxs[s])
                        for s in np.nonzero(np.asarray(flags))[0]}
        st_1, fl_1 = scan.scan_step(qd_1, st_1, jnp.asarray(batch),
                                    jnp.asarray(ok), np.int32(start))
    idxs = np.asarray(bufs[1])
    st_s, flags, bufs = flush(st_s, bufs)
    flagged |= {int(idxs[s]) for s in np.nonzero(np.asarray(flags))[0]}

    np.testing.assert_array_equal(np.asarray(st_s[1]), np.asarray(st_1[1]))
    np.testing.assert_array_equal(np.asarray(st_s[0]), np.asarray(st_1[0]))
    # every final neighbour was flagged for the dump at some flush
    final = set(np.asarray(st_1[1]).ravel().tolist()) - {int(scan.IDX_SENTINEL)}
    assert final <= flagged
