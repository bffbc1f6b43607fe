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
        st_s, fl_s = step(st_s, jnp.asarray(batch), jnp.asarray(ok),
                          np.int32(start))
        st_1, fl_1 = scan.scan_step(qd_1, st_1, jnp.asarray(batch),
                                    jnp.asarray(ok), np.int32(start))
        np.testing.assert_array_equal(np.asarray(fl_s), np.asarray(fl_1))

    np.testing.assert_array_equal(np.asarray(st_s[1]), np.asarray(st_1[1]))
    np.testing.assert_array_equal(np.asarray(st_s[0]), np.asarray(st_1[0]))
