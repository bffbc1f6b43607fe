"""Multi-chip sharded database scan.

The reference's only parallelism is single-host OpenMP (SURVEY.md §2.5).
The TPU-native design shards two axes of the scan over a device mesh:

* ``db``   — data parallelism over database rows: each device scores its
  slice of the batch, selects a local per-query top-k, and the per-query
  global state is rebuilt from an ``all_gather`` of the tiny
  (k × queries) candidate sets over ICI.  Exactness: every global top-k
  member is necessarily in its own shard's local top-k.
* ``site`` — contraction/sequence parallelism over alignment columns
  (the context-parallel analogue, SURVEY.md §5): the site-summable
  counter partials from ops/scan.site_partials are ``psum``-reduced.

Replicated: the top-k state, the query feature arrays on the db axis,
and reference rows on the site axis (counters are reductions over
sites, so the activation is replicated while the reduction is sharded —
the standard "shard the contraction" layout).

Feature parity with the single-chip path: reference batches arrive
4-bit *packed* (halving H2D traffic; unpacked on device inside the
shard_map body) and carry explicit per-row global indices, so the same
step also scans compacted survivor batches from the lossless prune
prefilter (``make_sharded_prune_step``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import scan


def make_mesh(n_db: int, n_site: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_db * n_site
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.array(devices[:n]).reshape(n_db, n_site)
    return Mesh(dev, ("db", "site"))


def make_sharded_scan_step(qd: scan.QueryDeviceData, mesh: Mesh,
                           delta: bool = False):
    """Jitted (state, payload, ok, ref_idx) -> (state, is_best) over a
    ('db','site') mesh.

    ``payload`` — the reference batch upload, sharded over 'db':
                  default a (B, ceil(L/2)) uint8 4-bit-packed matrix
                  (scan.pack_codes); with ``delta=True`` a (pos, val)
                  sparse-diff pair from scan.delta_encode, rebuilt on
                  each device against the replicated qd.delta_base.
                  B divisible by mesh.shape['db'].
    ``ref_idx`` — (B,) int32 global database index per row (contiguous
                  batches pass base + arange; compacted pruned batches
                  pass their gathered indices).
    QueryDeviceData must be built with site_shards=mesh.shape['site'].
    """
    n_db = mesh.shape["db"]
    k = qd.k
    has_amb = qd.amb_sites is not None
    W = int(qd.q_full.shape[1])

    def local_step(st_scores, st_idx, cons_full, q_full,
                   amb, poly, payload, ok, ref_idx):
        if delta:
            pos, val, dbase = payload
            ref_codes = scan.reconstruct_delta(dbase, pos, val, width=W)
        else:
            ref_codes = scan._to_width(
                scan.unpack_codes(payload, qd.n_sites), W)
        b_loc = ref_codes.shape[0]
        # reference rows are replicated over 'site'; each shard
        # contracts only its own site-column block
        w_loc = q_full.shape[1]
        rc_loc = jax.lax.dynamic_slice_in_dim(
            ref_codes, jax.lax.axis_index("site") * w_loc, w_loc, axis=1)
        cons5, mats = scan.site_partials(
            qd.acgt, cons_full, q_full, rc_loc,
            poly if qd.acgt else None)
        cons5, mats = jax.lax.psum((cons5, mats), "site")
        # rebuild a local view so the big query arrays stay jit
        # arguments (not HLO constants; see QueryDeviceData docstring)
        qd_loc = scan.QueryDeviceData(
            acgt=qd.acgt, n_query=qd.n_query, n_sites=qd.n_sites,
            k=k, pack_keys=qd.pack_keys,
            cons_full=cons_full, q_full=q_full,
            amb_sites=amb[0] if has_amb else None,
            w_part=amb[1] if has_amb else None,
            w_text=amb[2] if has_amb else None)
        scores = scan.assemble_scores(qd_loc, ref_codes, cons5, mats)

        state = (st_scores, st_idx)
        is_best, batch_idx = scan.batch_flags_and_idx(
            qd_loc, state, scores, ok, jnp.int32(0), ref_idx=ref_idx)

        # local per-query top-k candidates (exact superset of the global)
        k_loc = min(k, b_loc)
        cand_scores, cand_idx = scan.select_topk(
            qd_loc, jnp.transpose(scores, (1, 0, 2)),
            jnp.broadcast_to(batch_idx[None, :], (qd.n_query, b_loc)),
            k_loc)

        # tiny all_gather over ICI, then rebuild the replicated state
        g_scores = jax.lax.all_gather(cand_scores, "db", axis=0)
        g_idx = jax.lax.all_gather(cand_idx, "db", axis=0)
        g_scores = jnp.transpose(g_scores, (1, 0, 2, 3)).reshape(
            qd.n_query, n_db * k_loc, 6)
        g_idx = jnp.transpose(g_idx, (1, 0, 2)).reshape(
            qd.n_query, n_db * k_loc)
        all_scores = jnp.concatenate([st_scores, g_scores], axis=1)
        all_idx = jnp.concatenate([st_idx, g_idx], axis=1)
        new_scores, new_idx = scan.select_topk(qd_loc, all_scores,
                                               all_idx, k)
        return new_scores, new_idx, is_best

    amb_spec = (P(), P(), P()) if has_amb else P()
    poly_spec = P(None, "site") if qd.acgt else P()
    payload_spec = ((P("db", None), P("db", None), P()) if delta
                    else P("db", None))
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(),                     # state (replicated)
                  P("site"), P(None, "site"),   # cons_full, q_full
                  amb_spec,                     # amb correction tables
                  poly_spec,                    # acgt polymorphic subset
                  payload_spec,                 # ref batch over db
                  P("db"), P("db")),            # ok, ref_idx
        out_specs=(P(), P(), P("db")),
        check_vma=False,
    )

    amb = (qd.amb_sites, qd.w_part, qd.w_text) if has_amb else ()
    poly = qd.q_poly if qd.acgt else ()

    if delta:
        @functools.partial(jax.jit, donate_argnums=0)
        def step(state, pos, val, ok, ref_idx):
            new_scores, new_idx, is_best = mapped(
                state[0], state[1], qd.cons_full, qd.q_full,
                amb, poly, (pos, val, qd.delta_base), ok, ref_idx)
            return (new_scores, new_idx), is_best
    else:
        @functools.partial(jax.jit, donate_argnums=0)
        def step(state, packed, ok, ref_idx):
            new_scores, new_idx, is_best = mapped(
                state[0], state[1], qd.cons_full, qd.q_full,
                amb, poly, packed, ok, ref_idx)
            return (new_scores, new_idx), is_best

    return step


def make_sharded_prune_step(qd: scan.QueryDeviceData, mesh: Mesh,
                            delta: bool = False):
    """Jitted (state, payload, ok) -> survive (B,) bool — the lossless
    phase-1 prefilter (scan.prune_step) data-parallel over the 'db'
    axis.  The prefilter arrays (scan.build_prune_data) are replicated:
    they are O(Q*L) int8, small next to the scoring matmuls, and the
    bound is a whole-row computation that does not shard by sites.
    Must be called after scan.build_prune_data(qd, pack).  With
    ``delta=True`` the payload is a (pos, val) sparse-diff pair."""

    W = int(qd.q_full.shape[1])

    def local(st_scores, st_idx, u_base, q_pure_u, idx_p, pure_p_q,
              amb_tot_q, payload, ok):
        if delta:
            pos, val, dbase = payload
            ref_codes = scan.reconstruct_delta(dbase, pos, val, width=W)
        else:
            ref_codes = scan._to_width(
                scan.unpack_codes(payload, qd.n_sites), W)
        qd_loc = scan.QueryDeviceData(
            acgt=qd.acgt, n_query=qd.n_query, n_sites=qd.n_sites,
            k=qd.k, pack_keys=qd.pack_keys,
            cons_full=None, q_full=None,
            amb_sites=None, w_part=None, w_text=None,
            u_base=u_base, q_pure_u=q_pure_u, idx_p=idx_p,
            pure_p_q=pure_p_q, amb_tot_q=amb_tot_q)
        return scan.prune_step(qd_loc, (st_scores, st_idx), ref_codes, ok)

    payload_spec = ((P("db", None), P("db", None), P()) if delta
                    else P("db", None))
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(),                     # state (replicated)
                  P(), P(), P(), P(), P(),      # prefilter arrays
                  payload_spec, P("db")),       # ref batch, ok
        out_specs=P("db"),
        check_vma=False,
    )

    if delta:
        @jax.jit
        def step(state, pos, val, ok):
            return mapped(state[0], state[1], qd.u_base, qd.q_pure_u,
                          qd.idx_p, qd.pure_p_q, qd.amb_tot_q,
                          (pos, val, qd.delta_base), ok)
    else:
        @jax.jit
        def step(state, packed, ok):
            return mapped(state[0], state[1], qd.u_base, qd.q_pure_u,
                          qd.idx_p, qd.pure_p_q, qd.amb_tot_q, packed, ok)

    return step
