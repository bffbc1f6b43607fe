"""Radius search (the `uvaiaball` equivalent).

Keeps references close to the query set, streaming the database in
device batches.  Mirrors src/ball.c:137-289 + the staged distance
decomposition of `seq_ball_against_query_structure`
(fastaseq.c:660-696).  With d_cons = d(ref, consensus | idx_c)
+ d(ref, consensus | idx_m) (stages 1+2) the reference's exact keep
rule — reproduced here bit-for-bit — is:

  keep  <=>  2 * d_cons <= distance
             OR  d_cons + min_q d(ref, q | idx) <= distance

The first disjunct is a quirk of the C: stage 3's loop guard
`(*min_dist + c_dist) >= ball_radius` (fastaseq.c:674,691) is evaluated
on entry with *min_dist == c_dist == d_cons, so whenever
2*d_cons <= distance the per-query polymorphic stage is skipped
entirely and the ref is kept regardless of per-query distances (with
*min_dist left at the meaningless 2*d_cons).  We reproduce it for
output parity; truncated early exits inside each stage only affect
speed.  Redundant query sequences are always removed first
(ball.c:190).

Documented deviation: the reference-quality threshold follows the
nearest convention, rejecting refs with fewer than (1-ref_ambiguity)*L
valid sites.  ball.c:201 instead computes non_n_ref = nchar * ambig_r
(inconsistent with nearest.c:237 and with the flag's help text); we
treat that as an upstream slip and keep the nearest semantics.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


from ..ops import distance as dist_ops
from ..ops.scan import _pad_to
from .query import build_query_pack, log
from .stream import RefStreamer


@dataclass
class BallConfig:
    distance: int = 5
    trim: int = 0
    acgt: bool = False
    keep_resolved: bool = False
    query_ambiguity: float = 0.5
    ref_ambiguity: float = 0.5
    pool: int = 4096
    output: str | None = None
    print_interval: int = 50000
    codec: str = "xz"                # output compression: xz/bz2/gz/raw

    @property
    def prefix(self) -> str:
        return self.output if self.output else "ball_uvaia"


def run_ball(ref_paths: list[str], query_path: str, cfg: BallConfig):
    from ..utils.jaxcache import enable as _cache
    _cache()
    import jax

    t0 = time.time()
    cfg.query_ambiguity = min(max(cfg.query_ambiguity, 0.001), 1.0)
    cfg.ref_ambiguity = min(max(cfg.ref_ambiguity, 0.001), 1.0)
    pack = build_query_pack(query_path, trim=cfg.trim, acgt=cfg.acgt,
                            ambiguity=cfg.query_ambiguity,
                            keep_resolved=cfg.keep_resolved,
                            always_exclude_redundant=True)
    L = pack.n_sites
    # distance clamp as in fastaseq.c:713-714
    dist = max(0, min(cfg.distance, (L - 2 * pack.trim) // 10))
    log(f"Radius search: {pack.n_query} queries, radius {dist}")

    cons_sites = np.concatenate([pack.idx_c, pack.idx_m]).astype(np.int32)
    cons_codes = pack.consensus[cons_sites]
    cons_sites_d = jnp.asarray(_pad_to(cons_sites, 128))
    cons_codes_d = jnp.asarray(_pad_to(cons_codes, 128))
    idx = pack.idx.astype(np.int32)
    q_sub = pack.codes[:, idx]
    idx_d = jnp.asarray(_pad_to(idx, 8))
    weights = jnp.asarray(_pad_to(
        dist_ops.mismatch_weights(q_sub, cfg.acgt), 8, axis=1))

    from ..ops.scan import majority_code, reconstruct_delta, unpack_codes
    from ..io import store as store_mod
    n_store = sum(store_mod.is_store(p) for p in ref_paths)
    if n_store and n_store != len(ref_paths):
        raise SystemExit(
            "reference inputs mix ingested stores and FASTA files; "
            "scan them in separate runs (or ingest the FASTA too)")
    store_mode = n_store > 0
    delta_base = majority_code(pack.codes)
    if store_mode:
        # stored diff lists are against the store's own base
        sb = store_mod.peek_store_base(ref_paths[0])
        if sb is not None:
            delta_base = sb
    delta_base_d = jnp.asarray(delta_base)

    # the query tables ride as jit ARGUMENTS, not closure captures:
    # captured device arrays inline into the HLO as constants, and the
    # (Q, P, 16) weight table is tens of MB at contract scale (the
    # hazard scan.py's QueryDeviceData docstring documents)
    tables = (cons_sites_d, cons_codes_d, idx_d, weights, delta_base_d)

    def keep_rule(tb, ref_codes, ok):
        c_sites, c_codes, t_idx, t_w, _ = tb
        d_cons = dist_ops.cons_mismatches(ref_codes, c_sites,
                                          c_codes, cfg.acgt)
        d_q = dist_ops.pair_mismatches(
            jnp.take(ref_codes, t_idx, axis=1), t_w)
        mindist = d_cons + jnp.min(d_q, axis=1)
        # C keep rule incl. the skipped-stage-3 quirk (see module docstring)
        keep = (2 * d_cons <= dist) | (mindist <= dist)
        return ok & keep, mindist

    @jax.jit
    def step(tb, packed, ok):
        return keep_rule(tb, unpack_codes(packed, L), ok)

    @jax.jit
    def step_delta(tb, pos, val, ok):
        return keep_rule(tb, reconstruct_delta(tb[4], pos, val), ok)

    streamer_cls = store_mod.StoreStreamer if store_mode else RefStreamer
    streamer = streamer_cls(ref_paths, L, cfg.pool,
                            ref_ambiguity=cfg.ref_ambiguity)
    # the kept set can be a large DB fraction (radius searches on
    # surveillance data keep whole lineages); multi-stream xz on a
    # thread pool keeps the writer off the streaming critical path
    from ..io.fasta import make_fasta_writer
    writer = make_fasta_writer(cfg.prefix + ".aln", cfg.codec)
    t1 = time.time()
    last_print = 0
    pending = None

    from .stream import dump_entry, write_dump

    def drain(pending):
        keep, batch = pending
        keep = np.asarray(keep)[: batch.n]
        for i in np.nonzero(keep)[0]:
            write_dump(writer, dump_entry(batch, int(i)))

    from .stream import EncodedStream
    pairs = streamer if store_mode else EncodedStream(streamer, delta_base)
    try:
        for batch, payload in pairs:
            if payload[0] == "delta":  # sparse-delta upload (see ops/scan)
                keep, _ = step_delta(tables, jnp.asarray(payload[1]),
                                     jnp.asarray(payload[2]),
                                     jnp.asarray(batch.ok))
            else:
                keep, _ = step(tables, jnp.asarray(payload[1]),
                               jnp.asarray(batch.ok))
            if pending is not None:
                drain(pending)
            pending = (keep, batch)
            if streamer.stats.count - last_print >= cfg.print_interval:
                last_print = streamer.stats.count
                log(f"{streamer.stats.count} sequences analysed in total, "
                    f"{writer.n_written} saved, {streamer.stats.n_invalid} "
                    f"rejected due to high ambiguity; "
                    f"{time.time()-t1:.3f} secs passed")
        if pending is not None:
            drain(pending)
    finally:
        # a mid-stream error (e.g. length-mismatch SystemExit) must
        # still flush buffered + in-flight compressed chunks
        writer.close()
    log(f"Total of {streamer.stats.count} sequences read, "
        f"{writer.n_written} within radius (kept), "
        f"{streamer.stats.n_invalid} too ambiguous (excluded). "
        f"{time.time()-t0:.3f} secs.")
    return dict(count=streamer.stats.count, kept=writer.n_written,
                invalid=streamer.stats.n_invalid)
