"""Reference-based batch alignment (the `uvaialign` equivalent).

Orchestration mirrors src/align.c:115-271: read the reference, stream
query FASTA files, QC-reject sequences too different in length
(outside [2/3, 3/2] x ref, align.c:190-193) or too ambiguous
(align.c:194-202), align each against the reference with affine-gap
penalties {0,4,6,2}, project onto reference coordinates (insertions
dropped, deletions '-'), and write an xz alignment or stdout.

The compute is the batched banded Gotoh kernel (ops/gotoh.py) instead
of per-thread WFA objects; bands are chosen per batch from the length
offsets and widened automatically when a path escapes (the exactness
guarantee WFA-Adapt does not give).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.encoding import encode, composition
from ..io.fasta import FastaRecord, FastaWriter, read_fasta
from ..ops import gotoh
from .query import log


@dataclass
class AlignConfig:
    ambiguity: float = 0.5
    pool: int = 512               # queries aligned per device batch
    band: int = 1024              # max band width before giving up
    slack: int = 64               # band slack beyond the length offset
    to_stdout: bool = False
    output: str | None = None
    print_interval: int = 5000

    @property
    def prefix(self) -> str:
        return self.output if self.output else "uvaia_tpu_align"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _choose_band(n: int, lens: list[int], slack: int) -> tuple[int, int]:
    """(lo, width) covering all length offsets plus slack, quantised to
    limit recompilation."""
    d_min = min(min(l - n for l in lens), 0) - slack
    d_max = max(max(l - n for l in lens), 0) + slack
    lo = -_round_up(-d_min, 32)
    width = _round_up(d_max - lo + 1, 64) + 1
    return lo, width


@dataclass
class AlignStats:
    count: int = 0
    n_output: int = 0
    rejected_length: int = 0
    rejected_ambiguity: int = 0
    failed_band: int = 0
    uncertified: int = 0     # emitted but optimality not provable
                             # within the band cap (WFA-Adapt parity)


def _qc(rec: FastaRecord, n: int, ambiguity: float, stats: AlignStats) -> bool:
    m = len(rec.seq)
    if 3 * m < 2 * n or 2 * m > 3 * n:
        log(f"Sequence {rec.name} has size too different from reference "
            f"({m} vs {n})")
        stats.rejected_length += 1
        return False
    acgt, _amb, other = composition(encode(rec.seq))
    if other > ambiguity:
        log(f"Sequence {rec.name} has proportion of N etc. (={other:f}) "
            f"above threshold of {ambiguity:f}")
        stats.rejected_ambiguity += 1
        return False
    if acgt < 1.0 - 1.1 * ambiguity:
        log(f"Sequence {rec.name} has proportion of ACGT (={acgt:f}) below "
            f"threshold of {1.0 - 1.1 * ambiguity:f}")
        stats.rejected_ambiguity += 1
        return False
    return True


TB_BUDGET = 2 << 30     # traceback buffer cap (bytes): B * n * W


def _pack_rows(recs, b_mult: int = 64):
    """(arr (B_pad, m_pad) uint8, lens (B_pad,) int32) with the batch
    axis padded to a multiple of b_mult (duplicating row 0) and m_pad
    quantised — so repeated calls hit a handful of compiled shapes."""
    B = len(recs)
    B_pad = _round_up(B, b_mult)
    m_pad = _round_up(max(len(r.seq) for r in recs), 256)
    arr = np.zeros((B_pad, m_pad), dtype=np.uint8)
    lens = np.zeros(B_pad, dtype=np.int32)
    for b, r in enumerate(recs):
        arr[b, :len(r.seq)] = np.frombuffer(r.seq, dtype=np.uint8)
        lens[b] = len(r.seq)
    arr[B:] = arr[0]
    lens[B:] = lens[0]
    return arr, lens


def _align_group(ref_arr, recs, lo, width, out, stats, cfg):
    """Align one batch group (forward + traceback); escalate band for
    rows that escape."""
    n = ref_arr.shape[0]
    # the packed traceback is B*n*W bytes in HBM; split the group so a
    # band escalation cannot blow device memory
    max_rows = max(1, TB_BUDGET // max(n * width, 1))
    if len(recs) > max_rows:
        for start in range(0, len(recs), max_rows):
            _align_group(ref_arr, recs[start:start + max_rows],
                         lo, width, out, stats, cfg)
        return
    arr, lens = _pack_rows(recs)
    aligned, score, ok, consistent, wander = gotoh.align_batch(
        ref_arr, arr, lens, lo, width)

    retry = []
    for i in range(len(recs)):
        if ok[i]:
            out[id(recs[i])] = aligned[i].tobytes()
        elif consistent[i] and 2 * wander[i] + abs(len(recs[i].seq) - n) \
                > cfg.band:
            # certifying this row would need a band beyond the cap
            # (high-cost, typically N-heavy sequences); accept the
            # consistent banded alignment, as WFA-Adapt would
            stats.uncertified += 1
            out[id(recs[i])] = aligned[i].tobytes()
        else:
            retry.append(i)
    if retry:
        # escalate up to (never beyond) the configured cap
        new_width = min(width * 4, cfg.band)
        if new_width <= width:
            for i in retry:
                if consistent[i]:
                    stats.uncertified += 1
                    out[id(recs[i])] = aligned[i].tobytes()
                else:
                    log(f"Sequence {recs[i].name}: no alignment within "
                        f"band {width}; skipped")
                    stats.failed_band += 1
            return
        new_lo = lo - (new_width - width) // 2
        _align_group(ref_arr, [recs[i] for i in retry],
                     new_lo, new_width, out, stats, cfg)


def _align_hybrid(ref_arr, recs, lo, width, out, stats, cfg):
    """Two-pass aligner: a cheap score-only forward finds each row's
    optimal cost s*, which bounds the optimal path's diagonal wander to
    s*/(2*gap_ext)+1 — so a second (traceback-emitting) pass can run in
    the minimal band that provably contains the global optimum.  The
    reference's WFA-Adapt reduction (align.c:309) serves the same goal
    heuristically; here the band choice is certified.

    Escalation: rows whose pass-1 certificate fails (banded score not
    provably optimal) re-run pass 1 at 4x width up to cfg.band; rows
    uncertifiable at the cap go through _align_group's accept/skip.
    """
    n = ref_arr.shape[0]
    if len(recs) <= 8 or width >= cfg.band:
        return _align_group(ref_arr, recs, lo, width, out, stats, cfg)
    arr, lens = _pack_rows(recs)
    score, edge_min = gotoh.gotoh_score(
        jnp.asarray(ref_arr), jnp.asarray(arr),
        jnp.asarray(lens, dtype=jnp.int32), lo, width)
    B = len(recs)
    score = np.asarray(score).astype(np.int64)[:B]
    edge_min = np.asarray(edge_min).astype(np.int64)[:B]
    d = lens[:B].astype(np.int64) - n
    e2 = 2 * gotoh.GAP_EXT
    wander = score // e2 + 1
    covered = ((np.minimum(0, d) - wander >= lo)
               & (np.maximum(0, d) + wander <= lo + width - 1))
    certified = ((score < (1 << 27))
                 & ((score < edge_min + e2) | covered))

    bad = [recs[i] for i in np.nonzero(~certified)[0]]
    if bad:
        new_width = min(width * 4, cfg.band)
        new_lo = lo - (new_width - width) // 2
        if new_width > width:
            _align_hybrid(ref_arr, bad, new_lo, new_width, out, stats, cfg)
        else:
            _align_group(ref_arr, bad, lo, width, out, stats, cfg)

    # pass 2: bucket certified rows by their minimal certified band
    buckets: dict[tuple[int, int], list] = {}
    for i in np.nonzero(certified)[0]:
        lo2 = int(np.minimum(0, d[i]) - wander[i])
        hi2 = int(np.maximum(0, d[i]) + wander[i])
        lo2 = -_round_up(-lo2, 32)
        w2 = _round_up(hi2 - lo2 + 1, 64) + 1
        buckets.setdefault((lo2, w2), []).append(recs[i])
    for (lo2, w2), brecs in buckets.items():
        _align_group(ref_arr, brecs, lo2, w2, out, stats, cfg)


def run_align(ref_path: str, fasta_paths: list[str], cfg: AlignConfig):
    from ..utils.jaxcache import enable as _cache
    _cache()
    t0 = time.time()
    try:
        ref = next(iter(read_fasta(ref_path)))
    except StopIteration:
        raise SystemExit(f"Error reading reference sequence {ref_path}")
    n = len(ref.seq)
    ref_arr = np.frombuffer(ref.seq, dtype=np.uint8)
    log(f"Reference {ref.name}: {n} sites")

    writer = None
    if not cfg.to_stdout:
        writer = FastaWriter(cfg.prefix + ".aln.xz")
        log(f"Sequences will be compressed and saved into file "
            f"{writer.path}.")

    stats = AlignStats()
    batch: list[FastaRecord] = []

    def flush():
        if not batch:
            return
        out: dict[int, bytes] = {}
        # bucket by length offset so narrow bands stay narrow
        groups: dict[int, list[FastaRecord]] = {}
        for r in batch:
            groups.setdefault((len(r.seq) - n) // 64, []).append(r)
        for recs in groups.values():
            lo, width = _choose_band(n, [len(r.seq) for r in recs],
                                     cfg.slack)
            _align_hybrid(ref_arr, recs, lo, width, out, stats, cfg)
        for r in batch:
            seq = out.get(id(r))
            if seq is None:
                continue
            stats.n_output += 1
            if cfg.to_stdout:
                sys.stdout.write(f">{r.name}\n{seq.decode('ascii')}\n")
            else:
                writer.write(r.name, seq)
        batch.clear()

    last_print = 0
    for path in fasta_paths:
        log(f"Started  reading file {path}")
        for rec in read_fasta(path):
            stats.count += 1
            if not _qc(rec, n, cfg.ambiguity, stats):
                continue
            batch.append(rec)
            if len(batch) >= cfg.pool:
                flush()
            if stats.count - last_print >= cfg.print_interval:
                last_print = stats.count
                log(f"{stats.count}\t sequences read, {stats.n_output} \t"
                    f"aligned. {time.time()-t0:.3f} secs elapsed.")
        log(f"Finished reading file {path}.")
    flush()

    if writer is not None:
        writer.close()
        log(f"Saved {stats.n_output} sequences to file {writer.path}")
    log(f"Total: {stats.count} read, {stats.n_output} aligned, "
        f"{stats.rejected_length} wrong length, "
        f"{stats.rejected_ambiguity} too ambiguous, "
        f"{stats.uncertified} uncertified (band cap), "
        f"{stats.failed_band} failed. "
        f"{time.time()-t0:.3f} secs total.")
    return stats
