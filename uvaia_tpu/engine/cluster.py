"""One-pass canopy clustering / dedup (the `uvaiaclust` equivalent).

Capability match for src/cluster.c + the cluster primitives in
fastaseq.c:95-293: stream alignments, group sequences whose pairwise
text-mismatch distance is <= `distance`, keep one medoid per cluster
(the most resolved member, add_seq_to_cluster fastaseq.c:182), record
every member name, and write the medoid alignment + membership table.

TPU-first reformulation (documented deviations from the C design,
which is itself order-dependent and approximate):

* the C pool of per-thread queues + log2 merge reduction
  (cluster.c:219-230) becomes ONE global cluster set scanned densely:
  each batch computes exact mismatch distances to ALL current medoids
  on the MXU (15 int8 features/site: valid + pure-base one-hot +
  ambiguity-code one-hot close the text-match count exactly), then a
  final all-pairs medoid merge pass replaces the queue merges;
* the C distance-to-reference "ring" prefilter (fastaseq.c:154) is an
  approximation under gap-skipping distances and is not needed here —
  distances are computed exactly for all pairs;
* within a batch, sequences join clusters by batch-start medoids (the
  C pool queues are blind to each other until merge, so this is
  strictly more connected).

Reference sequence: first sequence of -r, or a consensus built from
the first <=1024 database sequences with N fill-in and final N->A
(read_reference_sequence cluster.c:260-277, fastaseq.c:488-520).
Medoid distance-to-reference is reported like quick_pairwise_score_
reference (valid-pair char mismatches over the trim window).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..core.encoding import IS_PURE, encode
from ..io.compress import open_write
from ..io.fasta import FastaWriter, read_fasta
from .query import log


@dataclass
class ClusterConfig:
    distance: int = 1
    trim: int = 0
    pool: int = 1024              # sequences per device batch
    snps: int = 1                 # SNP positions tracked (sort tiebreak)
    reference: str | None = None
    output: str | None = None
    medoid_capacity: int = 1 << 17
    print_interval: int = 5000

    @property
    def prefix(self) -> str:
        return self.output if self.output else "cluster_uvaia"


@dataclass
class Cluster:
    name: str
    seq: bytes
    non_n: int
    dist_ref: int
    snp_pos: tuple      # positions of the first -s SNPs vs the reference
                        # (sort tiebreak, quick_pairwise_score_reference
                        # fastaseq.c:522-537)
    neighbours: list[str] = field(default_factory=list)


def build_reference(path: str, max_seqs: int) -> tuple[bytes, int]:
    """Consensus reference from up to max_seqs sequences: start with the
    first (non-ACGT -> N), fill Ns from later ACGT, then N -> A."""
    ref = None
    count = 0
    L = 0
    for rec in read_fasta(path):
        codes = encode(rec.seq)
        acgt = IS_PURE[codes] != 0
        arr = np.frombuffer(rec.seq, dtype=np.uint8).copy()
        arr[~acgt] = ord("N")
        if ref is None:
            ref = arr
            L = len(arr)
        else:
            if len(arr) != L:
                raise SystemExit("cluster: sequences are not aligned")
            fill = (ref == ord("N")) & acgt
            ref[fill] = arr[fill]
        count += 1
        if count >= max_seqs:
            break
    if ref is None:
        raise SystemExit(f"No sequences found in {path}")
    ref[ref == ord("N")] = ord("A")
    return ref.tobytes(), L


class MedoidIndex:
    """Device-resident medoid code matrix + exact mismatch distances."""

    def __init__(self, L: int, capacity: int, trim: int,
                 initial_tier: int = 1024):
        import jax.numpy as jnp
        self.jnp = jnp
        self.L = L
        self.trim = trim
        self.capacity = capacity
        self.n = 0
        # store sized in power-of-two tiers: distance kernels only ever
        # see the current tier, and grow recompiles are O(log) many
        self.tier = initial_tier
        self._codes = jnp.zeros((self.tier, L), dtype=jnp.uint8)

        window = np.zeros(L, dtype=bool)
        window[trim:L - trim if trim else L] = True
        self._window = jnp.asarray(window)

        def dists(batch_codes, med_codes):
            cb = jnp.where(self._window[None, :], batch_codes, 0)
            cm = jnp.where(self._window[None, :], med_codes, 0)
            import jax.lax as lax

            def f(codes):
                c = codes.astype(jnp.int32)
                bits = jnp.stack([(c >> i) & 1 for i in range(4)], -1)
                pop = bits.sum(-1)
                a = (bits * (pop == 1)[..., None]).astype(jnp.int8)
                v = (c != 0).astype(jnp.int8)
                amb_codes = jnp.asarray(
                    [3, 5, 6, 7, 9, 10, 11, 12, 13, 14], dtype=jnp.int32)
                e = (c[..., None] == amb_codes).astype(jnp.int8) \
                    * ((c != 0) & (pop != 1)).astype(jnp.int8)[..., None]
                return v, jnp.concatenate([a, e], axis=-1)

            vb, mb = f(cb)
            vm, mm = f(cm)
            dot = lambda x, y: lax.dot_general(
                x.reshape(x.shape[0], -1), y.reshape(y.shape[0], -1),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
            return dot(vb, vm) - dot(mb, mm)        # valid - text_matches

        import jax as _jax
        self._dists = _jax.jit(dists)
        self._append = _jax.jit(
            lambda store, rows, at: _jax.lax.dynamic_update_slice(
                store, rows, (at, 0)), donate_argnums=0)

    def distances(self, batch_codes) -> np.ndarray:
        """(B, n) exact mismatch counts vs current medoids."""
        if self.n == 0:
            return np.zeros((batch_codes.shape[0], 0), dtype=np.int32)
        d = self._dists(self.jnp.asarray(batch_codes), self._codes)
        return np.asarray(d)[:, : self.n]

    def pairwise(self, batch_codes) -> np.ndarray:
        d = self._dists(self.jnp.asarray(batch_codes),
                        self.jnp.asarray(batch_codes))
        return np.asarray(d)

    def dists_vs(self, rows: np.ndarray, codes: np.ndarray) -> np.ndarray:
        """(len(rows), len(codes)) exact mismatches between arbitrary
        code matrices (used by the blocked final merge)."""
        d = self._dists(self.jnp.asarray(rows), self.jnp.asarray(codes))
        return np.asarray(d)

    def append(self, rows: np.ndarray) -> None:
        if self.n + rows.shape[0] > self.capacity:
            raise SystemExit("cluster: medoid capacity exceeded; raise "
                             "--medoid-capacity")
        while self.n + rows.shape[0] > self.tier:
            self.tier *= 2
            self._codes = self.jnp.concatenate(
                [self._codes, self.jnp.zeros_like(self._codes)], axis=0)
        self._codes = self._append(self._codes, self.jnp.asarray(rows),
                                   self.n)
        self.n += rows.shape[0]

    def replace(self, index: int, row: np.ndarray) -> None:
        self._codes = self._append(self._codes,
                                   self.jnp.asarray(row[None, :]), index)


def _seq_stats(codes: np.ndarray, ref_codes: np.ndarray, window: np.ndarray,
               n_snps: int):
    """(non_n, dist_ref, first-n_snps SNP positions) per row, as in
    quick_pairwise_score_reference (fastaseq.c:522-537)."""
    valid = codes != 0
    non_n = valid.sum(axis=1).astype(np.int64)
    vpair = valid & (ref_codes != 0)[None, :] & window[None, :]
    mism = vpair & (codes != ref_codes[None, :])
    dist_ref = mism.sum(axis=1).astype(np.int64)
    snp_pos = []
    for row in mism:
        pos = np.flatnonzero(row)[:max(n_snps, 0)]
        snp_pos.append(tuple(int(p) for p in pos)
                       + (-1,) * (n_snps - len(pos)))
    return non_n, dist_ref, snp_pos


def run_cluster(fasta_paths: list[str], cfg: ClusterConfig):
    from ..utils.jaxcache import enable as _cache
    _cache()
    t0 = time.time()
    if cfg.reference:
        ref_seq, L = build_reference(cfg.reference, 1)
    else:
        ref_seq, L = build_reference(fasta_paths[0], 1024)
    ref_codes = encode(ref_seq)
    window = np.zeros(L, dtype=bool)
    trim = max(0, min(cfg.trim, int(L / 2.1)))
    window[trim:L - trim if trim else L] = True
    log(f"Clustering with distance {cfg.distance}, reference of {L} sites")

    index = MedoidIndex(L, cfg.medoid_capacity, trim)
    clusters: list[Cluster] = []
    count = 0
    last_print = 0

    def process(names, seqs):
        codes = np.stack([encode(s) for s in seqs])
        non_n, dist_ref, first = _seq_stats(codes, ref_codes, window,
                                            cfg.snps)  # first = snp tuples
        d_med = index.distances(codes)               # (B, M) exact
        d_self = index.pairwise(codes)               # (B, B)
        new_rows: list[int] = []                     # batch rows that
        new_cl: list[int] = []                       # ...opened clusters
        for b in range(len(names)):
            target = -1
            if d_med.shape[1]:
                hits = np.nonzero(d_med[b] <= cfg.distance)[0]
                if len(hits):
                    target = int(hits[0])
            if target < 0:
                for nb, ci in zip(new_rows, new_cl):  # chain within batch
                    if d_self[b, nb] <= cfg.distance:
                        target = ci
                        break
            if target < 0:
                clusters.append(Cluster(names[b], seqs[b], int(non_n[b]),
                                        int(dist_ref[b]), first[b]))
                new_rows.append(b)
                new_cl.append(len(clusters) - 1)
            else:
                cl = clusters[target]
                if non_n[b] > cl.non_n:              # new, more-resolved medoid
                    cl.neighbours.append(cl.name)
                    cl.name, cl.seq = names[b], seqs[b]
                    cl.non_n = int(non_n[b])
                    cl.dist_ref = int(dist_ref[b])
                    cl.snp_pos = first[b]
                    if target < index.n:             # in-store medoid
                        index.replace(target, codes[b])
                    else:                            # opened this batch
                        new_rows[new_cl.index(target)] = b
                else:
                    cl.neighbours.append(names[b])
        if new_rows:
            index.append(codes[new_rows])

    names: list[str] = []
    seqs: list[bytes] = []
    for path in fasta_paths:
        for rec in read_fasta(path):
            count += 1
            if len(rec.seq) != L:
                raise SystemExit(
                    f"cluster: sequence {rec.name} has {len(rec.seq)} "
                    f"sites, reference has {L}; sequences must be aligned")
            names.append(rec.name)
            seqs.append(rec.seq)
            if len(names) >= cfg.pool:
                process(names, seqs)
                names, seqs = [], []
            if count - last_print >= cfg.print_interval:
                last_print = count
                log(f"{count} sequences analysed in total; "
                    f"{len(clusters)} clusters; "
                    f"{time.time()-t0:.3f} secs elapsed")
        log(f"Finished reading file {path}; cumulative {count} sequences")
    if names:
        process(names, seqs)

    # final all-pairs medoid merge (replaces cluster.c:219-230 reduction)
    merged = _merge_clusters(index, clusters, cfg.distance)
    log(f"{count} sequences -> {len(merged)} clusters after merge "
        f"({time.time()-t0:.3f}s)")

    # compare_fastaseq order (fastaseq.c:23-40): member count, then
    # dist-to-ref, then the tracked SNP positions, then resolution
    merged.sort(key=lambda c: (-len(c.neighbours), -c.dist_ref,
                               tuple(-p for p in c.snp_pos), -c.non_n))
    with open_write(cfg.prefix + ".csv.xz") as fh:
        for c in merged:
            fh.write((",".join([c.name] + c.neighbours) + "\n").encode())
    with FastaWriter(cfg.prefix + ".aln.xz") as w:
        for c in merged:
            w.write(c.name, c.seq)
    log(f"Saved {len(merged)} medoids to {cfg.prefix}.aln.xz and "
        f"membership to {cfg.prefix}.csv.xz")
    return merged


def _merge_clusters(index: MedoidIndex, clusters: list[Cluster],
                    distance: int, block: int = 2048) -> list[Cluster]:
    """Union-find over all medoid pairs within `distance`, computed in
    (block x M) distance tiles so quarter-million-cluster runs never
    materialise the full pairwise matrix."""
    if len(clusters) < 2:
        return clusters
    M = len(clusters)
    codes = np.stack([encode(c.seq) for c in clusters])
    codes_d = index.jnp.asarray(codes)       # upload once for all blocks
    parent = list(range(M))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for start in range(0, M, block):
        rows = codes[start:start + block]
        d = index.dists_vs(rows, codes_d)        # (b, M)
        ii, jj = np.nonzero(d <= distance)
        for i, j in zip(ii.tolist(), jj.tolist()):
            gi = start + i
            if j <= gi:
                continue
            ri, rj = find(gi), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    groups: dict[int, list[int]] = {}
    for i in range(len(clusters)):
        groups.setdefault(find(i), []).append(i)
    out = []
    for members in groups.values():
        best = max(members, key=lambda i: clusters[i].non_n)
        cl = clusters[best]
        for i in members:
            if i == best:
                continue
            o = clusters[i]
            cl.neighbours.extend([o.name] + o.neighbours)
        out.append(cl)
    return out
