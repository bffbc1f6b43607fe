"""Host-side streaming batcher for database scans.

Replaces the reference's single-threaded read/compute/write phase
alternation (nearest.c:249-330) with a background reader thread feeding
fixed-shape encoded batches through a bounded queue, so xz decompression
overlaps device compute (the TPU analogue of its OpenMP pipeline).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field

import numpy as np

from ..core.encoding import encode
from ..io.fasta import read_fasta
from .query import log


@dataclass
class RefBatch:
    codes: np.ndarray          # (B, L) uint8, zero-padded rows
    ok: np.ndarray             # (B,) bool
    names: list[str]           # len n (valid rows only)
    seqs: list[bytes]          # raw uppercased sequences (for dumping)
    base_idx: int              # global index of row 0
    n: int                     # number of valid rows


@dataclass
class StreamStats:
    count: int = 0             # sequences read (incl. rejected-by-quality)
    n_invalid: int = 0         # rejected: too ambiguous
    same_name: int = 0         # rejected: name present in query set
    files: list[str] = field(default_factory=list)


class RefStreamer:
    """Reads aligned reference files into encoded batches.

    QC mirrors nearest.c:250-286: skip same-name refs (--exclude_self),
    skip refs with fewer than (1-ref_ambiguity)*L valid sites, error on
    length mismatch.
    """

    def __init__(self, paths: list[str], n_sites: int, batch: int,
                 ref_ambiguity: float = 0.5,
                 exclude_names: set[str] | None = None,
                 prefetch: int = 4):
        self.paths = paths
        self.n_sites = n_sites
        self.batch = batch
        self.min_valid = int(n_sites * (1.0 - ref_ambiguity))
        self.exclude_names = exclude_names or set()
        self.stats = StreamStats()
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._err: BaseException | None = None

    def __iter__(self):
        self._thread.start()
        while True:
            item = self._q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item

    # ------------------------------------------------------------------

    def _produce(self):
        try:
            base = 0
            buf_names: list[str] = []
            buf_seqs: list[bytes] = []
            buf_codes = np.zeros((self.batch, self.n_sites), dtype=np.uint8)
            n = 0
            for path in self.paths:
                self.stats.files.append(path)
                for rec in read_fasta(path):
                    self.stats.count += 1
                    if rec.name in self.exclude_names:
                        self.stats.same_name += 1
                        continue
                    if len(rec.seq) != self.n_sites:
                        raise SystemExit(
                            f"Reference sequence '{rec.name}' has "
                            f"{len(rec.seq)} sites but query sequences have "
                            f"{self.n_sites} sites: all sequences must be "
                            "aligned")
                    codes = encode(rec.seq)
                    if int(np.count_nonzero(codes)) < self.min_valid:
                        self.stats.n_invalid += 1
                        continue
                    buf_codes[n] = codes
                    buf_names.append(rec.name)
                    buf_seqs.append(rec.seq)
                    n += 1
                    if n == self.batch:
                        ok = np.ones(self.batch, dtype=bool)
                        self._q.put(RefBatch(buf_codes, ok, buf_names,
                                             buf_seqs, base, n))
                        base += n
                        buf_names, buf_seqs, n = [], [], 0
                        buf_codes = np.zeros((self.batch, self.n_sites),
                                             dtype=np.uint8)
            if n:
                ok = np.zeros(self.batch, dtype=bool)
                ok[:n] = True
                buf_codes[n:] = 0
                self._q.put(RefBatch(buf_codes, ok, buf_names, buf_seqs,
                                     base, n))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(None)
