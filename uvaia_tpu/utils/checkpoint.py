"""Checkpoint/resume for streaming database scans.

The reference has no resume path (SURVEY.md §5): a killed multi-hour
scan only keeps its partial .aln.xz dump.  Here the full scan state —
per-query top-k score/index arrays, the dumped-name map, stream
counters — is snapshotted periodically so a scan over millions of
genomes can resume exactly where it stopped.  The .aln.xz dump stays
valid across restarts because xz streams concatenate (the writer
reopens in append mode, producing a multi-stream file every xz decoder
accepts).
"""

from __future__ import annotations

import json
import os
import pickle
import tempfile
from dataclasses import dataclass

import numpy as np


@dataclass
class ScanCheckpoint:
    version: int
    records_read: int          # raw records consumed from the stream
    base_idx: int              # accepted (scored) reference count
    n_invalid: int
    same_name: int
    n_written: int             # sequences already in the .aln dump
    state_scores: np.ndarray   # (Q, k, 6)
    state_idx: np.ndarray      # (Q, k)
    names: dict[int, str]
    config_key: str            # guards against resuming a different run
    dump_bytes: int = 0        # size of the .aln dump at snapshot time;
                               # resume truncates back to it so a crash
                               # mid-xz-stream cannot corrupt the file


def config_key(**kwargs) -> str:
    return json.dumps(kwargs, sort_keys=True)


def save(path: str, ckpt: ScanCheckpoint) -> None:
    """Atomic write (tmp + rename) so a crash never corrupts it."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".ckpt.")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(ckpt, f, protocol=4)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str) -> ScanCheckpoint | None:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        ckpt = pickle.load(f)
    if not isinstance(ckpt, ScanCheckpoint) or ckpt.version != 1:
        raise SystemExit(f"unrecognised checkpoint file {path}")
    return ckpt
