#!/usr/bin/env python
"""Small-Q / odd-shape fused-kernel smoke on the REAL TPU.

ADVICE r3 / VERDICT r4 #4: the tiny-query tiles of
ops/pallas_score.py (qt floors at 64, but the surrounding padding,
de-interleave permutations and synthetic consensus rows all depend on
Q) were proven only in interpret mode on CPU — a Mosaic lowering or
layout failure for small/odd Q would first appear at TPU runtime.
This script runs every fused kernel NON-interpret on the chip at
Q in {1, 2, 7, 16} x {full, --acgt} x {unpacked, packed} and compares
bit-for-bit against the XLA site_partials path computed on the same
device with UVAIA_TPU_PALLAS=0.

Run (uses the session's axon TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_smoke_smallq.py

Exit 0 + per-shape PASS lines on success.  The default-suite analogue
(interpret mode) lives in tests/test_pallas.py; the tpu-marked wrapper
is tests/test_tpu_smoke.py.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHABET = np.frombuffer(b"ACGTACGTACGTACGTN-RYMKSWBDHV", dtype=np.uint8)


def random_alignment(rng, n, L, mut=0.02):
    backbone = ALPHABET[rng.integers(0, 4, size=L)]
    seqs = np.tile(backbone, (n, 1))
    mask = rng.random((n, L)) < mut
    seqs[mask] = ALPHABET[rng.integers(0, len(ALPHABET), size=mask.sum())]
    return seqs


def xla_truth(scan, acgt, qd, rc):
    """site_partials with the pallas route disabled (same device)."""
    os.environ["UVAIA_TPU_PALLAS"] = "0"
    try:
        cons5, mats = scan.site_partials(acgt, qd.cons_full, qd.q_full,
                                         rc, qd.q_poly if acgt else None)
        return np.asarray(cons5), np.asarray(mats)
    finally:
        os.environ.pop("UVAIA_TPU_PALLAS", None)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from uvaia_tpu.core.encoding import encode
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import pallas_score, scan

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    if dev.platform == "cpu":
        print("WARNING: CPU backend — this smoke only proves Mosaic "
              "lowering on a real TPU", flush=True)

    rng = np.random.default_rng(5)
    L, B = 737, 24                      # odd width, small batch
    failures = 0
    for Q in (1, 2, 7, 16):
        for acgt in (False, True):
            qseqs = random_alignment(rng, Q, L)
            pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                             codes=np.stack([encode(s) for s in qseqs]),
                             acgt=acgt, trim=0)
            pack.create_indices()
            qd = scan.build_device_data(pack, k=min(3, B))
            refs = random_alignment(rng, B, L)
            ref_codes = np.stack([encode(r) for r in refs])
            W = int(qd.q_full.shape[1])
            rc = scan._to_width(jnp.asarray(ref_codes), W)
            packed = jnp.asarray(scan.pack_codes(ref_codes))

            cons5_x, mats_x = xla_truth(scan, acgt, qd, rc)
            t0 = time.time()
            if acgt:
                mats_p, cons5_p = \
                    pallas_score.mats_and_cons_acgt_via_pallas(
                        rc, qd.q_full, qd.q_poly, qd.cons_full)
                mats_k, cons5_k = \
                    pallas_score.mats_and_cons_acgt_via_pallas_packed(
                        packed, qd.q_full, qd.q_poly, qd.cons_full)
            else:
                mats_p, cons5_p = pallas_score.mats_and_cons_via_pallas(
                    rc, qd.q_full, qd.cons_full)
                mats_k, cons5_k = \
                    pallas_score.mats_and_cons_via_pallas_packed(
                        packed, qd.q_full, qd.cons_full)
            try:
                np.testing.assert_array_equal(np.asarray(mats_p), mats_x)
                np.testing.assert_array_equal(np.asarray(cons5_p), cons5_x)
                np.testing.assert_array_equal(np.asarray(mats_k), mats_x)
                np.testing.assert_array_equal(np.asarray(cons5_k), cons5_x)
            except AssertionError as e:
                failures += 1
                print(f"FAIL Q={Q} acgt={acgt}: {e}", flush=True)
                continue
            mode = "acgt" if acgt else "full"
            print(f"PASS Q={Q:>2} {mode:4} unpacked+packed "
                  f"({time.time()-t0:.1f}s incl compile)", flush=True)
    print("ALL PASS" if not failures else f"{failures} FAILURES",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
