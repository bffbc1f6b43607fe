"""Benchmark: database scan throughput (genomes/sec/chip) at top-k=50.

The HEADLINE metric is the per-chip scan rate (device-resident batch,
BASELINE.json config 3 shape: L=29903, IUPAC-realistic composition);
vs_baseline is against the driver's north-star of 100_000
genomes/sec/chip — a chip-compute target.

Extra keys in the same JSON line keep the whole picture honest:
  streamed_genomes_per_sec — every timed step sparse-delta-encodes a
      DISTINCT host batch against the query majority (scan.delta_encode,
      native C++ scan) and uploads the (pos, val) diff lists (~3KB/row
      vs 15KB packed); the codes are rebuilt on device by the MXU
      one-hot kernel (ops/pallas_recon).  On this dev environment the
      device sits behind a remote tunnel (h2d_mb_per_sec ~30-60; a
      locally attached chip does ~10-100 GB/s), so the packed variant
      (streamed_packed_genomes_per_sec) measures the tunnel, not the
      chip — both are reported so the gap is visible, not hidden.
  h2d_mb_per_sec           — measured upload bandwidth of the transport
  align_seqs_per_sec       — two-pass banded-Gotoh aligner end-to-end
      on 30kb queries, xz output included (skip with BENCH_ALIGN=0)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_data(rng, n, L, n_frac=0.02, amb_frac=0.0005, mut=0.002,
              backbone=None):
    """IUPAC-realistic genomes: one shared backbone + ~0.2% SNPs, ~2% N,
    rare ambiguity codes per row — the composition of a real intra-
    species alignment (queries and database are the same population, as
    in BASELINE configs 1/3).  Pass `backbone` to draw more genomes
    from the same population."""
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    if backbone is None:
        backbone = alphabet[rng.integers(0, 4, size=L)]
    seqs = np.tile(backbone, (n, 1))
    mut_mask = rng.random((n, L)) < mut
    seqs[mut_mask] = alphabet[rng.integers(0, 4, size=mut_mask.sum())]
    n_mask = rng.random((n, L)) < n_frac
    seqs[n_mask] = ord("N")
    amb = np.frombuffer(b"RYMKSW", dtype=np.uint8)
    a_mask = rng.random((n, L)) < amb_frac
    seqs[a_mask] = amb[rng.integers(0, len(amb), size=a_mask.sum())]
    return seqs


def bench_scan(L, Q, B, K, STEPS):
    import jax
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import ENCODE_LUT
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import scan

    t_setup = time.time()
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = alphabet[rng.integers(0, 4, size=L)]
    queries = make_data(rng, Q, L, backbone=backbone)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=ENCODE_LUT[queries], acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=K)

    NB = 8                                   # distinct host batches
    host_codes = [ENCODE_LUT[make_data(rng, B, L, backbone=backbone)]
                  for _ in range(NB)]
    ok = jnp.ones(B, dtype=bool)
    state = scan.init_state(Q, K)

    # compile + warmup; materialise to host (block_until_ready is not a
    # reliable barrier on every backend transport).  The device-resident
    # kernel loop runs at the kernel's native padded width (scan pads
    # any other width on entry).
    ref_codes0 = scan._to_width(jnp.asarray(host_codes[0]),
                                int(qd.q_full.shape[1]))
    packed0 = jnp.asarray(scan.pack_codes(host_codes[0]))
    state, flags = scan.scan_step(qd, state, ref_codes0, ok, np.int32(0))
    state, flags = scan.scan_step_packed(qd, state, packed0, ok,
                                         np.int32(0))
    _ = np.asarray(state[0])
    print(f"# setup+compile {time.time()-t_setup:.1f}s "
          f"(L={L} Q={Q} B={B} K={K}, W={int(qd.q_full.shape[1])}, "
          f"device={jax.devices()[0]})", file=sys.stderr)

    # device-resident kernel rate (the compute ceiling)
    t0 = time.time()
    for i in range(STEPS):
        state, flags = scan.scan_step(qd, state, ref_codes0, ok,
                                      np.int32((i + 1) * B))
    _ = np.asarray(state[0])
    _ = np.asarray(flags)
    kernel_rate = STEPS * B / (time.time() - t0)

    # H2D bandwidth probe (distinct pre-packed buffers)
    pre_packed = [scan.pack_codes(c) for c in host_codes]
    nbytes = pre_packed[0].nbytes
    t0 = time.time()
    devs = [jax.device_put(pre_packed[i % NB]) for i in range(4)]
    _ = [np.asarray(d[0, :8]) for d in devs]
    h2d = 4 * nbytes / (time.time() - t0) / 1e6

    # STREAMED rate, 4-bit packed uploads: pack + upload a distinct
    # batch every step (the fallback upload path)
    state = scan.init_state(Q, K)
    t0 = time.time()
    for i in range(STEPS):
        packed = scan.pack_codes(host_codes[i % NB])
        state, flags = scan.scan_step_packed(qd, state,
                                             jnp.asarray(packed), ok,
                                             np.int32((i + 1) * B))
    _ = np.asarray(state[0])
    _ = np.asarray(flags)
    packed_rate = STEPS * B / (time.time() - t0)

    # STREAMED rate, sparse-delta uploads (the default path): encode
    # each distinct batch against the query majority + upload the
    # (pos, val) diff lists + rebuild on device (ops/pallas_recon)
    ok_h = np.ones(B, dtype=bool)
    enc0 = scan.delta_encode(host_codes[0], ok_h, np.asarray(qd.delta_base))
    state = scan.init_state(Q, K)
    if enc0 is not None:
        state, flags = scan.scan_step_delta(
            qd, state, jnp.asarray(enc0[0]), jnp.asarray(enc0[1]), ok,
            np.int32(0))                             # compile+warm
        _ = np.asarray(state[0])
        state = scan.init_state(Q, K)
        t0 = time.time()
        for i in range(STEPS):
            pos, val = scan.delta_encode(host_codes[i % NB], ok_h,
                                         np.asarray(qd.delta_base))
            state, flags = scan.scan_step_delta(
                qd, state, jnp.asarray(pos), jnp.asarray(val), ok,
                np.int32((i + 1) * B))
        _ = np.asarray(state[0])
        _ = np.asarray(flags)
        streamed_rate = STEPS * B / (time.time() - t0)
    else:
        streamed_rate = packed_rate
    return streamed_rate, packed_rate, kernel_rate, h2d


def bench_align(L, STEPS=1):
    """Two-pass aligner rate on 30kb queries (warm, end-to-end through
    run_align incl. xz output)."""
    import tempfile
    from uvaia_tpu.engine.align import AlignConfig, run_align

    rng = np.random.default_rng(1)
    n = L
    ref = bytes(bytearray(b"ACGT"[i] for i in rng.integers(0, 4, n)))
    NQ = int(os.environ.get("BENCH_ALIGN_NQ", 256))
    with tempfile.TemporaryDirectory() as d:
        with open(f"{d}/ref.fa", "w") as f:
            f.write(">ref\n" + ref.decode() + "\n")
        with open(f"{d}/q.fa", "w") as f:
            for b in range(NQ):
                q = bytearray(ref)
                for _ in range(int(rng.integers(5, 60))):
                    q[rng.integers(0, len(q))] = b"ACGT"[rng.integers(0, 4)]
                p = int(rng.integers(0, len(q) - 20))
                ln = int(rng.integers(1, 12))
                if rng.random() < 0.5:
                    del q[p:p + ln]
                else:
                    q[p:p] = bytes(bytearray(
                        b"ACGT"[i] for i in rng.integers(0, 4, ln)))
                f.write(f">q{b}\n{bytes(q).decode()}\n")
        run_align(f"{d}/ref.fa", [f"{d}/q.fa"],
                  AlignConfig(output=f"{d}/warm"))      # compile+warm
        t0 = time.time()
        stats = run_align(f"{d}/ref.fa", [f"{d}/q.fa"],
                          AlignConfig(output=f"{d}/out"))
        dt = time.time() - t0
        assert stats.n_output == NQ
    return NQ / dt


def bench_realdata():
    """End-to-end nearest scan on the bundled real data (xz decode ->
    delta upload -> ranked CSV), BASELINE config-1 shape with 64
    queries: the honest whole-pipeline number on actual genomes."""
    import tempfile
    from uvaia_tpu.engine.nearest import NearestConfig, run_nearest
    from uvaia_tpu.io.fasta import read_fasta

    db = "/root/reference/data/03.unique_acgt.aln.xz"
    if not os.path.exists(db):
        return None
    with tempfile.TemporaryDirectory() as d:
        qp = f"{d}/q.fa"
        with open(qp, "w") as f:
            for i, rec in enumerate(read_fasta(db)):
                if i >= 64:
                    break
                f.write(f">{rec.name}\n{rec.seq.decode()}\n")
        cfg = NearestConfig(nbest=8, exclude_self=True,
                            output=f"{d}/warm")
        r = run_nearest([db], qp, cfg)          # compile+warm
        t0 = time.time()
        r = run_nearest([db], qp,
                        NearestConfig(nbest=8, exclude_self=True,
                                      output=f"{d}/out"))
        dt = time.time() - t0
        return r.n_scanned / dt


def main():
    sys.path.insert(0, __file__.rsplit('/', 1)[0])
    from uvaia_tpu.utils.jaxcache import enable as _cache
    _cache()

    L = int(os.environ.get("BENCH_L", 29903))
    Q = int(os.environ.get("BENCH_Q", 64))
    B = int(os.environ.get("BENCH_B", 4096))
    K = int(os.environ.get("BENCH_K", 50))
    STEPS = int(os.environ.get("BENCH_STEPS", 20))

    streamed, packed, kernel, h2d = bench_scan(L, Q, B, K, STEPS)
    extra = {}
    if os.environ.get("BENCH_ALIGN", "1") != "0":
        try:
            extra["align_seqs_per_sec"] = round(bench_align(L), 1)
        except Exception as e:                      # noqa: BLE001
            print(f"# align bench failed: {e}", file=sys.stderr)
    if os.environ.get("BENCH_REALDATA", "1") != "0":
        try:
            rd = bench_realdata()
            if rd is not None:
                extra["realdata_e2e_genomes_per_sec"] = round(rd, 1)
        except Exception as e:                      # noqa: BLE001
            print(f"# realdata bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"nearest_scan_genomes_per_sec_per_chip_L{L}_Q{Q}_k{K}",
        "value": round(kernel, 1),
        "unit": "genomes/sec/chip",
        "vs_baseline": round(kernel / 100_000.0, 4),
        "streamed_genomes_per_sec": round(streamed, 1),
        "streamed_packed_genomes_per_sec": round(packed, 1),
        "h2d_mb_per_sec": round(h2d, 1),
        **extra,
    }))


if __name__ == "__main__":
    main()
