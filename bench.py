"""Benchmark: database scan throughput (genomes/sec/chip) at top-k=50.

Measures the steady-state device rate of the nearest-neighbour scan on
SARS-CoV-2-scale synthetic data (L=29903, IUPAC-realistic composition),
matching BASELINE.json config 3.  vs_baseline is against the driver's
north-star target of 100_000 genomes/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_data(rng, n, L, n_frac=0.02, amb_frac=0.0005, mut=0.002):
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
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


def main():
    import sys as _s; _s.path.insert(0, __file__.rsplit('/', 1)[0])
    from uvaia_tpu.utils.jaxcache import enable as _cache
    _cache()
    t_setup = time.time()
    import jax
    import jax.numpy as jnp
    from uvaia_tpu.core.encoding import ENCODE_LUT
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import scan

    L = int(os.environ.get("BENCH_L", 29903))
    Q = int(os.environ.get("BENCH_Q", 64))
    B = int(os.environ.get("BENCH_B", 4096))
    K = int(os.environ.get("BENCH_K", 50))
    STEPS = int(os.environ.get("BENCH_STEPS", 20))

    rng = np.random.default_rng(0)
    queries = make_data(rng, Q, L)
    codes = ENCODE_LUT[queries]
    pack = QueryPack(names=[f"q{i}" for i in range(Q)], codes=codes,
                     acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=K)

    refs = make_data(rng, B, L)
    ref_codes = jnp.asarray(ENCODE_LUT[refs])
    ok = jnp.ones(B, dtype=bool)
    state = scan.init_state(Q, K)

    # compile + warmup; materialise to host (block_until_ready is not a
    # reliable barrier on every backend transport)
    state, flags = scan.scan_step(qd, state, ref_codes, ok, np.int32(0))
    _ = np.asarray(state[0])
    print(f"# setup+compile {time.time()-t_setup:.1f}s "
          f"(L={L} Q={Q} B={B} K={K}, S={int(qd.idx_mq.shape[0])}, "
          f"device={jax.devices()[0]})", file=sys.stderr)

    def run(steps):
        nonlocal state
        t0 = time.time()
        for i in range(steps):
            state, flags = scan.scan_step(qd, state, ref_codes, ok,
                                          np.int32((i + 1) * B))
        _ = np.asarray(state[0])
        _ = np.asarray(flags)
        return time.time() - t0

    dt = run(STEPS)
    rate = STEPS * B / dt

    print(json.dumps({
        "metric": f"nearest_scan_genomes_per_sec_per_chip_L{L}_Q{Q}_k{K}",
        "value": round(rate, 1),
        "unit": "genomes/sec/chip",
        "vs_baseline": round(rate / 100_000.0, 4),
    }))


if __name__ == "__main__":
    main()
