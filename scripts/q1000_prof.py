#!/usr/bin/env python
"""Profile the Q=1000 full-mode scan step by stage on the real TPU.

Stages timed separately (each blocked by a host materialisation):
  mats    — fused Pallas counter kernel (pallas_score)
  step    — full scan_step (mats + assemble + flags + merge)
The difference is the score-assembly + top-k overhead that the VERDICT
round-3 item 3 targets.  Usage: python scripts/q1000_prof.py [Q] [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    L, K, STEPS = 29903, 50, 8

    from uvaia_tpu.utils.jaxcache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from bench import make_data
    from uvaia_tpu.core.encoding import ENCODE_LUT
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import scan
    from uvaia_tpu.ops import pallas_score

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = alphabet[rng.integers(0, 4, size=L)]
    queries = make_data(rng, Q, L, backbone=backbone)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=ENCODE_LUT[queries], acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=K)
    W = int(qd.q_full.shape[1])
    refs = ENCODE_LUT[make_data(rng, B, L, backbone=backbone)]
    ref_d = scan._to_width(jnp.asarray(refs), W)
    ok = jnp.ones(B, dtype=bool)
    state = scan.init_state(Q, K)

    def t(fn, warm=1, reps=STEPS):
        for _ in range(warm):
            out = fn()
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1]
                     if hasattr(x, "shape") else x, out)
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1]
                     if hasattr(x, "shape") else x, out)
        return (time.time() - t0) / reps

    mats_jit = jax.jit(pallas_score.mats_and_cons_via_pallas)
    dt_mats = t(lambda: mats_jit(ref_d, qd.q_full, qd.cons_full))
    print(f"mats: {dt_mats*1e3:8.2f} ms  -> {B/dt_mats:,.0f} genomes/s")

    sp_jit = jax.jit(scan.site_partials, static_argnums=0)
    cons5, mats = sp_jit(qd.acgt, qd.cons_full, qd.q_full, ref_d,
                         qd.q_poly if qd.acgt else None)
    asm_jit = jax.jit(scan.assemble_scores)
    dt_asm = t(lambda: asm_jit(qd, ref_d, cons5, mats))
    print(f"assemble: {dt_asm*1e3:8.2f} ms")

    scores = asm_jit(qd, ref_d, cons5, mats)
    flag_jit = jax.jit(scan.batch_flags_and_idx)
    dt_flag = t(lambda: flag_jit(qd, state, scores, ok, jnp.int32(0)))
    print(f"flags: {dt_flag*1e3:8.2f} ms")

    dt_step = t(lambda: scan.scan_step(qd, state, ref_d, ok,
                                       jnp.int32(10**7)))
    print(f"scan_step (steady): {dt_step*1e3:8.2f} ms "
          f"-> {B/dt_step:,.0f} genomes/s")


if __name__ == "__main__":
    main()
