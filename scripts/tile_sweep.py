#!/usr/bin/env python
"""Differenced tile sweep for the packed full-mode fused kernel.

The historical tile choices in ops/pallas_score.py were timed with
loop samples that each carry one tunnel round-trip (~30ms) — the same
order as the 0.2-2ms per-step differences between tile candidates, so
the sweep conclusions had RTT-sized error bars.  This sweep times N
and 2N back-to-back async call chains (one materialisation each) and
uses the difference, cancelling the round-trip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tile_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from uvaia_tpu.core.encoding import ENCODE_LUT
    from uvaia_tpu.engine.query import QueryPack
    from uvaia_tpu.ops import pallas_score, scan

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import bench

    L, Q, B = 29903, 64, 4096
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = alphabet[rng.integers(0, 4, size=L)]
    queries = bench.make_data(rng, Q, L, backbone=backbone)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=ENCODE_LUT[queries], acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=50)
    codes = ENCODE_LUT[bench.make_data(rng, B, L, backbone=backbone)]
    packed = scan.pack_codes(codes)

    W = int(qd.q_full.shape[1])
    Qe = Q + 3
    pad = lambda n, m: (-n) % m

    # replicate mats_and_cons_via_pallas_packed's operand prep so only
    # (bt, st) vary (qt fixed at the small-pack tile)
    cf = qd.cons_full.astype(jnp.int32)
    pure_c = ((cf & (cf - 1)) == 0) & (cf != 0)
    row_x = jnp.where(pure_c, qd.cons_full, 0).astype(qd.q_full.dtype)
    row_y = jnp.full((W,), 15, dtype=qd.q_full.dtype)
    row_z = qd.cons_full.astype(qd.q_full.dtype)
    q_ext = jnp.concatenate(
        [qd.q_full, row_x[None], row_y[None], row_z[None]], axis=0)
    qt = max(64, -(-Qe // 8) * 8)

    def prep(bt, st):
        """Operands padded/gathered ONCE per tile config — only the
        kernel call sits in the timed chain."""
        Wp = W + pad(W, st)
        r = jnp.pad(jnp.asarray(packed),
                    ((0, pad(B, bt)), (0, Wp // 2 - packed.shape[1])))
        q = jnp.pad(q_ext, ((0, pad(Qe, qt)), (0, Wp - W)))
        c = jnp.pad(qd.cons_full, (0, Wp - W))
        perm = pallas_score.deinterleave_perm(Wp, min(st, Wp))
        q = jnp.take(q, perm, axis=1)
        c = jnp.take(c, perm)
        _ = np.asarray(c[:4])             # materialise prep
        return (r, q, c, min(bt, r.shape[0]), min(qt, q.shape[0]),
                min(st, Wp))

    import functools

    @functools.partial(jax.jit,
                       static_argnames=("bt_", "qt_", "st_", "k"))
    def loop_kernel(r, q, c, bt_, qt_, st_, k):
        """k kernel invocations inside ONE dispatch.  The accumulator
        feeds back into the reference operand (one byte) so XLA cannot
        hoist the loop-invariant kernel call out of the fori_loop."""
        def body(i, carry):
            acc, r_ = carry
            aa, mm, vv, cons = pallas_score._pair_counter_full_packed(
                r_, q, c, bt=bt_, qt=qt_, st=st_)
            acc = acc + aa[0, 0]
            r_ = r_.at[0, 0].set((acc & 0xF).astype(r_.dtype))
            return acc, r_
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), r))
        return acc

    N = 10
    results = []
    for bt, st in [(1024, 1024), (512, 1024), (512, 2048),
                   (2048, 1024), (1024, 512), (256, 2048)]:
        try:
            ops = prep(bt, st)
            r, q, c, bt_, qt_, st_ = ops
            for k in (N, 2 * N):          # compile both legs + warm
                _ = np.asarray(loop_kernel(r, q, c, bt_, qt_, st_, k))
            samples = []
            for _ in range(5):
                t0 = time.time()
                _ = np.asarray(loop_kernel(r, q, c, bt_, qt_, st_, N))
                t1 = time.time()
                _ = np.asarray(loop_kernel(r, q, c, bt_, qt_, st_,
                                           2 * N))
                t2 = time.time()
                d = (t2 - t1) - (t1 - t0)
                if d > 0:
                    samples.append(1e3 * d / N)
            if samples:
                samples.sort()
                med = samples[len(samples) // 2]
                rate = B / (med / 1e3)
                results.append((med, bt, st))
                print(f"bt={bt:>4} st={st:>4}: {med:6.2f} ms/iter "
                      f"({rate/1e6:.2f}M genomes/s) "
                      f"{[round(s,2) for s in samples]}", flush=True)
        except Exception as e:
            print(f"bt={bt:>4} st={st:>4}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    results.sort()
    if results:
        med, bt, st = results[0]
        print(f"BEST: bt={bt} st={st} at {med:.2f} ms/call")


if __name__ == "__main__":
    main()
