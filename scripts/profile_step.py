"""Decompose the scan step's device time: kernel vs assemble vs merge.

Times three nested slices of the per-batch work at the bench shape,
each as ``N`` iterations inside ONE dispatch (the scan_steps_repeat
pattern: one input byte is tied to the loop carry so XLA cannot hoist
the loop-invariant work), best of R timed repeats:

  kernel   — site_partials only (the fused Pallas scoring kernel)
  score    — score_batch (kernel + assemble_scores corrections/stack)
  step     — scan_step   (score + top-k merge)

The differences localise the next optimisation target: `score - kernel`
is the ambiguity-correction + six-score assembly cost, `step - score`
is the running top-k merge.

Usage: python scripts/profile_step.py [Q] (default 64; try 1000)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_data
from uvaia_tpu.core.encoding import ENCODE_LUT
from uvaia_tpu.engine.query import QueryPack
from uvaia_tpu.ops import scan
from uvaia_tpu.utils.jaxcache import enable as _cache


def _tied(ref_codes, carry):
    return ref_codes.at[0, 0].set((carry & 0x7).astype(ref_codes.dtype) | 1)


@functools.partial(jax.jit, static_argnums=(3,))
def loop_kernel(qd, ref_codes, carry, n):
    def body(i, c):
        cons5, mats = scan.site_partials(qd.acgt, qd.cons_full, qd.q_full,
                                         _tied(ref_codes, c), qd.q_poly)
        return cons5[0, 0] + mats[0, 0, 0] + i * 0
    return jax.lax.fori_loop(0, n, body, carry)


@functools.partial(jax.jit, static_argnums=(3,))
def loop_score(qd, ref_codes, carry, n):
    # consume one element of EVERY plane: reading only scores[0, 0, 0]
    # lets XLA dead-code the ambiguity-correction kernel and the s1..s5
    # assembly (they don't feed s0), which silently relabels that work
    # as "merge" in the step - score difference
    def body(i, c):
        planes, _ = scan.score_batch_planes(qd, _tied(ref_codes, c))
        return sum(p[0, 0] for p in planes) + i * 0
    return jax.lax.fori_loop(0, n, body, carry)


def main():
    # the session sitecustomize force-sets jax_platforms to "axon,cpu";
    # honour an explicit JAX_PLATFORMS (CPU smoke runs) like bench.py
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    _cache()
    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(os.environ.get("PROF_L", 29903))
    B = int(os.environ.get("PROF_B", 4096))
    K, N, R = 50, int(os.environ.get("PROF_N", 20)), 3

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    backbone = alphabet[rng.integers(0, 4, size=L)]
    queries = make_data(rng, Q, L, backbone=backbone)
    pack = QueryPack(names=[f"q{i}" for i in range(Q)],
                     codes=ENCODE_LUT[queries], acgt=False, trim=0)
    pack.create_indices()
    qd = scan.build_device_data(pack, k=K)
    host = ENCODE_LUT[make_data(rng, B, L, backbone=backbone)]
    ref = scan._to_width(jnp.asarray(host), int(qd.q_full.shape[1]))
    ok = jnp.ones(B, dtype=bool)
    print(f"# shape L={L} Q={Q} B={B} K={K} W={int(qd.q_full.shape[1])} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    def timed(name, fn):
        fn()                                   # compile + warm
        best = 1e9
        for _ in range(R):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        ms = best / N * 1e3
        print(f"{name:8s} {ms:8.2f} ms/step   "
              f"{B / (best / N):12.0f} genomes/s")
        return ms

    c0 = jnp.int32(1)
    t_k = timed("kernel", lambda: np.asarray(loop_kernel(qd, ref, c0, N)))
    t_s = timed("score", lambda: np.asarray(loop_score(qd, ref, c0, N)))

    state = scan.init_state(Q, K)
    state = scan.scan_steps_repeat(qd, state, ref, ok, np.int32(0), N)
    holder = [state]

    def run_step():
        holder[0] = scan.scan_steps_repeat(qd, holder[0], ref, ok,
                                           np.int32(0), N)
        _ = np.asarray(holder[0][0][0, 0, 0])

    t_t = timed("step", run_step)
    print(f"assemble {t_s - t_k:8.2f} ms/step (score - kernel)")
    print(f"merge    {t_t - t_s:8.2f} ms/step (step - score)")


if __name__ == "__main__":
    main()
