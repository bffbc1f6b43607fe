"""Pallas TPU kernel: sparse-delta image reconstruction via MXU.

The sparse-delta upload (ops/scan.delta_encode) ships a database batch
as ~10^2 (site, code) diffs per row against a shared base genome, ~10-50x
fewer H2D bytes than the 4-bit packed row.  The codes must be rebuilt on
device — but XLA's scatter/gather at (4096, 30k) scale is pathologically
slow on TPU (200ms-1.5s measured) and the scatter path even returns
wrong results on this backend at batch scale.

This kernel is the TPU-native scatter: factorise each site index
p = hi*128 + lo, build per-row one-hot factors
  A[h, e] = (value[e] + 64) if hi[e] == h else 0      (HI, E)
  B[l, e] = 1 if lo[e] == l else 0                    (128, E)
and paint the whole (HI, 128) row image with ONE int8 MXU matmul
X = A @ B^T: a cell gets value+64 where a diff lands (site uniqueness
per row makes sums collision-free) and 0 elsewhere, so
  image = where(X >= 64, X - 64, base).
Values are 6-bit: codes 0-15 plus the zero-run markers 16-47 that
scan.reconstruct_delta decodes in its unmask pass.
Sentinel-padded slots carry pos >= L with value 0: they either fall
past the padded image (hi >= HI, dropped by the one-hot) or write 0
into padding cells the caller slices off — both harmless.

~30M MACs per row (L=30k, E=1024) = ~0.7ms per 4096-row batch on the
v5e MXU vs ~200ms for XLA scatter.  No dynamic indexing anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(hi_max, rb, keys_ref, base_ref, out_ref):
    """One program rebuilds `rb` row images of shape (HI, 128)."""
    E = keys_ref.shape[1]
    base = base_ref[...].astype(jnp.int32)            # (HI, 128)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_max, E), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, E), 0)
    for r in range(rb):                               # static unroll
        k2 = keys_ref[pl.ds(r, 1), :]                 # (1, E) int32
        hi2 = k2 >> 13                                # pos >> 7
        lo2 = (k2 >> 6) & 127
        v64 = (k2 & 63) + 64       # 6-bit values: codes 0-15 + the
        a = jnp.where(iota_hi == hi2, v64, 0).astype(jnp.int8)  # run
        b = (iota_lo == lo2).astype(jnp.int8)         # markers 16-47
        x = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        img = jnp.where(x >= 64, x - 64, base)
        out_ref[pl.ds(r * hi_max, hi_max), :] = img.astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("n_sites", "out_width", "interpret"))
def reconstruct_image(pos: jnp.ndarray, val: jnp.ndarray,
                      base: jnp.ndarray, n_sites: int,
                      out_width: int | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, out_width) uint8 codes from per-row sorted unique diffs.

    pos (B, E) integer site positions (>= n_sites means padding),
    val (B, E) uint8 codes 0-15 or zero-run markers 16-47 (0 at
    padding; marker decode happens in scan.reconstruct_delta's unmask
    pass — this kernel just paints values), base (n_sites,) uint8.
    out_width defaults to n_sites; columns past n_sites are zero, so
    asking for the natural 128-padded width avoids a slice copy.
    """
    B, E = pos.shape
    hi_max = -(-n_sites // 128)
    l_pad = hi_max * 128
    w = n_sites if out_width is None else out_width
    rb = 8 if B % 8 == 0 else 1
    keys = (pos.astype(jnp.int32) << 6) | val.astype(jnp.int32)
    base_pad = jnp.pad(base, (0, l_pad - n_sites)).reshape(hi_max, 128)
    img = pl.pallas_call(
        functools.partial(_kernel, hi_max, rb),
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((rb, E), lambda i: (i, 0)),
            pl.BlockSpec((hi_max, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb * hi_max, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * hi_max, 128), jnp.uint8),
        interpret=interpret,
    )(keys, base_pad)
    img = img.reshape(B, l_pad)
    if w == l_pad:
        return img
    if w < l_pad:
        return img[:, :w]
    return jnp.pad(img, ((0, 0), (0, w - l_pad)))
