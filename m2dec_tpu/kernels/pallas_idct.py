"""Pallas TPU kernel for the batched MPEG-2 8x8 IDCT.

The Phase-B hot loop: every coded block of a frame runs the exact-integer
Wang IDCT (kernels/mpeg2_idct.py). The XLA path already fuses this well;
this Pallas version is the hand-kernel tier (the reference's SH-asm/SSE2
slot, SURVEY.md §2.1) — it tiles the block batch through VMEM and runs
the identical integer math per tile, so results are bit-equal to the
`xp` implementation by construction.

Layout note: blocks are fed as [tile, 8, 8] int32. The natural TPU
layout would pack 16 blocks into a (8, 128) lane tile; that relayout is
a follow-up — correctness and the VMEM-resident tiling are what this
tier establishes.

Enable in the decode path with M2DEC_TPU_PALLAS=1 (off by default so
the persistently-cached plain executable keeps serving the bench).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .mpeg2_idct import idct8x8


def _idct_kernel(cin_ref, out_ref):
    out_ref[:] = idct8x8(cin_ref[:], jnp).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def idct8x8_pallas(coef, tile=512, interpret=None):
    """Batched exact-int IDCT: int [N, 8, 8] -> int32 [N, 8, 8].

    N is padded up to a multiple of `tile`; each grid step processes one
    VMEM-resident tile of blocks. `interpret=None` auto-selects interpret
    mode off-TPU (pallas_call only lowers natively on TPU/GPU backends).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "gpu")
    n = coef.shape[0]
    pad = (-n) % tile
    c = jnp.pad(coef.astype(jnp.int32), ((0, pad), (0, 0), (0, 0)))
    grid = (c.shape[0] // tile,)
    out = pl.pallas_call(
        _idct_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, 8, 8), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((tile, 8, 8), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(c.shape, jnp.int32),
        interpret=interpret,
    )(c)
    return out[:n]
