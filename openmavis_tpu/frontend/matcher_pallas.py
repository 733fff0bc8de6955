"""Fused Pallas TPU kernel: masked Hamming best-2 matching.

Computes, for each query descriptor row, the best and second-best Hamming
distance over all target descriptors (plus an additive penalty matrix for
masking), WITHOUT materializing the [N, M] distance matrix in HBM: each
[TILE_N, TILE_M] distance tile is produced on the MXU and immediately folded
into running (best, second) accumulators held in VMEM.

This is the Pallas form of the reference's ORBmatcher inner loops
(src/ORBmatcher.cc SearchByProjection / SearchByBoW): the grid-cell /
BoW-node candidate structure becomes the additive penalty input.

Encoding: distances and column indices are packed into one f32
(dist * 2^15 + col, exact for col < 32768 with dist clamped to INVALID=300,
since 300 * 2^15 + 32767 fits f32's 24-bit mantissa), so min-reduction
yields argmin with deterministic smallest-index tie-breaking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = 300.0          # sentinel distance for masked / absent targets
# index packing base: supports M <= 32768 targets; dist*_PACK + col stays
# exact in f32's 24-bit mantissa (300*32768 + 32767 < 2^24)
_PACK = 32768.0

TILE_N = 256
TILE_M = 512


def _kernel(d1_ref, d2_ref, pen_ref, out_best_ref, out_second_ref,
            best_acc, second_acc):
    i = pl.program_id(0)      # query tile
    j = pl.program_id(1)      # target tile
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_acc[:] = jnp.full_like(best_acc, INVALID * _PACK)
        second_acc[:] = jnp.full_like(second_acc, INVALID * _PACK)

    a = d1_ref[:]                                   # [TILE_N, 256] bf16
    b = d2_ref[:]                                   # [TILE_M, 256] bf16
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # explicit: the package-global "highest" matmul precision would ask
        # Mosaic for an fp32-contract bf16 matmul, which it rejects
        precision=jax.lax.Precision.DEFAULT)        # [TILE_N, TILE_M]
    s1 = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
    s2 = jnp.sum(b.astype(jnp.float32), axis=1, keepdims=True)
    dist = s1 + s2.T - 2.0 * dot + pen_ref[:]
    dist = jnp.minimum(dist, INVALID)

    cols = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
            .astype(jnp.float32) + (j * TILE_M).astype(jnp.float32))
    comb = dist * _PACK + cols                      # [TILE_N, TILE_M]

    # per-tile best and second-best (over columns)
    tile_best = jnp.min(comb, axis=1, keepdims=True)         # [TILE_N, 1]
    masked = jnp.where(comb <= tile_best, jnp.inf, comb)
    tile_second = jnp.min(masked, axis=1, keepdims=True)

    # fold into running accumulators
    b0 = best_acc[:]
    s0 = second_acc[:]
    new_best = jnp.minimum(b0, tile_best)
    new_second = jnp.minimum(jnp.minimum(s0, tile_second),
                             jnp.maximum(b0, tile_best))
    best_acc[:] = new_best
    second_acc[:] = new_second

    @pl.when(j == nj - 1)
    def _():
        out_best_ref[:] = best_acc[:]
        out_second_ref[:] = second_acc[:]


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("interpret",))
def masked_best2_fused(d1: jnp.ndarray, d2: jnp.ndarray,
                       penalty: jnp.ndarray, interpret: bool = False):
    """Fused best-2 Hamming search.

    Args:
      d1: [N, 256] {0,1} (any int/float dtype) query descriptors.
      d2: [M, 256] target descriptors.
      penalty: [N, M] f32 additive penalty (0 = admissible, >= INVALID to
        forbid; callers encode window/level/validity masks here).
      interpret: run the kernel in the Pallas interpreter (CPU CI coverage
        of the TPU-only matcher path; tests/test_matcher_pallas.py).
    Returns:
      (best_idx [N] int32, best [N] int32, second [N] int32) — rows with no
      admissible target give best == second == INVALID.
    """
    n, m = d1.shape[0], d2.shape[0]
    n_pad = max(TILE_N, -(-n // TILE_N) * TILE_N)
    m_pad = max(TILE_M, -(-m // TILE_M) * TILE_M)
    a = _pad_to(d1.astype(jnp.bfloat16), n_pad, 0)
    b = _pad_to(d2.astype(jnp.bfloat16), m_pad, 0)
    pen = _pad_to(_pad_to(penalty.astype(jnp.float32), n_pad, 0,
                          value=INVALID), m_pad, 1, value=INVALID)

    grid = (n_pad // TILE_N, m_pad // TILE_M)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
    ]
    best, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 256), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE_N, 1), jnp.float32),
            pltpu.VMEM((TILE_N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, pen)

    best = best[:n, 0]
    second = second[:n, 0]
    best_idx = jnp.mod(best, _PACK).astype(jnp.int32)
    best_val = (best // _PACK).astype(jnp.int32)
    second_val = (second // _PACK).astype(jnp.int32)
    return best_idx, best_val, second_val
