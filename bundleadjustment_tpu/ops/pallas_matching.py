"""Fused Pallas TPU kernel: Hamming distance + top-2 neighbor search.

The XLA path in `ops/matching.py` materializes the [M1, M2] distance matrix
in HBM before reducing it to the two nearest neighbors.  For descriptor
matching only the top-2 survive, so this kernel tiles BOTH axes through VMEM
and keeps a running (best, second-best, argmin) per query — the distance
matrix never leaves the chip:

  HBM traffic:  XLA path  ~ M1*M2*4 bytes written + read
                kernel    ~ M1*W*4 + M2*W*4 read, M1*3*4 written

Grid: (query tiles, train tiles), train-major; running state lives in VMEM
scratch across the train-tile axis (TPU grid execution is sequential per
core — the standard Pallas accumulation pattern).

Mosaic lowering constraints found on real v5e hardware (see git history):
- no reductions over unsigned ints -> popcount cast to int32 before sums;
- no value dynamic_slice -> static word unroll;
- 1-D s32 operands hit XLA/Mosaic layout mismatches -> all 1-D data travels
  as [N, 1] blocks;
- full [M1, tile, W] xor tensors / un-tiled query axes blow the scoped vmem
  budget -> word-at-a-time accumulation + 256x256 tiles.

Descriptors are packed uint32 words ([M, W], W=8 for 256-bit ORB-style).
Callers pass validity masks; the kernel writes +inf distance for invalid
train rows, and query-side masking happens in the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 256
TRAIN_TILE = 256


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _hamming_top2_kernel(qdesc_ref, tdesc_ref, tvalid_ref, best_ref, second_ref,
                         idx_ref, state):
    """Grid step (i, j): fold train tile j into query tile i's top-2 state."""
    j = pl.program_id(1)
    m1 = qdesc_ref.shape[0]
    tile = tdesc_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        state[:, 0] = jnp.full((m1,), jnp.inf, jnp.float32)
        state[:, 1] = jnp.full((m1,), jnp.inf, jnp.float32)
        state[:, 2] = jnp.full((m1,), -1.0, jnp.float32)

    q = qdesc_ref[:]  # [m1, W]
    t = tdesc_ref[:]  # [tile, W]
    w = q.shape[1]
    d = jnp.zeros((m1, tile), jnp.int32)
    for wi in range(w):
        x = q[:, wi][:, None] ^ t[:, wi][None, :]
        d = d + _popcount32(x).astype(jnp.int32)
    d = d.astype(jnp.float32)
    d = jnp.where(tvalid_ref[:, 0][None, :] != 0, d, jnp.inf)

    arg_local = jnp.argmin(d, axis=1)
    tile_best = jnp.min(d, axis=1)
    tile_arg = arg_local.astype(jnp.float32) + j * tile
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) == arg_local[:, None],
        jnp.inf,
        d,
    )
    tile_second = jnp.min(masked, axis=1)

    best = state[:, 0]
    second = state[:, 1]
    arg = state[:, 2]

    # merge running top-2 with tile top-2: with best<=second per pair, the
    # merged second-best is min(max(best, tile_best), second, tile_second)
    new_best = jnp.minimum(best, tile_best)
    new_arg = jnp.where(tile_best < best, tile_arg, arg)
    new_second = jnp.minimum(
        jnp.maximum(best, tile_best), jnp.minimum(second, tile_second)
    )
    state[:, 0] = new_best
    state[:, 1] = new_second
    state[:, 2] = new_arg

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        best_ref[:, 0] = state[:, 0]
        second_ref[:, 0] = state[:, 1]
        idx_ref[:, 0] = state[:, 2].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2_pallas(qdesc, tdesc, tvalid, interpret=False):
    """Fused top-2 Hamming search.  Returns (best [M1], second [M1], idx [M1]).

    qdesc: [M1, W] uint32; tdesc: [M2, W] uint32; tvalid: [M2] (1 = valid).
    Both axes are padded to tile multiples internally.
    """
    m1, w = qdesc.shape
    m2 = tdesc.shape[0]
    qpad = (-m1) % QUERY_TILE
    if qpad:
        qdesc = jnp.concatenate([qdesc, jnp.zeros((qpad, w), jnp.uint32)])
    tpad = (-m2) % TRAIN_TILE
    if tpad:
        tdesc = jnp.concatenate([tdesc, jnp.zeros((tpad, w), jnp.uint32)])
        tvalid = jnp.concatenate([tvalid, jnp.zeros((tpad,), tvalid.dtype)])
    m1p = qdesc.shape[0]
    m2p = tdesc.shape[0]
    n_q = m1p // QUERY_TILE
    n_t = m2p // TRAIN_TILE

    best, second, idx = pl.pallas_call(
        _hamming_top2_kernel,
        grid=(n_q, n_t),
        in_specs=[
            pl.BlockSpec((QUERY_TILE, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRAIN_TILE, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRAIN_TILE, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((QUERY_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QUERY_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((m1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((m1p, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((QUERY_TILE, 3), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qdesc, tdesc, tvalid.astype(jnp.int32)[:, None])
    return best[:m1, 0], second[:m1, 0], idx[:m1, 0]
