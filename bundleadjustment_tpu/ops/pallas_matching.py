"""Fused Pallas TPU kernel: Hamming distance + top-2 neighbor search.

The XLA path in `ops/matching.py` materializes the [M1, M2] distance matrix
in HBM before reducing it to the two nearest neighbors.  For descriptor
matching only the top-2 survive, so this kernel tiles the train set through
VMEM and keeps a running (best, second-best, argmin) per query — the
distance matrix never leaves the chip:

  HBM traffic:  XLA path  ~ M1*M2*4 bytes written + read
                kernel    ~ M1*W*4 + M2*W*4 read, M1*3*4 written

Grid: one program per train tile; queries stay resident in VMEM.  Running
state lives in VMEM scratch across grid steps (TPU grid execution is
sequential per core, so scratch carries state between iterations — the
standard Pallas accumulation pattern).

Descriptors are packed uint32 words ([M, W], W=8 for 256-bit ORB-style).
Padding rows must carry a sentinel descriptor; callers pass validity masks
and the kernel writes +inf distance for invalid queries / skips invalid
train rows via a large distance offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRAIN_TILE = 512


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _hamming_top2_kernel(qdesc_ref, tdesc_ref, tvalid_ref, best_ref, second_ref,
                         idx_ref, state):
    """Grid step j: fold train tile j into the running top-2 state.

    state: VMEM scratch [M1, 3] float32 rows = (best, second, best_idx).
    All 1-D quantities travel as [., 1] blocks — Mosaic rejects some 1-D
    layouts (XLA tiles s32[N] as (1024), Mosaic as (512)).
    """
    j = pl.program_id(0)
    m1 = qdesc_ref.shape[0]
    tile = tdesc_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        state[:, 0] = jnp.full((m1,), jnp.inf, jnp.float32)
        state[:, 1] = jnp.full((m1,), jnp.inf, jnp.float32)
        state[:, 2] = jnp.full((m1,), -1.0, jnp.float32)

    q = qdesc_ref[:]  # [M1, W]
    t = tdesc_ref[:]  # [tile, W]
    # all-pairs XOR popcount: [M1, tile]; cast to int32 before reducing
    # (Mosaic does not lower reductions over unsigned integers)
    x = q[:, None, :] ^ t[None, :, :]
    d = jnp.sum(_popcount32(x).astype(jnp.int32), axis=-1).astype(jnp.float32)
    # invalid train rows -> +inf
    d = jnp.where(tvalid_ref[:, 0][None, :] != 0, d, jnp.inf)

    # tile-local top-2
    tile_best = jnp.min(d, axis=1)
    tile_arg = jnp.argmin(d, axis=1).astype(jnp.float32) + j * tile
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        == jnp.argmin(d, axis=1)[:, None],
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

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        best_ref[:, 0] = state[:, 0]
        second_ref[:, 0] = state[:, 1]
        idx_ref[:, 0] = state[:, 2].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2_pallas(qdesc, tdesc, tvalid, interpret=False):
    """Fused top-2 Hamming search.  Returns (best [M1], second [M1], idx [M1]).

    qdesc: [M1, W] uint32; tdesc: [M2, W] uint32 (M2 padded to TRAIN_TILE);
    tvalid: [M2] int32 (1 = valid).
    """
    m1, w = qdesc.shape
    m2 = tdesc.shape[0]
    pad = (-m2) % TRAIN_TILE
    if pad:
        tdesc = jnp.concatenate([tdesc, jnp.zeros((pad, w), jnp.uint32)])
        tvalid = jnp.concatenate([tvalid, jnp.zeros((pad,), tvalid.dtype)])
    m2p = tdesc.shape[0]
    n_tiles = m2p // TRAIN_TILE

    best, second, idx = pl.pallas_call(
        _hamming_top2_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m1, w), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TRAIN_TILE, w), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TRAIN_TILE, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m1, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m1, 1), jnp.float32),
            jax.ShapeDtypeStruct((m1, 1), jnp.float32),
            jax.ShapeDtypeStruct((m1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((m1, 3), jnp.float32)],
        interpret=interpret,
    )(qdesc, tdesc, tvalid.astype(jnp.int32)[:, None])
    return best[:, 0], second[:, 0], idx[:, 0]
