"""Pallas Cholesky + solve for the dense Schur camera system.

XLA's `cho_factor`/`cho_solve` on a [6K, 6K] SPD matrix (384x384 at 64
cameras) costs ~0.13 ms per LM iteration on v5e (round-4 in-scan probe:
0.355 vs 0.227 ms/iter with the factor+solve stubbed) — blocked While
loops with HBM round trips per panel and sequential triangular solves.
This kernel runs the whole factor + forward/backward substitution in ONE
VMEM-resident pass over 8-row panels:

- right-looking block Cholesky, 8 rows per step: extract the panel row
  with a one-hot mask-dot (no dynamic slicing — Mosaic-friendly), factor
  the 8x8 diagonal block with a statically-unrolled column sweep, invert
  it by unrolled forward substitution, then rank-8 update the residual on
  the MXU.  Subtracting the FULL outer product annihilates processed rows
  and columns, so no trailing-submatrix bookkeeping is needed.
- forward/backward substitution in 8-row blocks against the stored
  block-inverse diagonal factors, maintaining the running residual with
  [8, N] mask-dots.

STATUS (round 4, measured): correct to f32 (4e-7 rel vs f64 at N=384,
compiled v5e) but SLOWER in-scan than XLA's cho_factor/cho_solve —
0.41 ms vs 0.17 ms per LM iteration at N=384 (scan-length LSQ fits of
the full dense solve with each variant).  The mask-dot row extraction
(needed because Mosaic lacks general dynamic sublane slicing) multiplies
the per-step matmul work ~4x, and 3*(N/8) sequential fori steps carry
their own overhead; N=768 additionally exceeds the 16 MB VMEM scoped
limit (R + L^T copies).  Kept as a tested experiment, NOT wired into
`dense_ba.solve_fused` — the XLA path stays.  A future variant would
need aligned dynamic slicing or in-place factorization to win.

The Ceres analogue is the DENSE_SCHUR factorization step
(`ba_project/src/ba/Optimizer.cpp:80-90`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-20


def _chol8_inv(D):
    """Statically-unrolled Cholesky of an 8x8 SPD block + inverse of the
    factor.  Returns (LT [8,8] upper = L^T, Linv [8,8] lower = L^-1)."""
    rows = []
    R = D
    for c in range(8):
        dcc = R[c:c + 1, c:c + 1]
        r = R[c:c + 1, :] / jnp.sqrt(jnp.maximum(dcc, _EPS))
        # annihilation keeps columns < c zero in exact arithmetic; mask for
        # numerical hygiene
        col_ok = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) >= c)
        r = jnp.where(col_ok, r, 0.0)
        rows.append(r)
        R = R - jax.lax.dot_general(
            r, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    LT = jnp.concatenate(rows, axis=0)  # [8, 8], upper triangular

    # forward substitution on the identity: L X = I with L = LT^T
    xrows = []
    for c in range(8):
        eye_row = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                   == c).astype(jnp.float32)
        acc = eye_row
        for k in range(c):
            acc = acc - LT[k:k + 1, c:c + 1] * xrows[k]
        xrows.append(acc / jnp.maximum(LT[c:c + 1, c:c + 1], _EPS))
    Linv = jnp.concatenate(xrows, axis=0)  # [8, 8], lower triangular
    return LT, Linv


def _chol_solve_kernel(s_ref, b_ref, x_ref, *, N):
    f32 = jnp.float32
    NB = N // 8
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (N, 8), 0)
    iota_c8 = jax.lax.broadcasted_iota(jnp.int32, (N, 8), 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    def sel_of(j):
        return (iota_r - 8 * j == iota_c8).astype(f32)  # [N, 8] one-hot

    # ---- factor: R -> sum_j A_j^T A_j with A_j = Linv_jj @ row_j ----
    def factor_step(j, carry):
        R, LTm, LinvS = carry
        sel = sel_of(j)
        row = jax.lax.dot_general(
            sel, R, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, N]
        D = jax.lax.dot_general(
            row, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, 8]
        _, Linv = _chol8_inv(D)
        A = jax.lax.dot_general(
            Linv, row, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, N]
        A = jnp.where(iota_n >= 8 * j, A, 0.0)
        R = R - jax.lax.dot_general(
            A, A, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        LTm = LTm + jax.lax.dot_general(
            sel, A, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        LinvS = LinvS + jax.lax.dot_general(
            sel, Linv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        return R, LTm, LinvS

    R0 = s_ref[...]
    LTm, LinvS = jax.lax.fori_loop(
        0, NB, factor_step,
        (R0, jnp.zeros((N, N), f32), jnp.zeros((N, 8), f32)))[1:]

    # ---- forward: L y = b (L = LTm^T), 8-row blocks ----
    def fwd_step(j, carry):
        res, y = carry
        sel = sel_of(j)
        rj = jax.lax.dot_general(
            res, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [1, 8]
        Linv_j = jax.lax.dot_general(
            sel, LinvS, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, 8]
        yj = jax.lax.dot_general(
            rj, Linv_j, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [1, 8]
        Aj = jax.lax.dot_general(
            sel, LTm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, N]
        res = res - jax.lax.dot_general(
            yj, Aj, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        y = y + jax.lax.dot_general(
            yj, sel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        return res, y

    b = b_ref[0:1, :]
    _, y = jax.lax.fori_loop(
        0, NB, fwd_step, (b, jnp.zeros((1, N), f32)))

    # ---- backward: L^T x = y, blocks in reverse ----
    def bwd_step(jj, x):
        j = NB - 1 - jj
        sel = sel_of(j)
        Aj = jax.lax.dot_general(
            sel, LTm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, N]
        t = jax.lax.dot_general(
            x, Aj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [1, 8]
        yj = jax.lax.dot_general(
            y, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [1, 8]
        Linv_j = jax.lax.dot_general(
            sel, LinvS, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [8, 8]
        xj = jax.lax.dot_general(
            yj - t, Linv_j, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)  # [1, 8]
        return x + jax.lax.dot_general(
            xj, sel, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    x = jax.lax.fori_loop(0, NB, bwd_step, jnp.zeros((1, N), f32))
    x_ref[...] = jnp.broadcast_to(x, (8, N))


@partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_solve(S, b, interpret=False):
    """Solve S x = b for SPD S [N, N] (N a multiple of 8), b [N].

    One VMEM pass; numerics match cho_factor/cho_solve to factorization
    reassociation (all f32).
    """
    N = S.shape[0]
    assert N % 8 == 0, N
    b2 = jnp.broadcast_to(b.reshape(1, N), (8, N))
    kern = partial(_chol_solve_kernel, N=N)
    x = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        interpret=interpret,
    )(S.astype(jnp.float32), b2.astype(jnp.float32))
    return x[0]
