"""Pallas-fused eval+assembly for the dense landmark-major BA engine.

One kernel pass per LM iteration replaces the whole XLA chain
`_eval_cm` -> `_assemble_cm` in `solvers/dense_ba.py` (the reference
analogue is Ceres' autodiff residual evaluation + normal-equation
assembly inside `ceres::Solve`, `ba_project/src/ba/Optimizer.cpp:242`):

  projection -> residuals -> Huber weights -> analytic Jacobians ->
  27 symmetric camera rows + cost row -> per-camera one-hot MXU reduce,
  plus the point-side Vu/g_p/W blocks,

all tiled through VMEM over the landmark axis.  The XLA path materializes
~100 [O, L] intermediate planes in HBM per iteration (every jnp.stack is a
round trip); here only the kernel inputs (5 planes), the W output (18
planes), and Vu/g_p/red leave VMEM.  BASELINE.md's round-2 roofline showed
exactly this elementwise/[O,L] stage — not the MXU Schur math — capping
marginal MFU at ~6%.

The camera gather (pose table -> per-observation rotation rows) and the
camera reduction both ride the MXU against an in-VMEM one-hot built from
cam_t, so the kernel needs no TPU gather/scatter support.

Numerics match the XLA path to matmul reassociation (all f32, MXU with f32
accumulation); parity is tested in tests/test_pallas_dense_eval.py both in
interpret mode (CPU) and compiled (TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bundleadjustment_tpu.solvers.lm import CHEIRALITY_PENALTY
from bundleadjustment_tpu.solvers.residuals import HUBER_DELTA

_TRIU6 = [(i, j) for i in range(6) for j in range(i, 6)]  # 21 unique entries
_TRIU3 = [(i, j) for i in range(3) for j in range(i, 3)]  # 6 unique entries

# rows emitted per tile into the camera-side reduce: 21 U + 6 g_c + 1 cost
N_ROWS = 28


def _kernel(k4_ref, rt_ref, cam_ref, uv_ref, isig_ref, mval_ref, mfree_ref,
            xt_ref, red_ref, vu_ref, gp_ref, w_ref, *, O, LT, K, robust):
    f32 = jnp.float32
    fx, fy, cx, cy = (k4_ref[0, 0], k4_ref[0, 1], k4_ref[0, 2], k4_ref[0, 3])

    cam = cam_ref[...]  # [O, LT] int32
    # one-hot camera membership [K, N], N = O*LT (flatten is a relayout, the
    # lane dim changes, but it's one ~N*4B VMEM copy per tile)
    cam_flat = cam.reshape(1, O * LT)
    oh_t = (jax.lax.broadcasted_iota(jnp.int32, (K, O * LT), 0)
            == cam_flat).astype(f32)  # [K, N]

    # gather pose rows per observation: [12, K] @ [K, N] -> [12, N]
    g = jax.lax.dot_general(
        rt_ref[...], oh_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(12, O, LT)

    X0 = xt_ref[0, :][None, :]  # [1, LT] -> broadcasts over O
    X1 = xt_ref[1, :][None, :]
    X2 = xt_ref[2, :][None, :]
    _eval_tile_body(fx, fy, cx, cy, g, X0, X1, X2, uv_ref, isig_ref,
                    mval_ref, mfree_ref, oh_t, red_ref, vu_ref, gp_ref,
                    w_ref, O=O, LT=LT, K=K, robust=robust)


def _kernel_bs(k4_ref, rtdc_ref, cam_ref, uv_ref, isig_ref, mval_ref,
               mfree_ref, xt_ref, wprev_ref, vinv_ref, gpprev_ref, ptv_ref,
               red_ref, vu_ref, gp_ref, w_ref, xtnew_ref, *, O, LT, K,
               robust):
    """Eval+assembly with FUSED landmark back-substitution: the trial point
    Xt_new = Xt - V^-1 (g_p + W^T oh^T dc) is computed per tile from the
    previous iteration's carried blocks, then evaluated — the XLA backsub
    (one-hot gather materializing [6,O,L] + a separate W read) disappears
    into the same VMEM pass, and the camera-row gather happens ONCE for the
    12 pose rows and the 6 dc rows together."""
    f32 = jnp.float32
    fx, fy, cx, cy = (k4_ref[0, 0], k4_ref[0, 1], k4_ref[0, 2], k4_ref[0, 3])

    cam = cam_ref[...]  # [O, LT]
    cam_flat = cam.reshape(1, O * LT)
    oh_t = (jax.lax.broadcasted_iota(jnp.int32, (K, O * LT), 0)
            == cam_flat).astype(f32)  # [K, N]

    # gather pose rows AND camera-update rows per observation in one dot
    g18 = jax.lax.dot_general(
        rtdc_ref[...], oh_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).reshape(18, O, LT)
    g = g18[:12]
    dcg = [g18[12 + i] for i in range(6)]  # per-obs camera step [O, LT]

    # y_j = sum_{o,i} W_prev[i,j,o,l] dcg[i,o,l]
    Wp = wprev_ref[...]  # [18, O, LT]
    y = [jnp.sum(sum(Wp[i * 3 + j] * dcg[i] for i in range(6)), axis=0)
         for j in range(3)]  # 3 x [LT]
    a0 = gpprev_ref[0] + y[0]
    a1 = gpprev_ref[1] + y[1]
    a2 = gpprev_ref[2] + y[2]
    v00, v01, v02 = vinv_ref[0], vinv_ref[1], vinv_ref[2]
    v11, v12, v22 = vinv_ref[3], vinv_ref[4], vinv_ref[5]
    ptv = ptv_ref[0, :] > 0.5
    zero = jnp.zeros_like(a0)
    dp0 = jnp.where(ptv, -(v00 * a0 + v01 * a1 + v02 * a2), zero)
    dp1 = jnp.where(ptv, -(v01 * a0 + v11 * a1 + v12 * a2), zero)
    dp2 = jnp.where(ptv, -(v02 * a0 + v12 * a1 + v22 * a2), zero)
    Xn0 = xt_ref[0, :] + dp0
    Xn1 = xt_ref[1, :] + dp1
    Xn2 = xt_ref[2, :] + dp2
    xtnew_ref[...] = jnp.stack([Xn0, Xn1, Xn2])

    _eval_tile_body(fx, fy, cx, cy, g, Xn0[None, :], Xn1[None, :],
                    Xn2[None, :], uv_ref, isig_ref, mval_ref, mfree_ref,
                    oh_t, red_ref, vu_ref, gp_ref, w_ref, O=O, LT=LT, K=K,
                    robust=robust)


def _eval_tile_body(fx, fy, cx, cy, g, X0, X1, X2, uv_ref, isig_ref,
                    mval_ref, mfree_ref, oh_t, red_ref, vu_ref, gp_ref,
                    w_ref, *, O, LT, K, robust):
    f32 = jnp.float32
    RX = [g[3 * i + 0] * X0 + g[3 * i + 1] * X1 + g[3 * i + 2] * X2
          for i in range(3)]
    x0 = RX[0] + g[9]
    x1 = RX[1] + g[10]
    z = RX[2] + g[11]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs

    isig = isig_ref[...]
    u = fx * x0 * inv_z + cx
    v = fy * x1 * inv_z + cy
    r0 = (u - uv_ref[0]) * isig
    r1 = (v - uv_ref[1]) * isig

    r2 = r0 * r0 + r1 * r1
    if robust:
        nrm2 = jnp.sqrt(jnp.maximum(r2, 1e-20))
        rho = jnp.where(nrm2 <= HUBER_DELTA, 0.5 * r2,
                        HUBER_DELTA * (nrm2 - 0.5 * HUBER_DELTA))
    else:
        rho = 0.5 * r2
    rho = jnp.where(z > 1e-6, rho, CHEIRALITY_PENALTY)
    mval = mval_ref[...]
    rho = rho * mval  # masked cost contributions (row 27 of the reduce)

    # analytic Jacobians (same component math as dense_ba._eval_cm)
    a = fx * inv_z * isig
    b = fy * inv_z * isig
    zero = jnp.zeros_like(a)
    duv = [[a, zero, -a * x0 * inv_z],
           [zero, b, -b * x1 * inv_z]]  # [2][3] of [O, LT]
    ns = [[zero, RX[2], -RX[1]],
          [-RX[2], zero, RX[0]],
          [RX[1], -RX[0], zero]]  # neg_skew(RX)
    J_phi = [[sum(duv[al][m] * ns[m][j] for m in range(3)) for j in range(3)]
             for al in range(2)]
    Jp = [[sum(duv[al][m] * g[3 * m + j] for m in range(3)) for j in range(3)]
          for al in range(2)]
    Jc = [J_phi[0] + duv[0], J_phi[1] + duv[1]]  # [2][6]

    mask = mval * (z > 1e-6).astype(f32)
    w = mask
    if robust:
        nrm = jnp.sqrt(jnp.maximum(r2, 1e-24))
        w = w * jnp.where(nrm <= HUBER_DELTA, 1.0, HUBER_DELTA / nrm)
    sw = jnp.sqrt(w)
    r0 = r0 * sw * mask
    r1 = r1 * sw * mask
    sw_free = sw * mfree_ref[...]
    Jc = [[Jc[al][i] * sw_free for i in range(6)] for al in range(2)]
    Jp = [[Jp[al][j] * sw for j in range(3)] for al in range(2)]

    # camera-side rows: 21 U + 6 g_c + 1 cost -> [28, N] @ oh -> [28, K]
    rows = [Jc[0][i] * Jc[0][j] + Jc[1][i] * Jc[1][j] for i, j in _TRIU6]
    rows += [Jc[0][i] * r0 + Jc[1][i] * r1 for i in range(6)]
    rows += [rho]
    stacked = jnp.stack(rows).reshape(N_ROWS, O * LT)
    contrib = jax.lax.dot_general(
        stacked, oh_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [28, K]

    @pl.when(pl.program_id(0) == 0)
    def _():
        red_ref[...] = contrib

    @pl.when(pl.program_id(0) != 0)
    def _():
        red_ref[...] += contrib

    # point-side blocks (landmark-local, written per tile)
    vu_ref[...] = jnp.stack([
        jnp.sum(Jp[0][i] * Jp[0][j] + Jp[1][i] * Jp[1][j], axis=0)
        for i, j in _TRIU3
    ])  # [6, LT]
    gp_ref[...] = jnp.stack([
        jnp.sum(Jp[0][i] * r0 + Jp[1][i] * r1, axis=0) for i in range(3)
    ])  # [3, LT]
    w_ref[...] = jnp.stack([
        Jc[0][i] * Jp[0][j] + Jc[1][i] * Jp[1][j]
        for i in range(6) for j in range(3)
    ])  # [18, O, LT]


def _pick_tile(O, L):
    """Lane-tile size over the landmark axis: target ~8k obs per tile."""
    lt = max(128, 8192 // max(O, 1))
    lt = min(lt, 2048)
    return ((lt + 127) // 128) * 128


@partial(jax.jit, static_argnames=("robust", "interpret"))
def fused_eval_assemble(K4, cam_t, uv_t, inv_sigma_t, valid_t, fixed_t,
                        R, t, Xt, robust=True, interpret=False):
    """Fused eval+assembly over component-major observation planes.

    Inputs mirror dense_ba._CM fields; R [K,3,3], t [K,3], Xt [3,L].
    Returns (cost, red [K,27], Vu [6,L], g_p [3,L], W [6,3,O,L]) — exactly
    the tuple `_assemble_cm` produces plus the psum-ready cost.
    """
    O, L = cam_t.shape
    K = R.shape[0]
    LT = _pick_tile(O, L)
    Lp = ((L + LT - 1) // LT) * LT
    pad = Lp - L

    f32 = jnp.float32
    mval = valid_t.astype(f32)
    mfree = 1.0 - fixed_t.astype(f32)
    if pad:
        padL = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        cam_t = padL(cam_t)
        uv_t = padL(uv_t)
        inv_sigma_t = padL(inv_sigma_t)
        mval = padL(mval)
        mfree = padL(mfree)
        Xt = padL(Xt)

    rt_T = jnp.concatenate([R.reshape(K, 9), t], axis=1).T  # [12, K]
    k4 = jnp.asarray(K4, f32).reshape(1, 4)

    grid = (Lp // LT,)
    kern = partial(_kernel, O=O, LT=LT, K=K, robust=robust)
    red, Vu, g_p, W = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((12, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_ROWS, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_ROWS, K), f32),
            jax.ShapeDtypeStruct((6, Lp), f32),
            jax.ShapeDtypeStruct((3, Lp), f32),
            jax.ShapeDtypeStruct((18, O, Lp), f32),
        ],
        interpret=interpret,
    )(k4, rt_T, cam_t, uv_t.astype(f32), inv_sigma_t.astype(f32),
      mval, mfree, Xt.astype(f32))

    cost = jnp.sum(red[27])
    red_out = red[:27].T  # [K, 27]
    if pad:
        Vu = Vu[:, :L]
        g_p = g_p[:, :L]
        W = W[:, :, :L]
    return cost, red_out, Vu, g_p, W.reshape(6, 3, O, L)


@partial(jax.jit, static_argnames=("robust", "interpret"))
def fused_eval_assemble_bs(K4, cam_t, uv_t, inv_sigma_t, valid_t, fixed_t,
                           R, t, dc, Xt, W18_prev, vinv6, gp_prev, pt_valid,
                           robust=True, interpret=False):
    """`fused_eval_assemble` with the landmark back-substitution fused in.

    dc [K,6] is the camera step from the Schur solve; Xt is the CURRENT
    point block; the kernel forms the trial Xt_new per tile from the carried
    (W18_prev, vinv6, gp_prev) and evaluates there.  Returns
    (cost, red [K,27], Vu, g_p, W, Xt_new [3,L]).
    """
    O, L = cam_t.shape
    K = R.shape[0]
    LT = _pick_tile(O, L)
    Lp = ((L + LT - 1) // LT) * LT
    pad = Lp - L

    f32 = jnp.float32
    mval = valid_t.astype(f32)
    mfree = 1.0 - fixed_t.astype(f32)
    ptv = pt_valid.astype(f32).reshape(1, L)
    W18_prev = W18_prev.astype(f32)
    vinv6 = vinv6.astype(f32)
    gp_prev = gp_prev.astype(f32)
    if pad:
        padL = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        cam_t = padL(cam_t)
        uv_t = padL(uv_t)
        inv_sigma_t = padL(inv_sigma_t)
        mval = padL(mval)
        mfree = padL(mfree)
        Xt = padL(Xt)
        W18_prev = padL(W18_prev)
        vinv6 = padL(vinv6)
        gp_prev = padL(gp_prev)
        ptv = padL(ptv)

    rtdc = jnp.concatenate([R.reshape(K, 9), t, dc], axis=1).T  # [18, K]
    k4 = jnp.asarray(K4, f32).reshape(1, 4)

    grid = (Lp // LT,)
    kern = partial(_kernel_bs, O=O, LT=LT, K=K, robust=robust)
    red, Vu, g_p, W, Xt_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((18, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_ROWS, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_ROWS, K), f32),
            jax.ShapeDtypeStruct((6, Lp), f32),
            jax.ShapeDtypeStruct((3, Lp), f32),
            jax.ShapeDtypeStruct((18, O, Lp), f32),
            jax.ShapeDtypeStruct((3, Lp), f32),
        ],
        interpret=interpret,
    )(k4, rtdc, cam_t, uv_t.astype(f32), inv_sigma_t.astype(f32),
      mval, mfree, Xt.astype(f32), W18_prev, vinv6, gp_prev, ptv)

    cost = jnp.sum(red[27])
    red_out = red[:27].T
    if pad:
        Vu = Vu[:, :L]
        g_p = g_p[:, :L]
        W = W[:, :, :L]
        Xt_new = Xt_new[:, :L]
    return cost, red_out, Vu, g_p, W.reshape(6, 3, O, L), Xt_new


def fused_eval_supported(O, L, K):
    """Conservative gate: VMEM budget for the one-hot + plane working set.

    Budgets the LARGER `_kernel_bs` footprint (the fused LM step always
    runs `fused_eval_assemble_bs` after the seed eval): on top of kernel
    1's one-hot + rows + planes + W output, the bs kernel reads the
    [18, O, LT] carried W_prev, gathers 18 camera rows instead of 12
    (+6 [O, LT] planes), and writes Xt_new (round-4 advisor finding —
    shapes near the gate boundary must not fail Mosaic compilation instead
    of falling back to XLA)."""
    if K > 128 or O > 64:
        return False
    LT = _pick_tile(O, L)
    n = O * LT
    # one-hot [K, N] + rows [28, N] + ~45 [O, LT] planes + W output
    # + W_prev input (18n) + wider gather (6n); small [*, LT] vectors
    # (vinv6/gp_prev/ptv/Xt/Xt_new ~ 16*LT) round up to 1n
    vmem = (K * n + N_ROWS * n + 45 * n + 18 * n + 18 * n + 6 * n + n) * 4
    return vmem < 12 * 1024 * 1024


# ---------------------------------------------------------------------------
# kernel 2: per-iteration Schur-side prepare
# ---------------------------------------------------------------------------
# Fuses what remains [O, L]-elementwise in each LM iteration of the dense
# solve once the eval+assembly kernel carries red/Vu/g_p/W: damping V,
# closed-form V^-1 and chol(V^-1), zv = V^-1 g_p, G = W @ chol(V^-1), the
# rhs reduce rows (W zv), all in one VMEM pass over the landmark tiles.
# The XLA version of just the G build measured ~0.3 ms at 64 cams/10k lm
# (nested jnp.stack copies); this kernel is HBM-minimal: read W once, write
# G once.

N_RHS_ROWS = 8  # 6 used + 2 sublane padding


def _schur_kernel(lam_ref, vu_ref, gp_ref, ptv_ref, w_ref, cam_ref,
                  g_out, zv_out, vinv_out, red6_ref, *, O, LT, K):
    f32 = jnp.float32
    lam = lam_ref[0, 0]

    # damped V from the 6 unique rows (order: 00,01,02,11,12,22), identity
    # for invalid landmarks — matches _damp_blocks_cm + _sym3_inv_cm
    ptv = ptv_ref[0, :] > 0.5  # [LT]
    v00, v01, v02 = vu_ref[0], vu_ref[1], vu_ref[2]
    v11, v12, v22 = vu_ref[3], vu_ref[4], vu_ref[5]
    v00 = v00 + lam * jnp.clip(v00, 1e-6, None)
    v11 = v11 + lam * jnp.clip(v11, 1e-6, None)
    v22 = v22 + lam * jnp.clip(v22, 1e-6, None)
    one = jnp.ones_like(v00)
    zero = jnp.zeros_like(v00)
    v00 = jnp.where(ptv, v00, one)
    v11 = jnp.where(ptv, v11, one)
    v22 = jnp.where(ptv, v22, one)
    v01 = jnp.where(ptv, v01, zero)
    v02 = jnp.where(ptv, v02, zero)
    v12 = jnp.where(ptv, v12, zero)

    # closed-form symmetric inverse (same formulas as _sym3_inv_cm)
    A = v11 * v22 - v12 * v12
    B = v02 * v12 - v01 * v22
    Cc = v01 * v12 - v02 * v11
    det = v00 * A + v01 * B + v02 * Cc
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    D = v00 * v22 - v02 * v02
    E = v01 * v02 - v00 * v12
    F = v00 * v11 - v01 * v01
    i00, i01, i02 = A * inv_det, B * inv_det, Cc * inv_det
    i11, i12, i22 = D * inv_det, E * inv_det, F * inv_det
    vinv_out[...] = jnp.stack([i00, i01, i02, i11, i12, i22])

    # chol(V^-1) lower factor (same formulas as _chol3_cm)
    l00 = jnp.sqrt(jnp.maximum(i00, 1e-20))
    l10 = i01 / l00
    l20 = i02 / l00
    l11 = jnp.sqrt(jnp.maximum(i11 - l10 * l10, 1e-20))
    l21 = (i12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(i22 - l20 * l20 - l21 * l21, 1e-20))
    C = [[l00, zero, zero], [l10, l11, zero], [l20, l21, l22]]

    gp = [gp_ref[0], gp_ref[1], gp_ref[2]]
    zv = [i00 * gp[0] + i01 * gp[1] + i02 * gp[2],
          i01 * gp[0] + i11 * gp[1] + i12 * gp[2],
          i02 * gp[0] + i12 * gp[1] + i22 * gp[2]]
    zv_out[...] = jnp.stack(zv)

    # G[i,m] = sum_j W[i,j] C[j][m]; W rows packed i*3+j, broadcast [LT]->O
    W = w_ref[...]  # [18, O, LT]
    g_out[...] = jnp.stack([
        sum(W[i * 3 + j] * C[j][m][None, :] for j in range(3))
        for i in range(6) for m in range(3)
    ])

    # rhs reduce rows: (W zv)[i,o,l] -> one-hot reduce over cameras
    wz = [sum(W[i * 3 + j] * zv[j][None, :] for j in range(3))
          for i in range(6)]
    wz += [jnp.zeros_like(wz[0])] * (N_RHS_ROWS - 6)
    stacked = jnp.stack(wz).reshape(N_RHS_ROWS, O * LT)
    cam_flat = cam_ref[...].reshape(1, O * LT)
    oh_t = (jax.lax.broadcasted_iota(jnp.int32, (K, O * LT), 0)
            == cam_flat).astype(f32)
    contrib = jax.lax.dot_general(
        stacked, oh_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [8, K]

    @pl.when(pl.program_id(0) == 0)
    def _():
        red6_ref[...] = contrib

    @pl.when(pl.program_id(0) != 0)
    def _():
        red6_ref[...] += contrib


@partial(jax.jit, static_argnames=("n_cams", "interpret"))
def fused_schur_prepare(lam, Vu, g_p, pt_valid, W18, cam_t, n_cams,
                        interpret=False):
    """Per-iteration Schur-side prepare on the carried reduced blocks.

    W18: [18, O, L] (the carry's W reshaped).  Returns
    (G [18,O,L], zv [3,L], vinv6 [6,L], red6 [K,6]) where red6 is the
    one-hot-reduced (W zv) term of the camera rhs and vinv6 packs the
    damped V^-1 upper triangle (00,01,02,11,12,22).
    """
    O, L = cam_t.shape
    K = n_cams
    LT = _pick_tile(O, L)
    Lp = ((L + LT - 1) // LT) * LT
    pad = Lp - L

    f32 = jnp.float32
    ptv = pt_valid.astype(f32).reshape(1, L)
    Vu = Vu.astype(f32)
    g_p = g_p.astype(f32)
    if pad:
        padL = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        Vu = padL(Vu)
        g_p = padL(g_p)
        ptv = padL(ptv)
        W18 = padL(W18)
        cam_t = padL(cam_t)

    lam2 = jnp.asarray(lam, f32).reshape(1, 1)
    grid = (Lp // LT,)
    kern = partial(_schur_kernel, O=O, LT=LT, K=K)
    G, zv, vinv6, red6 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((18, O, LT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_RHS_ROWS, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((18, O, Lp), f32),
            jax.ShapeDtypeStruct((3, Lp), f32),
            jax.ShapeDtypeStruct((6, Lp), f32),
            jax.ShapeDtypeStruct((N_RHS_ROWS, K), f32),
        ],
        interpret=interpret,
    )(lam2, Vu, g_p, ptv, W18, cam_t)

    if pad:
        G = G[:, :, :L]
        zv = zv[:, :L]
        vinv6 = vinv6[:, :L]
    return G, zv, vinv6, red6[:6].T


# ---------------------------------------------------------------------------
# kernel 3: Schur prepare + S accumulation (QQ^T) in one VMEM pass
# ---------------------------------------------------------------------------
# Round-3 attribution (scan-length LSQ fits, v5e, 64 cams / 10k landmarks):
# the XLA Pf build + QQ^T cost 0.347 ms of the 0.65 ms LM iteration — all
# HBM traffic: Pf [L,K,6,3] is a 46 MB materialization written then read
# twice, plus the [K,O,L] one-hot.  This kernel keeps Q entirely in VMEM:
# per landmark tile it runs the full schur-prepare math (damped V, V^-1,
# chol(V^-1), zv, G = W chol, rhs rows), expands Q[(k,i),(m,l)] =
# sum_o oh[k,o,l] G[i,m,o,l] into a [6K, 3*LT] block, and accumulates
# S += Q_tile Q_tile^T on the MXU.  Only S [6K,6K], the rhs rows, and the
# small per-landmark vectors leave the kernel.  Replaces the Ceres
# DENSE_SCHUR elimination (`ba_project/src/ba/Optimizer.cpp:80-90`).


def _schur_s_kernel(lam_ref, *refs, O, LT, K, s_bf16, fold_u):
    """fold_u=True additionally receives the UNDAMPED reduced camera rows
    red [27, K] (21 upper-triangle U rows + 6 gradient rows) and the fixed-
    camera mask, computes the damped U and g_c IN-KERNEL, and emits the
    FINAL Schur matrix S' = U_embed + 1e-8 I - QQ^T in (i, k) row order
    plus the camera rhs b = -(g_c - red6) finalized on the last tile —
    the XLA-side damp/embed/jitter/negate/un-permute/b-assembly ops (and
    their per-iteration launch overhead) all disappear into this kernel.
    fold_u=False emits +QQ^T (the sharded path psums it before adding the
    replicated U outside)."""
    if fold_u:
        red_ref, fixed_ref, vu_ref, gp_ref, ptv_ref, w_ref, cam_ref = refs[:7]
        s_ref, zv_out, vinv_out, red6_ref = refs[7:]
    else:
        vu_ref, gp_ref, ptv_ref, w_ref, cam_ref = refs[:5]
        s_ref, zv_out, vinv_out, red6_ref = refs[5:]
    f32 = jnp.float32
    lam = lam_ref[0, 0]

    ptv = ptv_ref[0, :] > 0.5  # [LT]
    v00, v01, v02 = vu_ref[0], vu_ref[1], vu_ref[2]
    v11, v12, v22 = vu_ref[3], vu_ref[4], vu_ref[5]
    v00 = v00 + lam * jnp.clip(v00, 1e-6, None)
    v11 = v11 + lam * jnp.clip(v11, 1e-6, None)
    v22 = v22 + lam * jnp.clip(v22, 1e-6, None)
    one = jnp.ones_like(v00)
    zero = jnp.zeros_like(v00)
    v00 = jnp.where(ptv, v00, one)
    v11 = jnp.where(ptv, v11, one)
    v22 = jnp.where(ptv, v22, one)
    v01 = jnp.where(ptv, v01, zero)
    v02 = jnp.where(ptv, v02, zero)
    v12 = jnp.where(ptv, v12, zero)

    A = v11 * v22 - v12 * v12
    B = v02 * v12 - v01 * v22
    Cc = v01 * v12 - v02 * v11
    det = v00 * A + v01 * B + v02 * Cc
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    D = v00 * v22 - v02 * v02
    E = v01 * v02 - v00 * v12
    F = v00 * v11 - v01 * v01
    i00, i01, i02 = A * inv_det, B * inv_det, Cc * inv_det
    i11, i12, i22 = D * inv_det, E * inv_det, F * inv_det
    vinv_out[...] = jnp.stack([i00, i01, i02, i11, i12, i22])

    l00 = jnp.sqrt(jnp.maximum(i00, 1e-20))
    l10 = i01 / l00
    l20 = i02 / l00
    l11 = jnp.sqrt(jnp.maximum(i11 - l10 * l10, 1e-20))
    l21 = (i12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(i22 - l20 * l20 - l21 * l21, 1e-20))
    C = [[l00, zero, zero], [l10, l11, zero], [l20, l21, l22]]

    gp = [gp_ref[0], gp_ref[1], gp_ref[2]]
    zv = [i00 * gp[0] + i01 * gp[1] + i02 * gp[2],
          i01 * gp[0] + i11 * gp[1] + i12 * gp[2],
          i02 * gp[0] + i12 * gp[1] + i22 * gp[2]]
    zv_out[...] = jnp.stack(zv)

    # G rows (i*3+m) as [O, LT] planes — VMEM-local, never written to HBM
    W = w_ref[...]  # [18, O, LT]
    Gl = [sum(W[i * 3 + j] * C[j][m][None, :] for j in range(3))
          for i in range(6) for m in range(3)]  # 18 x [O, LT]

    # rhs rows (W zv) -> one-hot camera reduce, as in kernel 2
    wz = [sum(W[i * 3 + j] * zv[j][None, :] for j in range(3))
          for i in range(6)]
    wz += [jnp.zeros_like(wz[0])] * (N_RHS_ROWS - 6)
    stacked = jnp.stack(wz).reshape(N_RHS_ROWS, O * LT)
    cam = cam_ref[...]  # [O, LT]
    cam_flat = cam.reshape(1, O * LT)
    oh_t = (jax.lax.broadcasted_iota(jnp.int32, (K, O * LT), 0)
            == cam_flat).astype(f32)
    contrib = jax.lax.dot_general(
        stacked, oh_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [8, K]

    # Q expansion in ROW ORDER (i, k) — everything stays 2D for Mosaic:
    # Qm[(i,k), l] = sum_o oh_o[k, l] * G[(i,m), o, l].  The resulting
    # S' = sum_m Qm Qm^T is the (i,k)-permuted S; the caller un-permutes
    # the tiny [6K, 6K] block in XLA.
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, LT), 0)
    ohs = [(iota_k == cam[o][None, :]).astype(f32) for o in range(O)]
    # (A/B'd round 5: one concatenated [6K, 3*LT] dot measured no faster —
    # the VMEM concat copy offsets the saved MXU pipeline fills)
    s_contrib = jnp.zeros((6 * K, 6 * K), f32)
    for m in range(3):
        slabs = [
            sum(ohs[o] * Gl[i * 3 + m][o][None, :] for o in range(O))
            for i in range(6)
        ]  # 6 x [K, LT]
        Qm = jnp.concatenate(slabs, axis=0)  # [6K, LT], rows (i, k)
        if s_bf16:
            Qm = Qm.astype(jnp.bfloat16)
        s_contrib = s_contrib + jax.lax.dot_general(
            Qm, Qm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

    if fold_u:
        # damped U rows + masked gradient from the raw reduced rows
        # (= _damp_U_cm, in-kernel): U[i,i'] = red[SYM6_IDX], diagonal
        # damping from the UNDAMPED diagonal, identity rows for fixed cams
        red27 = red_ref[...]  # [27, K]
        fixedm = fixed_ref[0, :] > 0.5  # [K]
        sym_idx = [[0, 1, 2, 3, 4, 5], [1, 6, 7, 8, 9, 10],
                   [2, 7, 11, 12, 13, 14], [3, 8, 12, 15, 16, 17],
                   [4, 9, 13, 16, 18, 19], [5, 10, 14, 17, 19, 20]]
        urows = []
        for i in range(6):
            for ip in range(6):
                r = red27[sym_idx[i][ip]]
                if i == ip:
                    r = r + lam * jnp.clip(r, 1e-6, None)
                r = jnp.where(fixedm, 1.0 if i == ip else 0.0, r)
                urows.append(r)

        # init with the block-diagonal U embed (+ jitter) in (i,k) order:
        # S'[i*K+k, i'*K+k] = U[k, i, i'] — built from 36 diagonal [K, K]
        # blocks — then subtract QQ^T contributions per tile
        diag_k = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
                  ).astype(f32)
        rows = []
        for i in range(6):
            blocks = [diag_k * urows[i * 6 + ip][None, :] for ip in range(6)]
            rows.append(jnp.concatenate(blocks, axis=1))  # [K, 6K]
        u_embed = jnp.concatenate(rows, axis=0)  # [6K, 6K]
        eye = (jax.lax.broadcasted_iota(jnp.int32, (6 * K, 6 * K), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (6 * K, 6 * K), 1)
               ).astype(f32)

        @pl.when(pl.program_id(0) == 0)
        def _():
            red6_ref[...] = contrib
            s_ref[...] = u_embed + 1e-8 * eye - s_contrib

        @pl.when(pl.program_id(0) != 0)
        def _():
            red6_ref[...] += contrib
            s_ref[...] -= s_contrib

        # last tile: finalize the camera rhs b = -(g_c - red6) in rows 0-5
        # (the accumulated red6 lives in the same output ref; rows 6-7 are
        # sublane padding)
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            acc = red6_ref[...]  # [8, K] accumulated (W zv) reduce rows
            brows = []
            for i in range(6):
                g_c = jnp.where(fixedm, 0.0, red27[21 + i])
                brows.append(-(g_c - acc[i]))
            brows += [jnp.zeros_like(brows[0])] * (N_RHS_ROWS - 6)
            red6_ref[...] = jnp.stack(brows)
    else:
        @pl.when(pl.program_id(0) == 0)
        def _():
            red6_ref[...] = contrib
            s_ref[...] = s_contrib

        @pl.when(pl.program_id(0) != 0)
        def _():
            red6_ref[...] += contrib
            s_ref[...] += s_contrib


def _s_per_lane_bytes(O, K):
    """Per-landmark-lane VMEM bytes of the S kernel's working set: the
    [6K, LT] Q slabs (x3 m), the [K, 18, LT]-equivalent G/oh products,
    the W/G planes — AND the one-hot structures the round-4 advisor found
    missing from this estimate: oh_t [K, O*LT] plus the O per-observation
    [K, LT] masks (2*K*O per lane), which dominate at high obs-per-point."""
    return (K * 18 + 6 * K * 3 + 2 * K * O + 18 * O * 2 + 30 * O) * 4


def _pick_tile_s(O, L, K):
    """Landmark tile for the S kernel: keep the tile working set under
    ~11 MB of the ~16 MB/core VMEM (calibrated so the measured-optimal
    LT=512 at the 64-cam/O=16 bench shape is preserved)."""
    per_lane = _s_per_lane_bytes(O, K)
    lt = max(128, (11 * 1024 * 1024) // per_lane)
    lt = min(lt, 2048)
    return (lt // 128) * 128


def fused_schur_s_supported(O, L, K):
    """Gate: 6K x 6K f32 S block + one landmark tile must fit VMEM."""
    if K > 128 or O > 64:
        return False
    LT = _pick_tile_s(O, L, K)
    s_bytes = (6 * K) * (6 * K) * 4
    return s_bytes + _s_per_lane_bytes(O, K) * LT < 13 * 1024 * 1024


@partial(jax.jit, static_argnames=("n_cams", "s_bf16", "interpret"))
def fused_schur_prepare_s(lam, Vu, g_p, pt_valid, W18, cam_t, n_cams,
                          red27=None, cam_fixed=None, s_bf16=True,
                          interpret=False):
    """Schur prepare + in-VMEM S accumulation.

    Without red27: returns (S_qqt [6K,6K] (k,i)-ordered positive QQ^T term,
    zv [3,L], vinv6 [6,L], red6 [K,6]) — the sharded path psums S_qqt and
    red6, then damps/embeds U outside.

    With red27 ([K, 27]: the carried UNDAMPED reduced camera rows) and
    cam_fixed [K]: the kernel damps U in-place and returns
    (S' [6K,6K], zv, vinv6, b [6K]) where S' is the FINAL damped Schur
    matrix in (i, k) ROW ORDER (a symmetric permutation — Cholesky-solve
    directly in that order and transpose the tiny [6,K] solution back) and
    b is the camera rhs -(g_c - red6) in the same order.

    With s_bf16 the Q block feeds the MXU in bf16 with f32 accumulation —
    the same effective precision XLA's DEFAULT dot uses for the Pf/QQ^T
    pair this replaces (measured: mxu_bf16 made no timing or
    cost-trajectory difference, BASELINE.md round 3).
    """
    O, L = cam_t.shape
    K = n_cams
    LT = _pick_tile_s(O, L, K)
    Lp = ((L + LT - 1) // LT) * LT
    pad = Lp - L

    f32 = jnp.float32
    ptv = pt_valid.astype(f32).reshape(1, L)
    Vu = Vu.astype(f32)
    g_p = g_p.astype(f32)
    if pad:
        padL = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        Vu = padL(Vu)
        g_p = padL(g_p)
        ptv = padL(ptv)
        W18 = padL(W18)
        cam_t = padL(cam_t)

    lam2 = jnp.asarray(lam, f32).reshape(1, 1)
    grid = (Lp // LT,)
    fold_u = red27 is not None
    kern = partial(_schur_s_kernel, O=O, LT=LT, K=K, s_bf16=s_bf16,
                   fold_u=fold_u)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [lam2]
    if fold_u:
        in_specs += [
            pl.BlockSpec((27, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [red27.T.astype(f32),
                   cam_fixed.astype(f32).reshape(1, K)]
    in_specs += [
        pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((18, O, LT), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((O, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    inputs += [Vu, g_p, ptv, W18, cam_t]
    S, zv, vinv6, red6 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((6 * K, 6 * K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_RHS_ROWS, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6 * K, 6 * K), f32),
            jax.ShapeDtypeStruct((3, Lp), f32),
            jax.ShapeDtypeStruct((6, Lp), f32),
            jax.ShapeDtypeStruct((N_RHS_ROWS, K), f32),
        ],
        interpret=interpret,
    )(*inputs)

    if pad:
        zv = zv[:, :L]
        vinv6 = vinv6[:, :L]
    if fold_u:
        # S stays (i, k)-ordered; red6 rows 0-5 already hold b in that order
        return S, zv, vinv6, red6[:6].reshape(-1)
    # sharded path: un-permute to (k, i) blocks for the psum + XLA embed
    S = S.reshape(6, K, 6, K).transpose(1, 0, 3, 2).reshape(6 * K, 6 * K)
    return S, zv, vinv6, red6[:6].T
