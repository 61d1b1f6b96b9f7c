"""Dense-layout bundle adjustment: the TPU speed-of-light solver.

The flat observation-table engine (`solvers/lm.py`) is general but leans on
`segment_sum` scatter-adds and large gathers, which serialize on TPU — the
measured result was ~1.8x over CPU (see git history).  This engine
restructures the problem so every reduction is a dense contraction the MXU
can tile:

- observations are grouped **by landmark** into rectangular blocks
  ``[L, O]`` (O = capped max observations per landmark, validity-masked), so
  every landmark-side quantity (V blocks, point gradients, back-substitution)
  is a dense reduction over the O axis — no scatter, no gather;
- camera-side reductions go through one-hot observation->camera matmuls
  contracted on the MXU, replacing both the camera gathers and the camera
  scatter-adds.

**Layout**: all per-observation tensors live in *component-major* form
``[components..., O, L]`` — the landmark axis L is the trailing (lane) axis.
TPU vector tiles are (8, 128): a tensor shaped ``[L, O, 2, 6]`` puts 6
elements in each 128-lane row (>20x padding waste on every elementwise op),
while ``[2, 6, O, L]`` fills whole tiles.  This layout change alone is worth
~9x on the block build (measured v5e, 10k landmarks — see BASELINE.md).
The small component axes (2 residual rows, 6 camera dofs, 3 point dofs) are
unrolled in Python, which XLA fuses into a handful of full-width VPU loops;
camera-side reductions become ``[C, O*L] @ [O*L, K]`` matmuls whose one-hot
operand is generated inline (fused, never materialized in HBM).

The LM loop, Huber-IRLS weighting, cheirality penalty, Nielsen schedule, and
Schur-PCG structure mirror `solvers/lm.py` (numerical parity is tested);
only the data layout differs.

Replaces Ceres LM + DENSE_SCHUR (reference `ba_project/src/ba/Optimizer.cpp:80-90`)
on the TPU hot path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from bundleadjustment_tpu.geometry.se3 import aa_to_rotmat, rotmat_to_aa
from bundleadjustment_tpu.solvers.lm import CHEIRALITY_PENALTY, LMConfig
from bundleadjustment_tpu.solvers.residuals import HUBER_DELTA


class DenseBAProblem(NamedTuple):
    K4: jnp.ndarray  # [4]
    cam_idx: jnp.ndarray  # [L, O] int32
    uv: jnp.ndarray  # [L, O, 2]
    sigma2: jnp.ndarray  # [L, O]
    valid: jnp.ndarray  # [L, O] bool
    cam_fixed: jnp.ndarray  # [K] bool
    pt_valid: jnp.ndarray  # [L] bool


def densify_problem(K4, cam_idx, pt_idx, uv, sigma2, valid, cam_fixed,
                    n_points, max_obs=16):
    """Host-side regrouping of a flat observation table by landmark.

    Observations beyond `max_obs` per landmark are dropped (rare in SLAM maps;
    raise max_obs for dense reconstructions).  Returns (DenseBAProblem,
    n_dropped).
    """
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    uv = np.asarray(uv)
    sigma2 = np.asarray(sigma2)
    valid = np.asarray(valid)

    L = n_points
    # vectorized grouping: stable-sort valid observations by landmark, rank
    # within each group, scatter ranks < max_obs into the dense slots
    vi = np.nonzero(valid)[0]
    p = pt_idx[vi]
    order = np.argsort(p, kind="stable")
    vi = vi[order]
    p = p[order]
    if len(p):
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        sizes = np.diff(np.r_[starts, len(p)])
        ranks = np.arange(len(p)) - np.repeat(starts, sizes)
    else:
        ranks = np.zeros(0, np.int64)
    keep = ranks < max_obs
    dropped = int(len(p) - keep.sum())

    # trim the O axis to the ACTUAL max slots used (rounded up to the
    # 8-sublane multiple): every [O, L] plane in the solver — eval, W carry,
    # Q expansion, accept/reject selects — scales with O, and a requested
    # max_obs of 16 on an 8-obs-per-landmark problem would double all of it
    # for all-invalid padding columns (measured 64c/10k: ~1.5x marginal)
    used = int(ranks[keep].max()) + 1 if keep.any() else 1
    max_obs = min(max_obs, max(8, ((used + 7) // 8) * 8))
    ci = np.zeros((L, max_obs), np.int32)
    uvd = np.zeros((L, max_obs, 2), np.float32)
    sg = np.ones((L, max_obs), np.float32)
    vd = np.zeros((L, max_obs), bool)
    lk, sk, nk = p[keep], ranks[keep], vi[keep]
    ci[lk, sk] = cam_idx[nk]
    uvd[lk, sk] = uv[nk]
    sg[lk, sk] = sigma2[nk]
    vd[lk, sk] = True
    slots = np.bincount(lk, minlength=L)

    return (
        DenseBAProblem(
            K4=jnp.asarray(np.asarray(K4, np.float32)),
            cam_idx=jnp.asarray(ci),
            uv=jnp.asarray(uvd),
            sigma2=jnp.asarray(sg),
            valid=jnp.asarray(vd),
            cam_fixed=jnp.asarray(np.asarray(cam_fixed, bool)),
            pt_valid=jnp.asarray(slots > 0),
        ),
        dropped,
    )


def densify_problem_auto(K4, cam_idx, pt_idx, uv, sigma2, valid, cam_fixed,
                         n_points, max_obs=16, max_obs_cap=512):
    """densify_problem with max_obs auto-raised (doubling, up to
    max_obs_cap) until no observation is dropped: a landmark observed by
    more than max_obs keyframes must not silently lose constraints.
    Returns (DenseBAProblem, n_dropped, max_obs_used)."""
    while True:
        dense, dropped = densify_problem(
            K4, cam_idx, pt_idx, uv, sigma2, valid, cam_fixed, n_points,
            max_obs=max_obs,
        )
        if dropped == 0 or max_obs >= max_obs_cap:
            # report the ACTUAL O (densify trims trailing unused slots)
            return dense, dropped, int(dense.cam_idx.shape[1])
        max_obs *= 2


# ---------------------------------------------------------------------------
# component-major internals
# ---------------------------------------------------------------------------


class _CM(NamedTuple):
    """The dense problem transposed to component-major [.., O, L] layout."""

    K4: jnp.ndarray
    cam_t: jnp.ndarray  # [O, L] int32
    uv_t: jnp.ndarray  # [2, O, L]
    inv_sigma_t: jnp.ndarray  # [O, L]
    inv_sigma2_t: jnp.ndarray  # [O, L]
    valid_t: jnp.ndarray  # [O, L] bool
    fixed_t: jnp.ndarray  # [O, L] bool (observation's camera is fixed)
    cam_fixed: jnp.ndarray  # [K]
    pt_valid: jnp.ndarray  # [L]


def _to_cm(prob: DenseBAProblem) -> _CM:
    sigma2 = jnp.maximum(prob.sigma2, 1e-12)
    return _CM(
        K4=prob.K4,
        cam_t=prob.cam_idx.T,
        uv_t=jnp.transpose(prob.uv, (2, 1, 0)),
        inv_sigma_t=(1.0 / jnp.sqrt(sigma2)).T,
        inv_sigma2_t=(1.0 / sigma2).T,
        valid_t=prob.valid.T,
        fixed_t=prob.cam_fixed[prob.cam_idx].T,
        cam_fixed=prob.cam_fixed,
        pt_valid=prob.pt_valid,
    )


def _oh(cm: _CM, K, dtype):
    """One-hot [K, O*L] camera-membership matrix.

    Generated inline from cam_t so XLA fuses it into the consuming matmul —
    it is never materialized in HBM (L*O*K floats would dominate traffic).
    """
    flat = cm.cam_t.reshape(1, -1)
    return (jnp.arange(K, dtype=cm.cam_t.dtype)[:, None] == flat).astype(dtype)


def _gather_cams(M, cm: _CM):
    """[K, C] camera table -> [C, O, L] per-observation values (MXU matmul)."""
    O, L = cm.cam_t.shape
    out = jnp.einsum("kc,kn->cn", M, _oh(cm, M.shape[0], M.dtype))
    return out.reshape(M.shape[1], O, L)


def _reduce_cams(G, cm: _CM, K, bf16=False):
    """[C, O, L] per-observation values -> [K, C] camera sums (MXU matmul)."""
    C = G.shape[0]
    Gf = G.reshape(C, -1)
    if bf16:
        out = jnp.einsum(
            "cn,kn->kc", Gf.astype(jnp.bfloat16), _oh(cm, K, jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum("cn,kn->kc", Gf, _oh(cm, K, Gf.dtype))
    return out


def _project_cm(cm: _CM, R, t, Xt):
    """Project all observations.  Returns (x_cam [3,O,L], Rg [3,3,O,L],
    u [O,L], v [O,L], z [O,L])."""
    K = R.shape[0]
    Rt = jnp.concatenate([R.reshape(K, 9), t], axis=1)  # [K, 12]
    g = _gather_cams(Rt, cm)  # [12, O, L]
    Rg = g[:9].reshape(3, 3, *cm.cam_t.shape)
    tg = g[9:]
    RX = jnp.stack(
        [sum(Rg[i, j] * Xt[j][None, :] for j in range(3)) for i in range(3)]
    )
    x_cam = RX + tg
    z = x_cam[2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    fx, fy, cx, cy = cm.K4[0], cm.K4[1], cm.K4[2], cm.K4[3]
    u = fx * x_cam[0] * inv_z + cx
    v = fy * x_cam[1] * inv_z + cy
    return x_cam, RX, Rg, u, v, z, inv_z


def _eval_cm(cm: _CM, R, t, Xt, robust):
    """One fused pass: robust cost + residuals + Jacobians at (R, t, Xt).

    Returns (cost, r [2,O,L], Jc [2,6,O,L], Jp [2,3,O,L]).  The LM scan
    evaluates every trial point exactly once: the cost decides accept/reject
    and the residual/Jacobian blocks are carried into the next iteration if
    accepted — the projection and residual work is never repeated (the split
    cost-then-Jacobians form paid a second full projection pass per
    iteration).  Mirrors the math of the reference's AngleReprojectionError
    (`ba_project/src/ba/Optimizer.h:49-88`) with a left-multiplicative so(3)
    perturbation.
    """
    x_cam, RX, Rg, u, v, z, inv_z = _project_cm(cm, R, t, Xt)
    fx, fy = cm.K4[0], cm.K4[1]
    isig = cm.inv_sigma_t
    r = jnp.stack([(u - cm.uv_t[0]) * isig, (v - cm.uv_t[1]) * isig])

    # robust cost from the sigma-weighted residuals (matches the reference's
    # Huber(sqrt(5.991)) objective, `ba_project/src/ba/Optimizer.cpp:312`)
    r2 = r[0] ** 2 + r[1] ** 2
    if robust:
        nrm2 = jnp.sqrt(jnp.maximum(r2, 1e-20))
        rho = jnp.where(nrm2 <= HUBER_DELTA, 0.5 * r2,
                        HUBER_DELTA * (nrm2 - 0.5 * HUBER_DELTA))
    else:
        rho = 0.5 * r2
    rho = jnp.where(z > 1e-6, rho, CHEIRALITY_PENALTY)
    cost = jnp.sum(jnp.where(cm.valid_t, rho, 0.0))

    zero = jnp.zeros_like(inv_z)
    # duv_dx [2, 3, O, L] (including inv_sigma weighting)
    duv_dx = jnp.stack([
        jnp.stack([fx * inv_z * isig, zero,
                   -fx * x_cam[0] * inv_z * inv_z * isig]),
        jnp.stack([zero, fy * inv_z * isig,
                   -fy * x_cam[1] * inv_z * inv_z * isig]),
    ])
    # neg_skew(RX) [3, 3, O, L]
    RXx, RXy, RXz = RX[0], RX[1], RX[2]
    zeros = jnp.zeros_like(RXx)
    neg_skew = jnp.stack([
        jnp.stack([zeros, RXz, -RXy]),
        jnp.stack([-RXz, zeros, RXx]),
        jnp.stack([RXy, -RXx, zeros]),
    ])
    J_phi = jnp.stack([
        jnp.stack([sum(duv_dx[a, m] * neg_skew[m, j] for m in range(3))
                   for j in range(3)])
        for a in range(2)
    ])  # [2, 3, O, L]
    Jp = jnp.stack([
        jnp.stack([sum(duv_dx[a, m] * Rg[m, j] for m in range(3))
                   for j in range(3)])
        for a in range(2)
    ])  # [2, 3, O, L]
    Jc = jnp.concatenate([J_phi, duv_dx], axis=1)  # [2, 6, O, L]

    mask = cm.valid_t & (z > 1e-6)
    w = jnp.where(mask, 1.0, 0.0)
    if robust:
        nrm = jnp.sqrt(jnp.maximum(r2, 1e-24))
        w = w * jnp.where(nrm <= HUBER_DELTA, 1.0, HUBER_DELTA / nrm)
    sw = jnp.sqrt(w)
    r = jnp.where(mask, r * sw, 0.0)
    Jc = Jc * jnp.where(cm.fixed_t, 0.0, sw)
    Jp = Jp * sw
    return cost, r, Jc, Jp


def _sym3_inv_cm(V):
    """Closed-form symmetric 3x3 inverse, component-major: V [3,3,L]."""
    a, b, c = V[0, 0], V[0, 1], V[0, 2]
    d, e, f = V[1, 1], V[1, 2], V[2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    return jnp.stack([
        jnp.stack([A, B, C]),
        jnp.stack([B, D, E]),
        jnp.stack([C, E, F]),
    ]) * inv_det


def _chol3_cm(V):
    """Closed-form lower Cholesky of SPD 3x3, component-major: V [3,3,L]."""
    a, b, c = V[0, 0], V[0, 1], V[0, 2]
    d, e, f = V[1, 1], V[1, 2], V[2, 2]
    l00 = jnp.sqrt(jnp.maximum(a, 1e-20))
    l10 = b / l00
    l20 = c / l00
    l11 = jnp.sqrt(jnp.maximum(d - l10 * l10, 1e-20))
    l21 = (e - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(f - l20 * l20 - l21 * l21, 1e-20))
    zero = jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([l00, zero, zero]),
        jnp.stack([l10, l11, zero]),
        jnp.stack([l20, l21, l22]),
    ])


def _mat3vec_cm(M, x):
    """[3,3,L] @ [3,L] -> [3,L]."""
    return jnp.stack([sum(M[i, j] * x[j] for j in range(3)) for i in range(3)])


_TRIU6 = [(i, j) for i in range(6) for j in range(i, 6)]  # 21 unique entries
# [6, 6] map from (i, j) to its upper-triangle slot: one gather rebuilds the
# full symmetric matrix from the 21 reduced rows
_SYM6_IDX = np.zeros((6, 6), np.int32)
for _n, (_i, _j) in enumerate(_TRIU6):
    _SYM6_IDX[_i, _j] = _SYM6_IDX[_j, _i] = _n
_TRIU3 = [(i, j) for i in range(3) for j in range(i, 3)]  # 6 unique entries
_SYM3_IDX = np.zeros((3, 3), np.int32)
for _n, (_i, _j) in enumerate(_TRIU3):
    _SYM3_IDX[_i, _j] = _SYM3_IDX[_j, _i] = _n


def _assemble_cm(cm: _CM, r, Jc, Jp, psum, bf16=False):
    """Undamped block reductions from component-major residuals/Jacobians:
    red [K,27] (21 upper-triangle U rows + 6 g_c rows), Vu [6,L], g_p [3,L],
    W [6,3,O,L].  None of these depend on the LM damping, so the scan carries
    THEM (not r/Jc/Jp): damping is re-applied per iteration by
    `_damp_blocks_cm` on the small reduced arrays, and a rejected iteration
    never re-touches the [O, L] planes."""
    K = cm.cam_fixed.shape[0]
    # camera-side: U is symmetric -> stack only its 21 upper-triangle
    # products + 6 gradient rows into one [27, O*L] @ [O*L, K] matmul
    # (vs 36+6: a third less VPU elementwise work and matmul rows)
    rows = [sum(Jc[a, i] * Jc[a, j] for a in range(2)) for i, j in _TRIU6]
    rows += [sum(Jc[a, i] * r[a] for a in range(2)) for i in range(6)]
    stacked = jnp.stack(rows)  # [27, O, L]
    red = psum(_reduce_cams(stacked, cm, K, bf16=bf16))  # [K, 27]

    # V symmetric likewise: 6 unique [L] reductions, one stack + gather
    Vu = jnp.stack([
        jnp.sum(Jp[0, i] * Jp[0, j] + Jp[1, i] * Jp[1, j], axis=0)
        for i, j in _TRIU3
    ])  # [6, L]
    g_p = jnp.stack([jnp.sum(Jp[0, i] * r[0] + Jp[1, i] * r[1], axis=0)
                     for i in range(3)])  # [3, L]
    W = jnp.stack([
        jnp.stack([Jc[0, i] * Jp[0, j] + Jc[1, i] * Jp[1, j]
                   for j in range(3)])
        for i in range(6)
    ])  # [6, 3, O, L]
    return red, Vu, g_p, W


def _damp_U_cm(cm: _CM, red, lam):
    """LM-damped camera blocks U [K,6,6], g_c [K,6] from the reduced rows."""
    U = red[:, _SYM6_IDX]  # [K, 6, 6] via one gather
    g_c = red[:, 21:]
    eye6 = jnp.eye(6, dtype=U.dtype)
    dU = jnp.clip(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6, None)
    U = U + (lam * dU)[..., None] * eye6
    U = jnp.where(cm.cam_fixed[:, None, None], eye6, U)
    g_c = jnp.where(cm.cam_fixed[:, None], 0.0, g_c)
    return U, g_c


def _damp_blocks_cm(cm: _CM, red, Vu, lam):
    """LM-damped U [K,6,6], g_c [K,6], V [3,3,L] from the reduced rows."""
    U, g_c = _damp_U_cm(cm, red, lam)
    V = Vu[_SYM3_IDX]  # [3, 3, L]
    dV = jnp.stack([jnp.clip(V[i, i], 1e-6, None) for i in range(3)])
    V = V + lam * dV[:, None, :] * jnp.eye(3)[:, :, None]
    V = jnp.where(cm.pt_valid[None, None, :], V, jnp.eye(3)[:, :, None])
    return U, g_c, V


def _sym6_matvec(v6, x):
    """y = M x with M the symmetric 3x3 packed as rows (00,01,02,11,12,22);
    v6 [6, L], x [3, L] -> [3, L]."""
    return jnp.stack([
        v6[0] * x[0] + v6[1] * x[1] + v6[2] * x[2],
        v6[1] * x[0] + v6[3] * x[1] + v6[4] * x[2],
        v6[2] * x[0] + v6[4] * x[1] + v6[5] * x[2],
    ])


def _w_reduce(W, x_obs):
    """y[j,l] = sum_{i,o} W[i,j,o,l] * x_obs[i,o,l]  -> [3, L]."""
    return jnp.stack([
        jnp.sum(sum(W[i, j] * x_obs[i] for i in range(6)), axis=0)
        for j in range(3)
    ])


def _w_apply(W, z_pt):
    """G[i,o,l] = sum_j W[i,j,o,l] * z_pt[j,l]  -> [6, O, L]."""
    return jnp.stack([
        sum(W[i, j] * z_pt[j][None, :] for j in range(3)) for i in range(6)
    ])


def _make_step(cm: _CM, config: LMConfig, psum=None):
    """Build the (step, eval_assemble) pair for `lax.scan`.  `psum` is the
    cross-shard reduction hook: None single-device, `lax.psum` inside
    shard_map.  `eval_assemble(R, t, Xt) -> (cost, red, Vu, g_p, W)` seeds
    the scan state; `step` carries the trial point's REDUCED blocks forward
    on acceptance (damping is independent of them, see _assemble_cm)."""
    single = psum is None
    if single:
        psum = lambda x: x
    K = cm.cam_fixed.shape[0]
    bf16 = config.mxu_bf16

    O, L = cm.cam_t.shape
    use_fused = config.fused_eval == "on"
    if config.fused_eval == "auto":
        from bundleadjustment_tpu.solvers.pallas_dense_eval import (
            fused_eval_supported,
        )

        use_fused = (jax.default_backend() == "tpu"
                     and fused_eval_supported(O, L, K))

    def eval_assemble(R, t, Xt):
        if use_fused:
            from bundleadjustment_tpu.solvers.pallas_dense_eval import (
                fused_eval_assemble,
            )

            cost, red, Vu, g_p, W = fused_eval_assemble(
                cm.K4, cm.cam_t, cm.uv_t, cm.inv_sigma_t, cm.valid_t,
                cm.fixed_t, R, t, Xt, robust=config.robust,
                interpret=jax.default_backend() != "tpu",
            )
            return psum(cost), psum(red), Vu, g_p, W
        cost, r, Jc, Jp = _eval_cm(cm, R, t, Xt, config.robust)
        red, Vu, g_p, W = _assemble_cm(cm, r, Jc, Jp, psum, bf16=bf16)
        return psum(cost), red, Vu, g_p, W

    def solve_cameras(U, g_c, V_inv, g_p, W):
        zv = _mat3vec_cm(V_inv, g_p)
        red = psum(_reduce_cams(_w_apply(W, zv), cm, K, bf16=bf16))  # [K, 6]
        b = -(g_c - red)

        if config.solver == "dense":
            # exact DENSE_SCHUR: S = U_diag - Q Q^T with
            # Q[(k,i), (l,m)] = sum_o oh[k,o,l] (W[l,o] @ chol(V^-1)[l])[i,m]
            C = _chol3_cm(V_inv)  # [3, 3, L]
            G = jnp.stack([
                jnp.stack([sum(W[i, j] * C[j, m][None, :] for j in range(3))
                           for m in range(3)])
                for i in range(6)
            ])  # [6, 3, O, L]
            O, L = cm.cam_t.shape
            pf_dtype = jnp.bfloat16 if bf16 else G.dtype
            # Pf[k, i, m, l] = sum_o oh[k,o,l] G[i,m,o,l]: batched over l
            Pf = jax.lax.dot_general(
                (jnp.arange(K)[:, None, None] == cm.cam_t[None]).astype(pf_dtype),
                G.reshape(18, O, L).astype(pf_dtype),
                dimension_numbers=(((1,), (1,)), ((2,), (2,))),
                preferred_element_type=pf_dtype,
            ).reshape(L, K, 6, 3)
            # S = Q Q^T contracted directly over (landmark, point-dof) — no
            # explicit [6K, 3L] transpose/materialization; XLA folds the
            # layout change into the matmul operand load
            S = -psum(jax.lax.dot_general(
                Pf, Pf,
                dimension_numbers=(((0, 3), (0, 3)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # [K, 6, K, 6]
            idx = jnp.arange(K)
            S = S.at[idx, :, idx, :].add(U)
            S = S.reshape(K * 6, K * 6) + 1e-8 * jnp.eye(K * 6, dtype=S.dtype)
            dc = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S), b.reshape(-1)
            ).reshape(K, 6)
        else:
            Minv = jnp.linalg.inv(U)

            def matvec(x):
                xg = _gather_cams(x, cm)  # [6, O, L]
                zz = _mat3vec_cm(V_inv, _w_reduce(W, xg))
                back = psum(_reduce_cams(_w_apply(W, zz), cm, K, bf16=bf16))
                Ux = jnp.einsum("kij,kj->ki", U, x)
                return Ux - back

            def cg_body(s, _):
                x, rr, p, rz = s
                Sp = matvec(p)
                pSp = jnp.sum(p * Sp)
                alpha = rz / jnp.where(jnp.abs(pSp) < 1e-30, 1e-30, pSp)
                x = x + alpha * p
                rr = rr - alpha * Sp
                zp = jnp.einsum("kij,kj->ki", Minv, rr)
                rz_new = jnp.sum(rr * zp)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
                return (x, rr, zp + beta * p, rz_new), None

            x0 = jnp.zeros_like(b)
            z0 = jnp.einsum("kij,kj->ki", Minv, b)
            (dc, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, b, z0, jnp.sum(b * z0)), None,
                length=config.pcg_iters,
            )
        return dc

    def solve_fused(red, Vu, g_p, W, lam):
        """Exact-Schur camera solve with the Pallas schur kernels.

        Preferred path (kernel 3): prepare + Q expansion + S = QQ^T
        accumulated entirely in VMEM — the XLA Pf materialization
        ([L,K,6,3], 46 MB at 64c/10k) cost 0.35 ms/iteration of HBM traffic
        (round-3 attribution).  Fallback (kernel 2 + XLA matmuls) covers
        shapes the S kernel's VMEM gate rejects."""
        from bundleadjustment_tpu.solvers.pallas_dense_eval import (
            fused_schur_prepare,
            fused_schur_prepare_s,
            fused_schur_s_supported,
        )

        O, L = cm.cam_t.shape
        interpret = jax.default_backend() != "tpu"
        if fused_schur_s_supported(O, L, K) and single:
            # single-device: the kernel damps U from the carried raw rows
            # and folds embed + jitter + rhs assembly, emitting the final
            # Schur system in (i, k) row order — a symmetric permutation,
            # so Cholesky solves it directly and only the tiny [6, K]
            # solution transposes back (round-5: removes ~8 small XLA ops
            # + launches per LM iteration)
            S, zv, vinv6, b = fused_schur_prepare_s(
                lam, Vu, g_p, cm.pt_valid, W.reshape(18, O, L), cm.cam_t, K,
                red27=red, cam_fixed=cm.cam_fixed,
                s_bf16=not interpret, interpret=interpret)
            dc = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S), b
            ).reshape(6, K).T
            return dc, vinv6
        U, g_c = _damp_U_cm(cm, red, lam)
        if fused_schur_s_supported(O, L, K):
            # s_bf16 matches XLA's DEFAULT TPU matmul precision (bf16
            # multiply, f32 accumulate) that the replaced Pf/QQ^T pair used;
            # interpret/CPU runs keep f32 so parity tests compare exactly
            S_qqt, zv, vinv6, red6 = fused_schur_prepare_s(
                lam, Vu, g_p, cm.pt_valid, W.reshape(18, O, L), cm.cam_t, K,
                s_bf16=not interpret, interpret=interpret)
            b = -(g_c - psum(red6))
            S = -psum(S_qqt)
            S = S.reshape(K, 6, K, 6)
        else:
            G, zv, vinv6, red6 = fused_schur_prepare(
                lam, Vu, g_p, cm.pt_valid, W.reshape(18, O, L), cm.cam_t, K,
                interpret=interpret)
            b = -(g_c - psum(red6))
            pf_dtype = jnp.bfloat16 if bf16 else G.dtype
            Pf = jax.lax.dot_general(
                (jnp.arange(K)[:, None, None] == cm.cam_t[None]
                 ).astype(pf_dtype),
                G.astype(pf_dtype),
                dimension_numbers=(((1,), (1,)), ((2,), (2,))),
                preferred_element_type=pf_dtype,
            ).reshape(L, K, 6, 3)
            S = -psum(jax.lax.dot_general(
                Pf, Pf,
                dimension_numbers=(((0, 3), (0, 3)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        idx = jnp.arange(K)
        S = S.at[idx, :, idx, :].add(U)
        S = S.reshape(K * 6, K * 6) + 1e-8 * jnp.eye(K * 6, dtype=S.dtype)
        dc = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(S), b.reshape(-1)
        ).reshape(K, 6)
        return dc, vinv6

    def step(state, _):
        R, t, Xt, lam, nu, cost, done, red, Vu, g_p, W = state
        if use_fused and config.solver == "dense":
            from bundleadjustment_tpu.solvers.pallas_dense_eval import (
                fused_eval_assemble_bs,
            )

            dc, vinv6 = solve_fused(red, Vu, g_p, W, lam)
            dphi = jnp.where(cm.cam_fixed[:, None], 0.0, dc[:, :3])
            dt = jnp.where(cm.cam_fixed[:, None], 0.0, dc[:, 3:])
            R_new = aa_to_rotmat(dphi) @ R
            t_new = t + dt
            # landmark back-substitution is FUSED into the trial eval
            # kernel (it reads the carried W/vinv6/g_p blocks anyway)
            new_cost, red_new, Vu_new, gp_new, W_new, Xt_new = (
                fused_eval_assemble_bs(
                    cm.K4, cm.cam_t, cm.uv_t, cm.inv_sigma_t, cm.valid_t,
                    cm.fixed_t, R_new, t_new,
                    jnp.concatenate([dphi, dt], axis=1), Xt,
                    W.reshape(18, *cm.cam_t.shape), vinv6, g_p, cm.pt_valid,
                    robust=config.robust,
                    interpret=jax.default_backend() != "tpu",
                )
            )
            new_cost = psum(new_cost)
            red_new = psum(red_new)
        else:
            U, g_c, V = _damp_blocks_cm(cm, red, Vu, lam)
            V_inv = _sym3_inv_cm(V)
            dc = solve_cameras(U, g_c, V_inv, g_p, W)
            # back-substitution (fully local per landmark)
            xg = _gather_cams(dc, cm)
            y = _w_reduce(W, xg)
            dp = -_mat3vec_cm(V_inv, g_p + y)  # [3, L]
            dp = jnp.where(cm.pt_valid[None, :], dp, 0.0)

            dphi = jnp.where(cm.cam_fixed[:, None], 0.0, dc[:, :3])
            dt = jnp.where(cm.cam_fixed[:, None], 0.0, dc[:, 3:])
            R_new = aa_to_rotmat(dphi) @ R
            t_new = t + dt
            Xt_new = Xt + dp

            new_cost, red_new, Vu_new, gp_new, W_new = eval_assemble(
                R_new, t_new, Xt_new)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        sel = lambda a, b2: jnp.where(accept & ~done, a, b2)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        return (
            sel(R_new, R), sel(t_new, t), sel(Xt_new, Xt),
            jnp.where(done, lam, jnp.where(accept, lam / 3.0, lam * nu)),
            jnp.where(done, nu, jnp.where(accept, 2.0, nu * 2.0)),
            sel(new_cost, cost),
            done | (accept & (rel < config.rtol)),
            sel(red_new, red), sel(Vu_new, Vu), sel(gp_new, g_p),
            sel(W_new, W),
        ), new_cost

    return step, eval_assemble


@partial(jax.jit, static_argnames=("config",))
def dense_ba_solve(prob: DenseBAProblem, cam_rt6, points, config=LMConfig()):
    """LM/Schur solve in the dense landmark-major layout.

    cam_rt6: [K, 6]; points: [L, 3].  Returns (cam_rt6', points', info).

    Memory note: the scan carry holds the accepted trial's REDUCED blocks
    (W [6,3,O,L] = 18*O*L floats + small red/Vu/g_p) so an accepted trial's
    eval+assembly is reused instead of recomputed; with the trial set live
    during the where-selects, peak HBM for the block planes is ~36*O*L*4 B
    transient.  At the largest single-chip config exercised (O=16,
    L=131072: ~300 MB transient) this is well inside v5e HBM; if a future
    config approaches the limit, fall back to recomputing per iteration.
    """
    cm = _to_cm(prob)
    R0 = aa_to_rotmat(cam_rt6[:, :3])
    t0 = cam_rt6[:, 3:]
    Xt0 = points.T

    step, eval_assemble = _make_step(cm, config)
    cost0, red0, Vu0, gp0, W0 = eval_assemble(R0, t0, Xt0)
    init = (
        R0, t0, Xt0, jnp.asarray(config.lam0, cost0.dtype),
        jnp.asarray(2.0, cost0.dtype), cost0, jnp.asarray(False),
        red0, Vu0, gp0, W0,
    )
    (R, t, Xt, _, _, cost, _, _, _, _, _), hist = jax.lax.scan(
        step, init, None, length=config.max_iters
    )
    cams_out = jnp.concatenate([rotmat_to_aa(R), t], -1)
    return cams_out, Xt.T, {"cost0": cost0, "cost": cost, "cost_history": hist}
