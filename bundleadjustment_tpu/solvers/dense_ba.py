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
- camera-side reductions go through a one-hot observation->camera matrix
  ``[L, O, K]`` contracted on the MXU (einsum), replacing both the camera
  gathers and the camera scatter-adds.  For K cameras this is an
  ``[L*O, K] @ [K, .]`` / ``[K, L*O] @ [L*O, .]`` matmul pair — exactly the
  shape the systolic array wants.

The LM loop, Huber-IRLS weighting, cheirality penalty, Nielsen schedule, and
Schur-PCG structure mirror `solvers/lm.py` (numerical parity is tested);
only the data layout differs.  Memory: the one-hot is L*O*K floats — 20 MB
at the 10k-landmark bench shape; for very large K shard the camera axis or
chunk the contraction.

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
from bundleadjustment_tpu.solvers.schur import _sym3_inv


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
    order = np.argsort(pt_idx, kind="stable")
    slots = np.zeros(L, np.int64)
    ci = np.zeros((L, max_obs), np.int32)
    uvd = np.zeros((L, max_obs, 2), np.float32)
    sg = np.ones((L, max_obs), np.float32)
    vd = np.zeros((L, max_obs), bool)
    dropped = 0
    for n in order:
        if not valid[n]:
            continue
        l = pt_idx[n]
        s = slots[l]
        if s >= max_obs:
            dropped += 1
            continue
        ci[l, s] = cam_idx[n]
        uvd[l, s] = uv[n]
        sg[l, s] = sigma2[n]
        vd[l, s] = True
        slots[l] = s + 1

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


def _onehot(cam_idx, n_cams, dtype):
    return (cam_idx[..., None] == jnp.arange(n_cams)[None, None, :]).astype(dtype)


def _residuals_jacobians(prob: DenseBAProblem, oh, R, t, X, robust):
    """Dense residuals + Jacobians.  Shapes: r [L,O,2], Jc [L,O,2,6],
    Jp [L,O,2,3], plus cheirality mask."""
    Rg = jnp.einsum("lok,kij->loij", oh, R)
    tg = jnp.einsum("lok,ki->loi", oh, t)
    RX = jnp.einsum("loij,lj->loi", Rg, X)
    x_cam = RX + tg
    z = x_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy, cx, cy = prob.K4[0], prob.K4[1], prob.K4[2], prob.K4[3]
    inv_z = 1.0 / zs
    u = fx * x_cam[..., 0] * inv_z + cx
    v = fy * x_cam[..., 1] * inv_z + cy
    inv_sigma = 1.0 / jnp.sqrt(jnp.maximum(prob.sigma2, 1e-12))
    r = jnp.stack([u - prob.uv[..., 0], v - prob.uv[..., 1]], -1)
    r = r * inv_sigma[..., None]

    zero = jnp.zeros_like(inv_z)
    duv_dx = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x_cam[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * x_cam[..., 1] * inv_z * inv_z], -1),
        ],
        axis=-2,
    ) * inv_sigma[..., None, None]

    RXx, RXy, RXz = RX[..., 0], RX[..., 1], RX[..., 2]
    zeros = jnp.zeros_like(RXx)
    neg_skew = jnp.stack(
        [
            jnp.stack([zeros, RXz, -RXy], -1),
            jnp.stack([-RXz, zeros, RXx], -1),
            jnp.stack([RXy, -RXx, zeros], -1),
        ],
        axis=-2,
    )
    J_phi = duv_dx @ neg_skew
    Jc = jnp.concatenate([J_phi, duv_dx], axis=-1)
    Jp = duv_dx @ Rg

    mask = prob.valid & (z > 1e-6)
    w = jnp.where(mask, 1.0, 0.0)
    if robust:
        nrm = jnp.linalg.norm(r, axis=-1)
        w = w * jnp.where(nrm <= HUBER_DELTA, 1.0,
                          HUBER_DELTA / jnp.maximum(nrm, 1e-12))
    sw = jnp.sqrt(w)[..., None]
    r = jnp.where(mask[..., None], r * sw, 0.0)
    Jc = Jc * sw[..., None]
    Jp = Jp * sw[..., None]
    fixed = jnp.einsum("lok,k->lo", oh, prob.cam_fixed.astype(r.dtype))
    Jc = jnp.where(fixed[..., None, None] > 0.5, 0.0, Jc)
    return r, Jc, Jp, z


def _cost(prob: DenseBAProblem, oh, R, t, X, robust):
    Rg = jnp.einsum("lok,kij->loij", oh, R)
    tg = jnp.einsum("lok,ki->loi", oh, t)
    x_cam = jnp.einsum("loij,lj->loi", Rg, X) + tg
    z = x_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy, cx, cy = prob.K4[0], prob.K4[1], prob.K4[2], prob.K4[3]
    u = fx * x_cam[..., 0] / zs + cx
    v = fy * x_cam[..., 1] / zs + cy
    r2 = ((u - prob.uv[..., 0]) ** 2 + (v - prob.uv[..., 1]) ** 2) / jnp.maximum(
        prob.sigma2, 1e-12
    )
    if robust:
        nrm = jnp.sqrt(jnp.maximum(r2, 1e-20))
        rho = jnp.where(nrm <= HUBER_DELTA, 0.5 * r2,
                        HUBER_DELTA * (nrm - 0.5 * HUBER_DELTA))
    else:
        rho = 0.5 * r2
    rho = jnp.where(z > 1e-6, rho, CHEIRALITY_PENALTY)
    return jnp.sum(jnp.where(prob.valid, rho, 0.0))


@partial(jax.jit, static_argnames=("config",))
def dense_ba_solve(prob: DenseBAProblem, cam_rt6, points, config=LMConfig()):
    """LM/Schur-PCG solve in the dense landmark-major layout.

    cam_rt6: [K, 6]; points: [L, 3].  Returns (cam_rt6', points', info).
    """
    K = cam_rt6.shape[0]
    R0 = aa_to_rotmat(cam_rt6[:, :3])
    t0 = cam_rt6[:, 3:]
    oh = _onehot(prob.cam_idx, K, cam_rt6.dtype)
    eye6 = jnp.eye(6, dtype=cam_rt6.dtype)
    eye3 = jnp.eye(3, dtype=cam_rt6.dtype)

    if config.mxu_bf16:
        oh_c = oh.astype(jnp.bfloat16)
        cast = lambda x: x.astype(jnp.bfloat16)
        ein = partial(jnp.einsum, preferred_element_type=jnp.float32)
    else:
        oh_c = oh
        cast = lambda x: x
        ein = jnp.einsum

    def step(state, _):
        R, t, X, lam, nu, cost, done = state
        r, Jc, Jp, _z = _residuals_jacobians(prob, oh, R, t, X, config.robust)

        Uc = jnp.einsum("lori,lorj->loij", Jc, Jc)
        U = ein("lok,loij->kij", oh_c, cast(Uc))
        g_c = ein("lok,lori,lor->ki", oh_c, cast(Jc), cast(r))
        V = jnp.einsum("lori,lorj->lij", Jp, Jp)
        g_p = jnp.einsum("lori,lor->li", Jp, r)
        W = jnp.einsum("lori,lorj->loij", Jc, Jp)

        dU = jnp.clip(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6, None)
        dV = jnp.clip(jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6, None)
        U = U + (lam * dU)[..., None] * eye6
        V = V + (lam * dV)[..., None] * eye3
        U = jnp.where(prob.cam_fixed[:, None, None], eye6, U)
        V = jnp.where(prob.pt_valid[:, None, None], V, eye3)
        g_c = jnp.where(prob.cam_fixed[:, None], 0.0, g_c)
        V_inv = _sym3_inv(V)

        W_c = cast(W)

        # Schur RHS
        zv = jnp.einsum("lij,lj->li", V_inv, g_p)
        red = ein("lok,loij,lj->ki", oh_c, W_c, cast(zv))
        b = -(g_c - red)

        if config.solver == "dense":
            # exact DENSE_SCHUR: factorize V^-1 = C C^T (Cholesky), form
            # P[l,k,i,m] = sum_o oh[l,o,k] (W[l,o] @ C[l])[i,m]; then
            # S = U - sum_l P_l P_l^T — one MXU-shaped contraction instead
            # of pcg_iters sequential matvecs.  Right for K up to a few
            # hundred cameras (the Ceres DENSE_SCHUR regime).
            C = jnp.linalg.cholesky(V_inv)  # [L,3,3]
            G = jnp.einsum("loij,ljm->loim", W, C)  # [L,O,6,3]
            Pf = jnp.einsum("lok,loim->lkim", oh, G)  # [L,K,6,3]
            S_minus = jnp.einsum("lkim,lnjm->kinj", Pf, Pf)  # [K,6,K,6]
            Kn = U.shape[0]
            S_full = -S_minus
            S_full = S_full.at[jnp.arange(Kn), :, jnp.arange(Kn), :].add(U)
            S_mat = S_full.reshape(Kn * 6, Kn * 6)
            S_mat = S_mat + 1e-8 * jnp.eye(Kn * 6, dtype=S_mat.dtype)
            dc = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S_mat), b.reshape(-1)
            ).reshape(Kn, 6)
        else:
            Minv = jnp.linalg.inv(U)

            def matvec(x):
                xg = ein("lok,ki->loi", oh_c, cast(x))
                y = jnp.einsum("loij,loi->lj", W, xg)
                zz = jnp.einsum("lij,lj->li", V_inv, y)
                back = ein("lok,loij,lj->ki", oh_c, W_c, cast(zz))
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

        # back-substitution (fully local per landmark)
        xg = jnp.einsum("lok,ki->loi", oh, dc)
        y = jnp.einsum("loij,loi->lj", W, xg)
        dp = -jnp.einsum("lij,lj->li", V_inv, g_p + y)
        dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)

        dphi = jnp.where(prob.cam_fixed[:, None], 0.0, dc[:, :3])
        dt = jnp.where(prob.cam_fixed[:, None], 0.0, dc[:, 3:])
        R_new = aa_to_rotmat(dphi) @ R
        t_new = t + dt
        X_new = X + dp

        new_cost = _cost(prob, oh, R_new, t_new, X_new, config.robust)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        sel = lambda a, b2: jnp.where(accept & ~done, a, b2)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        return (
            sel(R_new, R), sel(t_new, t), sel(X_new, X),
            jnp.where(done, lam, jnp.where(accept, lam / 3.0, lam * nu)),
            jnp.where(done, nu, jnp.where(accept, 2.0, nu * 2.0)),
            sel(new_cost, cost),
            done | (accept & (rel < config.rtol)),
        ), new_cost

    cost0 = _cost(prob, oh, R0, t0, points, config.robust)
    init = (
        R0, t0, points, jnp.asarray(config.lam0, cost0.dtype),
        jnp.asarray(2.0, cost0.dtype), cost0, jnp.asarray(False),
    )
    (R, t, X, _, _, cost, _), hist = jax.lax.scan(
        step, init, None, length=config.max_iters
    )
    cams_out = jnp.concatenate([rotmat_to_aa(R), t], -1)
    return cams_out, X, {"cost0": cost0, "cost": cost, "cost_history": hist}
