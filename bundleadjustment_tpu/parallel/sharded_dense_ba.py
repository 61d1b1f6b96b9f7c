"""Distributed dense-layout BA: the fast single-chip engine, sharded.

`parallel/sharded_ba.py` distributes the *flat* observation-table engine —
correct, but its segment_sum scatters are slow on TPU (see BASELINE.md).
This module shards the **dense landmark-major** engine
(`solvers/dense_ba.py`) instead: the [L, O] landmark blocks split across the
mesh axis, every point-side quantity stays device-local and scatter-free,
and the camera-side one-hot MXU contractions produce per-shard partials that
are `psum`-reduced — the same communication profile as the flat sharded
engine (traffic ~ cameras) with the dense engine's per-device speed.

Solver: Schur + block-Jacobi PCG (matrix-free, one [K,6] psum per matvec).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bundleadjustment_tpu.geometry.se3 import aa_to_rotmat, rotmat_to_aa
from bundleadjustment_tpu.solvers.dense_ba import (
    DenseBAProblem,
    _cost,
    _onehot,
    _residuals_jacobians,
    densify_problem,
)
from bundleadjustment_tpu.solvers.lm import LMConfig
from bundleadjustment_tpu.solvers.schur import _sym3_inv

AXIS = "shard"


class ShardedDenseBAProblem(NamedTuple):
    """Dense problem with a leading device axis: arrays [D, Ls, ...]."""

    K4: jnp.ndarray
    cam_idx: jnp.ndarray  # [D, Ls, O]
    uv: jnp.ndarray  # [D, Ls, O, 2]
    sigma2: jnp.ndarray  # [D, Ls, O]
    valid: jnp.ndarray  # [D, Ls, O]
    cam_fixed: jnp.ndarray  # [K]
    pt_valid: jnp.ndarray  # [D, Ls]


def shard_dense_problem(K4, cam_idx, pt_idx, uv, sigma2, valid, cam_fixed,
                        points, n_shards, max_obs=16):
    """Round-robin landmark partition of a flat table into sharded dense
    blocks.  Returns (problem, points_sharded [D,Ls,3], shard_of, local_of)."""
    dense, _dropped = densify_problem(
        K4, cam_idx, pt_idx, uv, sigma2, valid, cam_fixed,
        np.asarray(points).shape[0], max_obs=max_obs,
    )
    L = np.asarray(points).shape[0]
    shard_of = np.arange(L) % n_shards
    local_of = np.arange(L) // n_shards
    Ls = (L + n_shards - 1) // n_shards

    def scatter(arr, fill=0):
        arr = np.asarray(arr)
        out = np.full((n_shards, Ls) + arr.shape[1:], fill, arr.dtype)
        out[shard_of, local_of] = arr
        return out

    prob = ShardedDenseBAProblem(
        K4=dense.K4,
        cam_idx=jnp.asarray(scatter(dense.cam_idx)),
        uv=jnp.asarray(scatter(dense.uv)),
        sigma2=jnp.asarray(scatter(dense.sigma2, 1)),
        valid=jnp.asarray(scatter(dense.valid, False)),
        cam_fixed=dense.cam_fixed,
        pt_valid=jnp.asarray(scatter(np.asarray(dense.pt_valid), False)),
    )
    pts_sharded = jnp.asarray(scatter(np.asarray(points, np.float32)))
    return prob, pts_sharded, shard_of, local_of


def _shard_body(K4, cam_idx, uv, sigma2, valid, cam_fixed, pt_valid,
                points0, R0, t0, config: LMConfig):
    """Whole LM solve for one landmark shard (camera state replicated)."""
    local = DenseBAProblem(
        K4=K4, cam_idx=cam_idx, uv=uv, sigma2=sigma2, valid=valid,
        cam_fixed=cam_fixed, pt_valid=pt_valid,
    )
    K = R0.shape[0]
    oh = _onehot(cam_idx, K, points0.dtype)
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    psum = lambda x: jax.lax.psum(x, AXIS)

    def cost_of(R, t, X):
        return psum(_cost(local, oh, R, t, X, config.robust))

    def step(state, _):
        R, t, X, lam, nu, cost, done = state
        r, Jc, Jp, _z = _residuals_jacobians(local, oh, R, t, X, config.robust)
        Uc = jnp.einsum("lori,lorj->loij", Jc, Jc)
        U = psum(jnp.einsum("lok,loij->kij", oh, Uc))
        g_c = psum(jnp.einsum("lok,lori,lor->ki", oh, Jc, r))
        V = jnp.einsum("lori,lorj->lij", Jp, Jp)
        g_p = jnp.einsum("lori,lor->li", Jp, r)
        W = jnp.einsum("lori,lorj->loij", Jc, Jp)

        dU = jnp.clip(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6, None)
        dV = jnp.clip(jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6, None)
        U = U + (lam * dU)[..., None] * eye6
        V = V + (lam * dV)[..., None] * eye3
        U = jnp.where(cam_fixed[:, None, None], eye6, U)
        V = jnp.where(pt_valid[:, None, None], V, eye3)
        g_c = jnp.where(cam_fixed[:, None], 0.0, g_c)
        V_inv = _sym3_inv(V)

        zv = jnp.einsum("lij,lj->li", V_inv, g_p)
        red = psum(jnp.einsum("lok,loij,lj->ki", oh, W, zv))
        b = -(g_c - red)
        Minv = jnp.linalg.inv(U)

        def matvec(x):
            xg = jnp.einsum("lok,ki->loi", oh, x)
            y = jnp.einsum("loij,loi->lj", W, xg)
            zz = jnp.einsum("lij,lj->li", V_inv, y)
            back = psum(jnp.einsum("lok,loij,lj->ki", oh, W, zz))
            return jnp.einsum("kij,kj->ki", U, x) - back

        def cg_body(s, _):
            x, rr, p, rz = s
            Sp = matvec(p)
            alpha = rz / jnp.where(jnp.abs(jnp.sum(p * Sp)) < 1e-30, 1e-30,
                                   jnp.sum(p * Sp))
            x = x + alpha * p
            rr = rr - alpha * Sp
            zp = jnp.einsum("kij,kj->ki", Minv, rr)
            rz_new = jnp.sum(rr * zp)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            return (x, rr, zp + beta * p, rz_new), None

        x0 = jnp.zeros_like(b)
        z0 = jnp.einsum("kij,kj->ki", Minv, b)
        (dc, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, b, z0, jnp.sum(b * z0)), None, length=config.pcg_iters
        )

        xg = jnp.einsum("lok,ki->loi", oh, dc)
        y = jnp.einsum("loij,loi->lj", W, xg)
        dp = -jnp.einsum("lij,lj->li", V_inv, g_p + y)
        dp = jnp.where(pt_valid[:, None], dp, 0.0)

        dphi = jnp.where(cam_fixed[:, None], 0.0, dc[:, :3])
        dt = jnp.where(cam_fixed[:, None], 0.0, dc[:, 3:])
        R_new = aa_to_rotmat(dphi) @ R
        t_new = t + dt
        X_new = X + dp
        new_cost = cost_of(R_new, t_new, X_new)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        sel = lambda a, b2: jnp.where(accept & ~done, a, b2)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        return (
            sel(R_new, R), sel(t_new, t), sel(X_new, X),
            jnp.where(done, lam, jnp.where(accept, lam / 3.0, lam * nu)),
            jnp.where(done, nu, jnp.where(accept, 2.0, nu * 2.0)),
            sel(new_cost, cost),
            done | (accept & (rel < config.rtol)),
        ), None

    cost0 = cost_of(R0, t0, points0)
    init = (R0, t0, points0, jnp.asarray(config.lam0), jnp.asarray(2.0),
            cost0, jnp.asarray(False))
    (R, t, X, _, _, cost, _), _ = jax.lax.scan(
        step, init, None, length=config.max_iters
    )
    return R, t, X, cost0, cost


@partial(jax.jit, static_argnames=("config", "mesh"))
def _solve_jit(prob: ShardedDenseBAProblem, cams_rt6, points_sharded, config,
               mesh):
    R0 = aa_to_rotmat(cams_rt6[:, :3])
    t0 = cams_rt6[:, 3:]

    def wrapped(ci, uv, sg, vd, pv, pts):
        R, t, X, cost0, cost = _shard_body(
            prob.K4, ci[0], uv[0], sg[0], vd[0], prob.cam_fixed, pv[0],
            pts[0], R0, t0, config,
        )
        return R, t, X[None], cost0, cost

    shard = P(AXIS)
    rep = P()
    fn = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(shard,) * 6,
        out_specs=(rep, rep, shard, rep, rep),
    )
    R, t, X, cost0, cost = fn(
        prob.cam_idx, prob.uv, prob.sigma2, prob.valid, prob.pt_valid,
        points_sharded,
    )
    cams = jnp.concatenate([rotmat_to_aa(R), t], -1)
    return cams, X, {"cost0": cost0, "cost": cost}


def sharded_dense_ba_solve(prob, cams_rt6, points_sharded, config=None,
                           mesh=None):
    """Landmark-sharded dense-layout LM solve over a device mesh."""
    if config is None:
        config = LMConfig(max_iters=10, solver="pcg")
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (AXIS,))
    return _solve_jit(prob, jnp.asarray(cams_rt6), points_sharded, config, mesh)
