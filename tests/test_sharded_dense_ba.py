"""Distributed dense-layout BA on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
from bundleadjustment_tpu.parallel.sharded_dense_ba import (
    AXIS,
    shard_dense_problem,
    sharded_dense_ba_solve,
)
from bundleadjustment_tpu.solvers import LMConfig
from bundleadjustment_tpu.solvers.dense_ba import dense_ba_solve, densify_problem


def _build(sc, n_shards):
    K = sc.extr_init.shape[0]
    cam_fixed = np.zeros(K, bool)
    cam_fixed[:2] = True
    sc.extr_init[1] = sc.extr_gt[1]
    return shard_dense_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid,
        cam_fixed, sc.points_init, n_shards,
    ), cam_fixed


def test_sharded_dense_matches_single_device():
    sc = make_synthetic_scene(n_cams=8, n_pts=256, pixel_noise=0.3, seed=51)
    (prob, pts_sharded, shard_of, local_of), cam_fixed = _build(sc, 8)
    mesh = Mesh(np.array(jax.devices()), (AXIS,))
    cfg = LMConfig(max_iters=8, solver="pcg", pcg_iters=60)
    cams_s, pts_s, info_s = sharded_dense_ba_solve(
        prob, sc.extr_init, pts_sharded, cfg, mesh
    )

    dense, _ = densify_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid, cam_fixed, 256
    )
    cams_1, pts_1, info_1 = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init), cfg
    )
    np.testing.assert_allclose(float(info_s["cost0"]), float(info_1["cost0"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cams_s), np.asarray(cams_1), atol=5e-3)
    pts_full = np.asarray(pts_s)[shard_of, local_of]
    np.testing.assert_allclose(pts_full, np.asarray(pts_1), atol=2e-2)


def test_sharded_dense_converges_to_gt():
    sc = make_synthetic_scene(n_cams=10, n_pts=400, pixel_noise=0.0, seed=52)
    (prob, pts_sharded, shard_of, local_of), _ = _build(sc, 8)
    cams, pts, info = sharded_dense_ba_solve(
        prob, sc.extr_init, pts_sharded,
        LMConfig(max_iters=12, solver="pcg", pcg_iters=60),
    )
    assert float(info["cost"]) < float(info["cost0"]) * 1e-3
    np.testing.assert_allclose(np.asarray(cams), sc.extr_gt, atol=5e-3)


def test_sharded_exact_schur_matches_single_device():
    """solver='dense' under shard_map: QQ^T and U partials psum to the exact
    replicated Schur system, so the sharded solve must track the single-device
    exact solve."""
    sc = make_synthetic_scene(n_cams=8, n_pts=256, pixel_noise=0.3, seed=53)
    (prob, pts_sharded, shard_of, local_of), cam_fixed = _build(sc, 8)
    cfg = LMConfig(max_iters=8, solver="dense")
    cams_s, pts_s, info_s = sharded_dense_ba_solve(
        prob, sc.extr_init, pts_sharded, cfg
    )
    dense, _ = densify_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid, cam_fixed, 256
    )
    cams_1, pts_1, info_1 = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init), cfg
    )
    np.testing.assert_allclose(np.asarray(cams_s), np.asarray(cams_1), atol=5e-3)
    pts_full = np.asarray(pts_s)[shard_of, local_of]
    np.testing.assert_allclose(pts_full, np.asarray(pts_1), atol=2e-2)
