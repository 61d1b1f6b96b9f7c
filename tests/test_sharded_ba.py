"""Multi-device Schur BA on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
from bundleadjustment_tpu.parallel import shard_problem, sharded_ba_solve
from bundleadjustment_tpu.parallel.sharded_ba import AXIS, unshard_points
from bundleadjustment_tpu.solvers import BAProblem, LMConfig, ba_solve


def _build(sc, n_shards):
    cam_fixed = np.zeros(sc.extr_init.shape[0], bool)
    cam_fixed[:2] = True
    sc.extr_init[1] = sc.extr_gt[1]
    sharded, shard_of, local_of = shard_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid,
        cam_fixed, sc.points_init, n_shards,
    )
    return sharded._replace(n_cams=sc.extr_init.shape[0]), shard_of, local_of, cam_fixed


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    sc = make_synthetic_scene(n_cams=8, n_pts=256, pixel_noise=0.3, seed=11)
    sharded, shard_of, local_of, cam_fixed = _build(sc, 8)
    mesh = Mesh(np.array(jax.devices()), (AXIS,))
    cfg = LMConfig(max_iters=8, solver="pcg", pcg_iters=60)
    cams_s, pts_s, info_s = sharded_ba_solve(sharded, sc.extr_init, cfg, mesh)

    prob = BAProblem(
        K4=jnp.asarray(sc.K4),
        cam_idx=jnp.asarray(sc.cam_idx),
        pt_idx=jnp.asarray(sc.pt_idx),
        uv=jnp.asarray(sc.uv),
        sigma2=jnp.asarray(sc.sigma2),
        valid=jnp.asarray(sc.valid),
        cam_fixed=jnp.asarray(cam_fixed),
        pt_fixed=jnp.zeros(256, bool),
    )
    cams_1, pts_1, info_1 = ba_solve(prob, jnp.asarray(sc.extr_init),
                                     jnp.asarray(sc.points_init), cfg)

    np.testing.assert_allclose(float(info_s["cost0"]), float(info_1["cost0"]), rtol=1e-4)
    # both converge to (numerically) the same optimum
    np.testing.assert_allclose(np.asarray(cams_s), np.asarray(cams_1), atol=5e-3)
    assert float(info_s["cost"]) <= float(info_1["cost"]) * 1.1 + 1e-3
    pts_full = unshard_points(pts_s, shard_of, local_of)
    np.testing.assert_allclose(pts_full, np.asarray(pts_1), atol=2e-2)


def test_sharded_converges_to_gt():
    sc = make_synthetic_scene(n_cams=10, n_pts=400, pixel_noise=0.0, seed=12)
    sharded, shard_of, local_of, _ = _build(sc, 8)
    cams, pts_s, info = sharded_ba_solve(
        sharded, sc.extr_init, LMConfig(max_iters=12, solver="pcg", pcg_iters=60)
    )
    assert float(info["cost"]) < float(info["cost0"]) * 1e-3
    np.testing.assert_allclose(np.asarray(cams), sc.extr_gt, atol=5e-3)


def test_sharded_works_on_subset_mesh():
    """4-device mesh with 4-way sharding."""
    sc = make_synthetic_scene(n_cams=6, n_pts=128, pixel_noise=0.2, seed=13)
    sharded, shard_of, local_of, _ = _build(sc, 4)
    mesh = Mesh(np.array(jax.devices()[:4]), (AXIS,))
    cams, pts_s, info = sharded_ba_solve(
        sharded, sc.extr_init, LMConfig(max_iters=6, solver="pcg"), mesh
    )
    assert float(info["cost"]) < float(info["cost0"])
