import numpy as np
import jax.numpy as jnp

from bundleadjustment_tpu.geometry import (
    backproject,
    make_intrinsics,
    project,
    project_rt,
    triangulate_dlt,
    triangulate_gated,
)
from bundleadjustment_tpu.geometry.triangulation import projection_matrix, median_scene_depth
from bundleadjustment_tpu.geometry.se3 import aa_to_rotmat

K4 = make_intrinsics(525.0, 525.0, 319.5, 239.5)


def make_scene(rng, n=100):
    """Points in front of two cameras with a small baseline."""
    X = rng.uniform([-1, -1, 2], [1, 1, 5], size=(n, 3)).astype(np.float32)
    extr1 = np.zeros(6, np.float32)
    extr2 = np.array([0.02, -0.03, 0.01, 0.3, 0.02, 0.05], np.float32)
    return X, jnp.asarray(extr1), jnp.asarray(extr2)


def test_project_backproject_roundtrip(rng):
    x_cam = rng.uniform([-1, -1, 1], [1, 1, 5], size=(50, 3)).astype(np.float32)
    uv, z = project(K4, jnp.asarray(x_cam))
    np.testing.assert_allclose(np.asarray(z), x_cam[:, 2], atol=1e-6)
    back = backproject(K4, uv, z)
    np.testing.assert_allclose(np.asarray(back), x_cam, atol=1e-3)


def test_triangulate_exact(rng):
    X, e1, e2 = make_scene(rng)
    uv1, z1 = project_rt(K4, e1, jnp.asarray(X))
    uv2, z2 = project_rt(K4, e2, jnp.asarray(X))
    assert np.all(np.asarray(z1) > 0) and np.all(np.asarray(z2) > 0)
    P1 = projection_matrix(K4, e1)
    P2 = projection_matrix(K4, e2)
    Xt = triangulate_dlt(P1, P2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(Xt), X, atol=5e-2)


def test_triangulate_gated_accepts_good_rejects_behind(rng):
    X, e1, e2 = make_scene(rng, 64)
    # flip half the points behind the cameras
    X[32:, 2] = -X[32:, 2] - 4.0
    uv1, _ = project_rt(K4, e1, jnp.asarray(X))
    uv2, _ = project_rt(K4, e2, jnp.asarray(X))
    s2 = jnp.ones(64)
    valid = jnp.ones(64, bool)
    pts, ok = triangulate_gated(K4, e1, e2, uv1, uv2, s2, s2, valid)
    ok = np.asarray(ok)
    assert ok[:32].mean() > 0.9
    assert not ok[32:].any()
    np.testing.assert_allclose(np.asarray(pts)[:32], X[:32], atol=0.1)


def test_triangulate_gated_rejects_noise(rng):
    X, e1, e2 = make_scene(rng, 32)
    uv1, _ = project_rt(K4, e1, jnp.asarray(X))
    uv2, _ = project_rt(K4, e2, jnp.asarray(X))
    # corrupt second view observations grossly -> chi2 gate must reject
    uv2 = uv2 + jnp.asarray(rng.normal(0, 50, size=(32, 2)).astype(np.float32))
    s2 = jnp.ones(32)
    pts, ok = triangulate_gated(K4, e1, e2, uv1, uv2, s2, s2, jnp.ones(32, bool))
    assert np.asarray(ok).mean() < 0.2


def test_median_scene_depth(rng):
    X, e1, _ = make_scene(rng, 101)
    valid = jnp.ones(101, bool)
    med = float(median_scene_depth(e1, jnp.asarray(X), valid))
    np.testing.assert_allclose(med, np.median(X[:, 2]), atol=0.1)
