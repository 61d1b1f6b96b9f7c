import numpy as np
import jax
import jax.numpy as jnp

from bundleadjustment_tpu.data.synthetic import _aa_to_R
from bundleadjustment_tpu.geometry.epipolar import (
    decompose_essential,
    estimate_essential,
    estimate_homography,
    recover_pose_two_view,
)
from bundleadjustment_tpu.geometry.se3 import aa_to_rotmat

K4 = jnp.array([525.0, 525.0, 319.5, 239.5])


def two_view_scene(rng, n=200, planar=False, noise=0.3, outlier_frac=0.1):
    """GT relative motion (frame1 at identity), observations in both views."""
    if planar:
        # points on the z=4 plane
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)], -1
        )
    else:
        X = rng.uniform([-2, -1.5, 3], [2, 1.5, 7], size=(n, 3))
    rvec = np.array([0.01, -0.08, 0.02])
    t = np.array([0.4, 0.05, -0.1])
    R = _aa_to_R(rvec)
    x1 = X
    x2 = X @ R.T + t
    uv1 = np.stack([525 * x1[:, 0] / x1[:, 2] + 319.5, 525 * x1[:, 1] / x1[:, 2] + 239.5], -1)
    uv2 = np.stack([525 * x2[:, 0] / x2[:, 2] + 319.5, 525 * x2[:, 1] / x2[:, 2] + 239.5], -1)
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    idx = rng.choice(n, n_out, replace=False)
    uv2[idx] += rng.uniform(30, 120, (n_out, 2))
    gt_out = np.zeros(n, bool)
    gt_out[idx] = True
    return (
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        np.concatenate([rvec, t]).astype(np.float32),
        gt_out,
    )


def _angle_between(a, b):
    a, b = a / np.linalg.norm(a), b / np.linalg.norm(b)
    return np.degrees(np.arccos(np.clip(a @ b, -1, 1)))


def test_essential_ransac_and_decompose(rng):
    uv1, uv2, rt_gt, gt_out = two_view_scene(rng)
    valid = jnp.ones(uv1.shape[0], bool)
    key = jax.random.PRNGKey(0)
    E, score, inl = estimate_essential(key, uv1, uv2, valid, K4, n_hyp=512)
    inl_np = np.asarray(inl)
    # inliers should exclude the corrupted matches
    assert inl_np[~gt_out].mean() > 0.9
    assert inl_np[gt_out].mean() < 0.1

    rt, n_good, X, good = decompose_essential(E, uv1, uv2, inl, K4)
    rt = np.asarray(rt)
    # rotation within 0.5 deg
    R_est = np.asarray(aa_to_rotmat(jnp.asarray(rt[:3])))
    R_gt = np.asarray(aa_to_rotmat(jnp.asarray(rt_gt[:3])))
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1))
    )
    assert ang < 0.5
    # translation direction within 2 deg (scale is unobservable)
    assert _angle_between(rt[3:], rt_gt[3:]) < 2.0
    assert int(n_good) > 150


def test_recover_pose_general_scene_prefers_essential(rng):
    uv1, uv2, rt_gt, _ = two_view_scene(rng, outlier_frac=0.05)
    valid = jnp.ones(uv1.shape[0], bool)
    res = recover_pose_two_view(jax.random.PRNGKey(1), uv1, uv2, valid, K4, n_hyp=512)
    assert not bool(res.used_homography)
    rt = np.asarray(res.rt6)
    assert _angle_between(rt[3:], rt_gt[3:]) < 3.0


def test_recover_pose_planar_scene_uses_homography(rng):
    uv1, uv2, rt_gt, _ = two_view_scene(rng, planar=True, outlier_frac=0.05)
    valid = jnp.ones(uv1.shape[0], bool)
    res = recover_pose_two_view(jax.random.PRNGKey(2), uv1, uv2, valid, K4, n_hyp=512)
    assert bool(res.used_homography)
    rt = np.asarray(res.rt6)
    R_est = np.asarray(aa_to_rotmat(jnp.asarray(rt[:3])))
    R_gt = np.asarray(aa_to_rotmat(jnp.asarray(rt_gt[:3])))
    ang = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1)))
    assert ang < 2.0
    assert _angle_between(rt[3:], rt_gt[3:]) < 5.0


def test_recover_pose_ok_flag(rng):
    # E-path acceptance mirrors the reference's >100-inlier requirement
    # (SfMHelper.cpp:653-659): a general scene with only 60 correspondences
    # cannot clear it and must report failure
    uv1, uv2, _, _ = two_view_scene(rng, n=60, outlier_frac=0.0)
    valid = jnp.ones(uv1.shape[0], bool)
    res = recover_pose_two_view(jax.random.PRNGKey(4), uv1, uv2, valid, K4, n_hyp=512)
    assert not bool(res.used_homography)
    assert not bool(res.ok)

    # with ample support the same scene passes
    uv1, uv2, _, _ = two_view_scene(rng, n=300, outlier_frac=0.05)
    valid = jnp.ones(uv1.shape[0], bool)
    res = recover_pose_two_view(jax.random.PRNGKey(5), uv1, uv2, valid, K4, n_hyp=512)
    assert bool(res.ok)

    # planar H-path: acceptance only needs a surviving decomposition
    uv1, uv2, _, _ = two_view_scene(rng, n=80, planar=True, outlier_frac=0.0)
    valid = jnp.ones(uv1.shape[0], bool)
    res = recover_pose_two_view(jax.random.PRNGKey(6), uv1, uv2, valid, K4, n_hyp=512)
    assert bool(res.used_homography)
    assert bool(res.ok)


def test_homography_on_planar(rng):
    uv1, uv2, rt_gt, gt_out = two_view_scene(rng, planar=True, outlier_frac=0.1)
    valid = jnp.ones(uv1.shape[0], bool)
    H, score, inl = estimate_homography(jax.random.PRNGKey(3), uv1, uv2, valid, n_hyp=512)
    inl_np = np.asarray(inl)
    assert inl_np[~gt_out].mean() > 0.9
    assert inl_np[gt_out].mean() < 0.1
