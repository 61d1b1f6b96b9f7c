import numpy as np

from bundleadjustment_tpu.data.synthetic import _aa_to_R
from bundleadjustment_tpu.metrics import (
    align_horn_scale,
    ate_rmse,
    evaluate_ate,
    icp_align,
    reconstruction_error,
)


def make_traj(rng, n=50):
    t = np.linspace(0, 4 * np.pi, n)
    return np.stack([np.cos(t), np.sin(t), 0.1 * t], -1)


def test_horn_alignment_recovers_similarity(rng):
    traj = make_traj(rng)
    R_gt = _aa_to_R(np.array([0.3, -0.2, 0.5]))
    s_gt, t_gt = 2.5, np.array([1.0, -2.0, 0.5])
    # model = inverse-transformed data: data = s R model + t
    model = traj
    data = s_gt * model @ R_gt.T + t_gt
    R, t, s = align_horn_scale(model, data)
    np.testing.assert_allclose(s, s_gt, rtol=1e-6)
    np.testing.assert_allclose(R, R_gt, atol=1e-8)
    np.testing.assert_allclose(t, t_gt, atol=1e-6)
    assert ate_rmse(model, data) < 1e-9


def test_ate_rmse_measures_noise(rng):
    traj = make_traj(rng)
    noisy = traj + rng.normal(0, 0.01, traj.shape)
    r = ate_rmse(noisy, traj)
    assert 0.003 < r < 0.03


def test_evaluate_ate_with_timestamps(rng):
    traj = make_traj(rng)
    ts = np.arange(50) * 0.1
    # estimated trajectory misses some frames and is shifted
    est_idx = np.arange(0, 50, 2)
    stats = evaluate_ate(
        ts[est_idx] + 0.005, traj[est_idx] + 0.3, ts, traj
    )
    assert stats["n_pairs"] == 25
    assert stats["rmse"] < 1e-6  # rigid shift removed by alignment


def test_icp_aligns_rotated_cloud(rng):
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    R_gt = _aa_to_R(np.array([0.05, 0.08, -0.03]))
    t_gt = np.array([0.05, -0.02, 0.04])
    src = (pts @ R_gt.T + t_gt).astype(np.float32)
    res = icp_align(src, pts, max_iters=30, max_corr_dist=0.5)
    # recovered transform must undo (R_gt, t_gt)
    np.testing.assert_allclose(res["R"] @ R_gt, np.eye(3), atol=5e-3)
    assert res["fitness"] < 1e-4


def test_reconstruction_error_zero_for_identical(rng):
    pts = rng.uniform(-1, 1, (300, 3))
    err, _ = reconstruction_error(pts, pts)
    assert err < 1e-6


def test_reconstruction_error_small_perturbation(rng):
    # the reference's second gtest: perturbed clouds -> 0 < err < 0.1
    # (ba_project/tests/ReconstructionError_test.cc:56-63)
    pts = rng.uniform(-1, 1, (300, 3))
    noisy = pts + rng.normal(0, 0.01, pts.shape)
    err, _ = reconstruction_error(noisy, pts)
    assert 0.0 < err < 0.1
