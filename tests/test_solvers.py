import numpy as np
import jax
import jax.numpy as jnp

from bundleadjustment_tpu.data.synthetic import make_synthetic_scene, _aa_to_R
from bundleadjustment_tpu.geometry.se3 import aa_to_rotmat
from bundleadjustment_tpu.solvers import (
    BAProblem,
    LMConfig,
    ba_solve,
    motion_only_ba,
    residuals_and_jacobians,
)
from bundleadjustment_tpu.solvers import residuals as res_mod
from bundleadjustment_tpu.solvers import schur as schur_mod
from bundleadjustment_tpu.solvers.lm import robust_cost


def problem_from_scene(sc, cam_fixed=None, pt_fixed=None):
    K = sc.extr_init.shape[0]
    L = sc.points_init.shape[0]
    if cam_fixed is None:
        cam_fixed = np.zeros(K, bool)
        cam_fixed[0] = True  # gauge anchor
    if pt_fixed is None:
        pt_fixed = np.zeros(L, bool)
    return BAProblem(
        K4=jnp.asarray(sc.K4),
        cam_idx=jnp.asarray(sc.cam_idx),
        pt_idx=jnp.asarray(sc.pt_idx),
        uv=jnp.asarray(sc.uv),
        sigma2=jnp.asarray(sc.sigma2),
        valid=jnp.asarray(sc.valid),
        cam_fixed=jnp.asarray(cam_fixed),
        pt_fixed=jnp.asarray(pt_fixed),
    )


def test_jacobians_match_autodiff():
    sc = make_synthetic_scene(n_cams=3, n_pts=40, pixel_noise=0.0, seed=1)
    prob = problem_from_scene(sc, cam_fixed=np.zeros(3, bool))
    R, t = res_mod.cams_to_Rt(jnp.asarray(sc.extr_init))
    pts = jnp.asarray(sc.points_init)

    r0, Jc, Jp, w = residuals_and_jacobians(prob, R, t, pts, robust=False)

    # exact autodiff check of J wrt the local (left-multiplicative) perturbation
    def residuals_of_perturbation(dphi, dt, dX):
        R2 = aa_to_rotmat(dphi) @ R
        return res_mod.reprojection_residuals(prob, R2, t + dt, pts + dX)[0]

    z3 = jnp.zeros((3, 3))
    zX = jnp.zeros_like(pts)
    J_phi = jax.jacobian(lambda a: residuals_of_perturbation(a, z3, zX))(z3)
    J_dt = jax.jacobian(lambda a: residuals_of_perturbation(z3, a, zX))(z3)
    J_X = jax.jacobian(lambda a: residuals_of_perturbation(z3, z3, a))(zX)

    ci = np.asarray(prob.cam_idx)
    pi = np.asarray(prob.pt_idx)
    for obs in [0, 5, 17, 31]:
        k, l = ci[obs], pi[obs]
        np.testing.assert_allclose(
            np.asarray(Jc[obs, :, :3]), np.asarray(J_phi[obs, :, k, :]), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(Jc[obs, :, 3:]), np.asarray(J_dt[obs, :, k, :]), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(Jp[obs]), np.asarray(J_X[obs, :, l, :]), atol=1e-3, rtol=1e-4
        )


def test_schur_matches_dense_normal_equations():
    """Schur-reduced solve == dense solve of the full (damped) normal equations."""
    sc = make_synthetic_scene(n_cams=4, n_pts=30, pixel_noise=0.3, seed=2)
    prob = problem_from_scene(sc)
    R, t = res_mod.cams_to_Rt(jnp.asarray(sc.extr_init))
    pts = jnp.asarray(sc.points_init)
    r, Jc, Jp, _ = residuals_and_jacobians(prob, R, t, pts, robust=False)
    K, L, N = 4, 30, r.shape[0]
    lam = 1e-3

    blocks = schur_mod.build_blocks(
        r, Jc, Jp, prob.cam_idx, prob.pt_idx, K, L, lam, prob.cam_fixed, prob.pt_fixed
    )
    dc = schur_mod.solve_schur_dense(blocks)
    dp = schur_mod.back_substitute(blocks, dc)

    # dense reference: J [2N, 6K+3L]
    J = np.zeros((2 * N, 6 * K + 3 * L))
    rn = np.asarray(r).reshape(-1)
    ci = np.asarray(prob.cam_idx)
    pi = np.asarray(prob.pt_idx)
    Jc_n, Jp_n = np.asarray(Jc), np.asarray(Jp)
    for n in range(N):
        J[2 * n : 2 * n + 2, 6 * ci[n] : 6 * ci[n] + 6] = Jc_n[n]
        J[2 * n : 2 * n + 2, 6 * K + 3 * pi[n] : 6 * K + 3 * pi[n] + 3] = Jp_n[n]
    H = J.T @ J
    g = J.T @ rn
    D = np.clip(np.diag(H), 1e-6, None)
    Hd = H + lam * np.diag(D)
    # fixed camera 0: its Jacobian columns are zero -> pin block with identity
    Hd[:6, :6] = np.eye(6)
    g[:6] = 0
    dx = np.linalg.solve(Hd, -g)
    np.testing.assert_allclose(np.asarray(dc).reshape(-1), dx[: 6 * K], atol=5e-3, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(dp).reshape(-1), dx[6 * K :], atol=5e-3, rtol=5e-2)


def test_pcg_matches_dense():
    sc = make_synthetic_scene(n_cams=6, n_pts=80, pixel_noise=0.3, seed=3)
    prob = problem_from_scene(sc)
    R, t = res_mod.cams_to_Rt(jnp.asarray(sc.extr_init))
    pts = jnp.asarray(sc.points_init)
    r, Jc, Jp, _ = residuals_and_jacobians(prob, R, t, pts, robust=False)
    blocks = schur_mod.build_blocks(
        r, Jc, Jp, prob.cam_idx, prob.pt_idx, 6, 80, 1e-3, prob.cam_fixed, prob.pt_fixed
    )
    dc_dense = schur_mod.solve_schur_dense(blocks)
    dc_pcg = schur_mod.solve_schur_pcg(blocks, max_iters=100, tol=1e-9)
    np.testing.assert_allclose(np.asarray(dc_pcg), np.asarray(dc_dense), atol=1e-4, rtol=1e-2)


def test_global_ba_converges_to_gt():
    sc = make_synthetic_scene(n_cams=6, n_pts=150, pixel_noise=0.0, seed=4)
    # anchor cams 0 AND 1 at ground truth: pins the full 7-DOF similarity gauge
    # (one fixed camera, as the reference uses, still leaves scale free — its
    # trajectories are compared after Horn+scale alignment)
    fixed = np.zeros(6, bool)
    fixed[:2] = True
    sc.extr_init[1] = sc.extr_gt[1]
    prob = problem_from_scene(sc, cam_fixed=fixed)
    cams0 = jnp.asarray(sc.extr_init)
    pts0 = jnp.asarray(sc.points_init)
    cams, pts, info = ba_solve(prob, cams0, pts0, LMConfig(max_iters=15, solver="dense"))
    assert float(info["cost"]) < float(info["cost0"]) * 1e-4
    np.testing.assert_allclose(np.asarray(cams), sc.extr_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pts), sc.points_gt, atol=5e-3)


def _two_cam_anchor(sc):
    fixed = np.zeros(sc.extr_init.shape[0], bool)
    fixed[:2] = True
    sc.extr_init[1] = sc.extr_gt[1]
    return fixed


def test_global_ba_pcg_converges():
    sc = make_synthetic_scene(n_cams=10, n_pts=300, pixel_noise=0.2, seed=5)
    prob = problem_from_scene(sc, cam_fixed=_two_cam_anchor(sc))
    cams, pts, info = ba_solve(
        prob, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=15, solver="pcg", pcg_iters=60),
    )
    assert float(info["cost"]) < float(info["cost0"]) * 0.05
    np.testing.assert_allclose(np.asarray(cams), sc.extr_gt, atol=0.01)


def test_ba_robust_to_outliers():
    sc = make_synthetic_scene(n_cams=6, n_pts=150, pixel_noise=0.3, outlier_frac=0.1, seed=6)
    prob = problem_from_scene(sc, cam_fixed=_two_cam_anchor(sc))
    cams, pts, info = ba_solve(
        prob, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=20, solver="dense"),
    )
    np.testing.assert_allclose(np.asarray(cams), sc.extr_gt, atol=0.02)


def test_fixed_cameras_stay_fixed():
    sc = make_synthetic_scene(n_cams=5, n_pts=100, seed=7)
    fixed = np.array([True, True, False, False, False])
    prob = problem_from_scene(sc, cam_fixed=fixed)
    cams, pts, _ = ba_solve(
        prob, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=5, solver="dense"),
    )
    np.testing.assert_allclose(np.asarray(cams)[:2], sc.extr_init[:2], atol=1e-7)
    assert not np.allclose(np.asarray(cams)[2:], sc.extr_init[2:], atol=1e-7)


def test_motion_only_ba_batched():
    sc = make_synthetic_scene(n_cams=8, n_pts=120, pixel_noise=0.0, seed=8)
    # build per-camera dense observation blocks
    M = 64
    B = 8
    pts_b = np.zeros((B, M, 3), np.float32)
    uv_b = np.zeros((B, M, 2), np.float32)
    valid_b = np.zeros((B, M), bool)
    for k in range(B):
        sel = np.nonzero(sc.cam_idx == k)[0][:M]
        m = len(sel)
        pts_b[k, :m] = sc.points_gt[sc.pt_idx[sel]]
        uv_b[k, :m] = sc.uv[sel]
        valid_b[k, :m] = True
    sig_b = np.ones((B, M), np.float32)
    rt_out, inliers = motion_only_ba(
        jnp.asarray(sc.K4),
        jnp.asarray(sc.extr_init),
        jnp.asarray(pts_b),
        jnp.asarray(uv_b),
        jnp.asarray(sig_b),
        jnp.asarray(valid_b),
    )
    np.testing.assert_allclose(np.asarray(rt_out), sc.extr_gt, atol=2e-3)
    # inliers preserved for clean data
    assert np.asarray(inliers)[valid_b].mean() > 0.95


def test_motion_only_prunes_outliers():
    sc = make_synthetic_scene(n_cams=2, n_pts=100, pixel_noise=0.3, seed=9)
    M = 80
    sel = np.nonzero(sc.cam_idx == 1)[0][:M]
    m = len(sel)
    pts_b = np.zeros((1, M, 3), np.float32)
    uv_b = np.zeros((1, M, 2), np.float32)
    valid_b = np.zeros((1, M), bool)
    pts_b[0, :m] = sc.points_gt[sc.pt_idx[sel]]
    uv_b[0, :m] = sc.uv[sel]
    valid_b[0, :m] = True
    # corrupt 15 observations grossly
    uv_b[0, :15] += 80.0
    rt_out, inliers = motion_only_ba(
        jnp.asarray(sc.K4),
        jnp.asarray(sc.extr_init[1:2]),
        jnp.asarray(pts_b),
        jnp.asarray(uv_b),
        jnp.ones((1, M), jnp.float32),
        jnp.asarray(valid_b),
    )
    inl = np.asarray(inliers)[0]
    assert not inl[:15].any()
    assert inl[15:m].mean() > 0.9
    np.testing.assert_allclose(np.asarray(rt_out)[0], sc.extr_gt[1], atol=5e-3)
