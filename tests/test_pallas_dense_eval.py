"""Parity of the Pallas-fused eval+assembly with the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
from bundleadjustment_tpu.geometry.se3 import aa_to_rotmat
from bundleadjustment_tpu.solvers.dense_ba import (
    _assemble_cm,
    _eval_cm,
    _to_cm,
    densify_problem,
)
from bundleadjustment_tpu.solvers.pallas_dense_eval import (
    fused_eval_assemble,
    fused_eval_supported,
)


def _setup(n_cams=6, n_pts=150, seed=5, max_obs=8):
    sc = make_synthetic_scene(n_cams=n_cams, n_pts=n_pts, pixel_noise=0.4,
                              seed=seed)
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    dense, _ = densify_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid,
        cam_fixed, n_pts, max_obs=max_obs,
    )
    cm = _to_cm(dense)
    R = aa_to_rotmat(jnp.asarray(sc.extr_init[:, :3]))
    t = jnp.asarray(sc.extr_init[:, 3:])
    Xt = jnp.asarray(sc.points_init.T)
    return cm, R, t, Xt


@pytest.mark.parametrize("robust", [True, False])
def test_fused_eval_matches_xla(robust):
    cm, R, t, Xt = _setup()
    cost_ref, r, Jc, Jp = _eval_cm(cm, R, t, Xt, robust)
    red_ref, Vu_ref, gp_ref, W_ref = _assemble_cm(
        cm, r, Jc, Jp, psum=lambda x: x)

    cost, red, Vu, g_p, W = fused_eval_assemble(
        cm.K4, cm.cam_t, cm.uv_t, cm.inv_sigma_t, cm.valid_t, cm.fixed_t,
        R, t, Xt, robust=robust, interpret=jax.default_backend() != "tpu",
    )
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(red), np.asarray(red_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(Vu), np.asarray(Vu_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(gp_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(W), np.asarray(W_ref),
                               rtol=2e-4, atol=2e-3)


def test_fused_eval_padding_and_gate():
    # L=150 is not a multiple of the lane tile: exercises the pad/slice path
    cm, R, t, Xt = _setup(n_pts=150)
    assert fused_eval_supported(*cm.cam_t.shape, R.shape[0])
    # the gate refuses problems whose one-hot would blow VMEM
    assert not fused_eval_supported(16, 10_000, 512)


def test_dense_solve_with_forced_fused_eval():
    """Full LM solve with fused_eval='on' (interpret off-TPU) converges to
    the same optimum as the XLA path."""
    from bundleadjustment_tpu.solvers.dense_ba import dense_ba_solve
    from bundleadjustment_tpu.solvers.lm import LMConfig

    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas path needs TPU; interpret parity above")

    sc = make_synthetic_scene(n_cams=8, n_pts=200, pixel_noise=0.3, seed=32)
    cam_fixed = np.zeros(8, bool)
    cam_fixed[:2] = True
    sc.extr_init[1] = sc.extr_gt[1]
    dense, _ = densify_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid,
        cam_fixed, 200,
    )
    cams_on, pts_on, info_on = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=10, fused_eval="on"),
    )
    cams_off, pts_off, info_off = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=10, fused_eval="off"),
    )
    np.testing.assert_allclose(np.asarray(cams_on), np.asarray(cams_off),
                               atol=5e-4)
    np.testing.assert_allclose(
        float(info_on["cost"]), float(info_off["cost"]), rtol=1e-3)
