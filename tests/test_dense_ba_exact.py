import numpy as np
import jax.numpy as jnp

from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
from bundleadjustment_tpu.solvers import LMConfig
from bundleadjustment_tpu.solvers.dense_ba import dense_ba_solve
from tests.test_dense_ba import build


def test_dense_schur_exact_matches_pcg():
    sc = make_synthetic_scene(n_cams=8, n_pts=200, pixel_noise=0.3, seed=41)
    dense, _, _ = build(sc)
    cams_d, pts_d, info_d = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=10, solver="dense"),
    )
    cams_p, pts_p, info_p = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=10, solver="pcg", pcg_iters=80),
    )
    np.testing.assert_allclose(np.asarray(cams_d), np.asarray(cams_p), atol=5e-3)
    # exact solve converges at least as well as 80-iteration PCG
    assert float(info_d["cost"]) <= float(info_p["cost"]) * 1.05 + 1e-6


def test_dense_schur_exact_converges_to_gt():
    sc = make_synthetic_scene(n_cams=8, n_pts=300, pixel_noise=0.0, seed=42)
    dense, _, _ = build(sc)
    cams, pts, info = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=15, solver="dense"),
    )
    assert float(info["cost"]) < float(info["cost0"]) * 1e-4
    np.testing.assert_allclose(np.asarray(cams), sc.extr_gt, atol=2e-3)


def test_exact_bf16_close_to_f32():
    """mxu_bf16 casts only the Pf/QQ^T inputs (f32 accumulation); the LM
    trajectory must stay close to the f32 exact path."""
    import numpy as np
    import jax.numpy as jnp
    from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
    from bundleadjustment_tpu.solvers import LMConfig

    sc = make_synthetic_scene(n_cams=8, n_pts=200, pixel_noise=0.3, seed=35)
    dense, _, _ = build(sc)
    cams_f, pts_f, info_f = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=8, solver="dense"),
    )
    cams_b, pts_b, info_b = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init),
        LMConfig(max_iters=8, solver="dense", mxu_bf16=True),
    )
    assert float(info_b["cost"]) < float(info_b["cost0"]) * 0.05
    np.testing.assert_allclose(np.asarray(cams_b), np.asarray(cams_f),
                               atol=2e-2)
