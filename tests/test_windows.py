import numpy as np
import pytest

from bundleadjustment_tpu.parallel.windows import make_windows, windowed_global_ba


def test_make_windows():
    assert make_windows(5, window=10, stride=5) == [[0, 1, 2, 3, 4]]
    ws = make_windows(20, window=10, stride=5)
    assert ws[0] == list(range(10))
    assert ws[-1] == list(range(10, 20))
    assert all(len(w) == 10 for w in ws)
    covered = sorted({i for w in ws for i in w})
    assert covered == list(range(20))


@pytest.mark.slow
def test_windowed_global_ba_improves_map(rng):
    """Build a map store from a synthetic scene with noisy poses, run the
    windowed BA + pose-graph stitch, and require pose improvement."""
    from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
    from bundleadjustment_tpu.mapstate import SceneMap

    sc = make_synthetic_scene(n_cams=12, n_pts=200, pixel_noise=0.3,
                              init_rot_noise=0.03, init_trans_noise=0.08, seed=21)
    m = SceneMap(max_frames=64, max_points=4096, max_kp=256, K4=sc.K4)
    # register frames with their keypoints = projections (uv per obs)
    kp_count = np.zeros(12, int)
    kp_of_obs = np.zeros(len(sc.cam_idx), int)
    for n in range(len(sc.cam_idx)):
        k = sc.cam_idx[n]
        kp_of_obs[n] = kp_count[k]
        kp_count[k] += 1
    kp_xy = np.zeros((12, kp_count.max(), 2), np.float32)
    for n in range(len(sc.cam_idx)):
        kp_xy[sc.cam_idx[n], kp_of_obs[n]] = sc.uv[n]
    for k in range(12):
        m.add_frame(
            float(k), sc.extr_init[k], kp_xy[k, : kp_count[k]],
            np.zeros(kp_count[k], np.int32), np.ones(kp_count[k], np.float32),
            np.zeros((kp_count[k], 8), np.uint32),
        )
        m.set_keyframe(k)
    pts = [m.add_point(sc.points_init[l]) for l in range(200)]
    for n in range(len(sc.cam_idx)):
        m.add_observation(int(sc.pt_idx[n]), int(sc.cam_idx[n]), int(kp_of_obs[n]))

    err_before = np.linalg.norm(m.kf_pose[:12] - sc.extr_gt, axis=1)
    info = windowed_global_ba(m, window=6, stride=3)
    assert info["windows"] >= 2
    err_after = np.linalg.norm(m.kf_pose[:12] - sc.extr_gt, axis=1)
    # anchored gauge: first camera exact; overall pose error shrinks a lot
    assert err_after.mean() < err_before.mean() * 0.5
    for c0, c1 in zip(info["window_cost0"], info["window_cost"]):
        assert c1 < c0


def _build_synthetic_store(n_cams=12, n_pts=200, seed=21):
    from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
    from bundleadjustment_tpu.mapstate import SceneMap

    sc = make_synthetic_scene(n_cams=n_cams, n_pts=n_pts, pixel_noise=0.3,
                              init_rot_noise=0.03, init_trans_noise=0.08,
                              seed=seed)
    m = SceneMap(max_frames=64, max_points=4096, max_kp=256, K4=sc.K4)
    kp_count = np.zeros(n_cams, int)
    kp_of_obs = np.zeros(len(sc.cam_idx), int)
    for n in range(len(sc.cam_idx)):
        k = sc.cam_idx[n]
        kp_of_obs[n] = kp_count[k]
        kp_count[k] += 1
    kp_xy = np.zeros((n_cams, kp_count.max(), 2), np.float32)
    for n in range(len(sc.cam_idx)):
        kp_xy[sc.cam_idx[n], kp_of_obs[n]] = sc.uv[n]
    for k in range(n_cams):
        m.add_frame(
            float(k), sc.extr_init[k], kp_xy[k, : kp_count[k]],
            np.zeros(kp_count[k], np.int32), np.ones(kp_count[k], np.float32),
            np.zeros((kp_count[k], 8), np.uint32),
        )
        m.set_keyframe(k)
    for l in range(n_pts):
        m.add_point(sc.points_init[l])
    for n in range(len(sc.cam_idx)):
        m.add_observation(int(sc.pt_idx[n]), int(sc.cam_idx[n]),
                          int(kp_of_obs[n]))
    return sc, m


@pytest.mark.slow
def test_windowed_ba_sharded_matches_vmap():
    """shard_map over the window axis (8-virtual-device CPU mesh) must
    reproduce the single-device vmap path: same per-window solves, same
    halo-averaged landmarks, same stitched trajectory."""
    import jax
    from jax.sharding import Mesh
    from bundleadjustment_tpu.parallel.windows import WINDOW_AXIS

    sc, m1 = _build_synthetic_store()
    _, m2 = _build_synthetic_store()
    mesh = Mesh(np.array(jax.devices()), (WINDOW_AXIS,))

    info1 = windowed_global_ba(m1, window=6, stride=3)
    info2 = windowed_global_ba(m2, window=6, stride=3, mesh=mesh)
    assert info1["windows"] == info2["windows"] >= 2

    np.testing.assert_allclose(info2["window_cost"], info1["window_cost"],
                               rtol=1e-4)
    # stitched keyframe poses agree
    np.testing.assert_allclose(m2.kf_pose[:12], m1.kf_pose[:12],
                               rtol=1e-4, atol=2e-4)
    # halo-averaged + refined landmarks agree
    pts1 = m1.pt_pos[m1.active_points()]
    pts2 = m2.pt_pos[m2.active_points()]
    np.testing.assert_allclose(pts2, pts1, rtol=1e-3, atol=2e-3)
    # and the sharded run still improves the map
    err_after = np.linalg.norm(m2.kf_pose[:12] - sc.extr_gt, axis=1)
    err_init = np.linalg.norm(sc.extr_init - sc.extr_gt, axis=1)
    assert err_after.mean() < err_init.mean() * 0.5


def test_windowed_halo_psum_traffic_scales_with_boundary_landmarks():
    """docs/DISTRIBUTED.md claims the window layer's ONLY cross-device
    traffic is the landmark halo exchange — bytes ∝ distinct global
    landmarks, independent of observation count (round-3 VERDICT #7).
    Asserted on the compiled HLO of the sharded solve: all-reduce bytes
    equal exactly 16 B per global landmark (position-sum [G,3] f32 +
    count [G] f32), regardless of the padded observation capacity, and the
    module contains no other collective ops."""
    import re

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bundleadjustment_tpu.parallel.windows import (
        WINDOW_AXIS,
        make_sharded_halo_fn,
    )
    from bundleadjustment_tpu.solvers import BAProblem, LMConfig

    from test_scaling import _allreduce_bytes

    mesh = Mesh(np.array(jax.devices()[:4]), (WINDOW_AXIS,))
    cfg = LMConfig(max_iters=2, solver="dense")
    W, Kp, Lp = 4, 8, 64

    def compiled_text(n_obs, n_global):
        probs = BAProblem(
            K4=jnp.broadcast_to(
                jnp.asarray([300.0, 300.0, 160.0, 120.0]), (W, 4)),
            cam_idx=jnp.zeros((W, n_obs), jnp.int32),
            pt_idx=jnp.zeros((W, n_obs), jnp.int32),
            uv=jnp.zeros((W, n_obs, 2), jnp.float32),
            sigma2=jnp.ones((W, n_obs), jnp.float32),
            valid=jnp.zeros((W, n_obs), bool),
            cam_fixed=jnp.zeros((W, Kp), bool),
            pt_fixed=jnp.zeros((W, Lp), bool),
        )
        cams = jnp.zeros((W, Kp, 6), jnp.float32)
        pts = jnp.zeros((W, Lp, 3), jnp.float32)
        gids = jnp.zeros((W, Lp), jnp.int32)
        fn = make_sharded_halo_fn(cfg, n_global, mesh)
        return jax.jit(fn).lower(probs, cams, pts, gids).compile().as_text()

    t_small = compiled_text(256, 128)
    t_more_obs = compiled_text(1024, 128)
    t_more_gids = compiled_text(256, 256)

    assert _allreduce_bytes(t_small) == 16 * 128
    assert _allreduce_bytes(t_more_obs) == 16 * 128  # obs-independent
    assert _allreduce_bytes(t_more_gids) == 16 * 256  # ∝ boundary landmarks

    # the halo psum is the ONLY collective in the sharded window solve
    for other in ("all-gather", "collective-permute", "reduce-scatter",
                  "all-to-all"):
        assert not re.search(rf"\b{other}\(", t_small), other
