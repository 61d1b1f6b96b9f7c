import numpy as np
import pytest

from bundleadjustment_tpu.data.synthetic import render_plane_sequence
from bundleadjustment_tpu.metrics import evaluate_ate
from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline, PipelineConfig
from bundleadjustment_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from tests.test_pipeline import frames_to_framedata


@pytest.mark.slow
def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Run 6 frames straight vs. 3 frames -> checkpoint -> resume 3 more."""
    frames, K4 = render_plane_sequence(n_frames=6, width=160, height=120,
                                       motion_step=0.06)
    ds = frames_to_framedata(frames)
    cfg = PipelineConfig(init_type="gtdepth", estimation="ba", n_features=300,
                         n_levels=3, local_ba=False, final_ba_outer=1,
                         final_ba_iters=5)

    # uninterrupted
    pipe_a = BundleAdjustmentPipeline(cfg, K4, 160, 120)
    for f in ds:
        pipe_a.process_frame(f)

    # interrupted + resumed
    pipe_b = BundleAdjustmentPipeline(cfg, K4, 160, 120)
    for f in ds[:3]:
        pipe_b.process_frame(f)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, pipe_b)
    pipe_c = load_checkpoint(ckpt, cfg)

    # restored state equals saved state
    assert pipe_c.initialized == pipe_b.initialized
    assert pipe_c.kf_counter == pipe_b.kf_counter
    assert pipe_c.last_slot == pipe_b.last_slot
    np.testing.assert_allclose(pipe_c.map.kf_pose[: pipe_b.last_slot + 1],
                               pipe_b.map.kf_pose[: pipe_b.last_slot + 1])
    assert len(pipe_c.map.active_points()) == len(pipe_b.map.active_points())
    assert len(pipe_c.trajectory) == len(pipe_b.trajectory)
    # scale envelopes, colors, and trajectory associations survive the
    # round-trip (they gate transfers and feed finalize()'s refinement)
    n_pt = int(pipe_b.map._lib.map_num_points(pipe_b.map._h))
    np.testing.assert_allclose(pipe_c.map.pt_dmin[:n_pt], pipe_b.map.pt_dmin[:n_pt])
    np.testing.assert_allclose(pipe_c.map.pt_dmax[:n_pt], pipe_b.map.pt_dmax[:n_pt])
    np.testing.assert_array_equal(pipe_c.map.pt_color[:n_pt], pipe_b.map.pt_color[:n_pt])
    for rb, rc in zip(pipe_b.trajectory, pipe_c.trajectory):
        assert (rb.assoc_pt is None) == (rc.assoc_pt is None)
        if rb.assoc_pt is not None:
            np.testing.assert_array_equal(rb.assoc_pt, rc.assoc_pt)
            np.testing.assert_allclose(rb.assoc_uv, rc.assoc_uv)
            np.testing.assert_allclose(rb.assoc_sig, rc.assoc_sig)

    for f in ds[3:]:
        pipe_c.process_frame(f)

    # finalize both: the resumed run must match the uninterrupted run's
    # final trajectory, not just its pre-finalize tracking
    pipe_a.finalize()
    pipe_c.finalize()

    gt_ts = np.array([f["timestamp"] for f in frames])
    gt_xyz = np.array([f["gt_cam_to_world"][:3, 3] for f in frames])
    results = []
    for pipe in (pipe_a, pipe_c):
        ts, mats = pipe.trajectory_cam_to_world()
        res = evaluate_ate(ts, mats[:, :3, 3], gt_ts, gt_xyz)
        assert res["rmse"] < 0.06
        assert len(ts) == len(ds)
        results.append((ts, mats))
    ts_a, mats_a = results[0]
    ts_c, mats_c = results[1]
    np.testing.assert_allclose(ts_a, ts_c)
    # same sequence, same config: positions should agree to mm level
    assert np.abs(mats_a[:, :3, 3] - mats_c[:, :3, 3]).max() < 2e-3
