"""Keyframe-need regression (round-5 sweep diagnosis).

With guided local-map tracking on, the reference's association-ratio
criterion alone STARVES keyframe creation — tracking keeps associating
against a decaying map, the ratio stays above threshold, and a 120-frame
handheld run produced 4-6 keyframes, a ~330-landmark map, and 0.2-0.5 m
online ATE.  The decay/interval criteria (PipelineConfig.kf_ref_decay /
kf_max_interval) must keep the map growing and the trajectory in bound.
"""

import numpy as np
import pytest

from bundleadjustment_tpu.data.synthetic import render_layered_scene
from bundleadjustment_tpu.metrics import evaluate_ate
from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline, PipelineConfig
from protocols import make_dataset


@pytest.mark.slow
def test_long_handheld_does_not_starve_keyframes():
    frames, K4 = render_layered_scene(
        n_frames=120, width=320, height=240, fx=262.0, fy=262.0,
        trajectory="handheld", motion_step=0.05, rot_step=0.012, seed=12,
    )
    ds = make_dataset(frames)
    cfg = PipelineConfig(
        init_type="gtdepth", estimation="ba", local_ba=True,
        cull_frames=True, n_features=600, n_levels=4,
    )
    pipe = BundleAdjustmentPipeline(cfg, K4, 320, 240)
    pipe.process_frames(ds)
    ts_o, mats_o = pipe.trajectory_cam_to_world()
    gt_ts = np.array([f["timestamp"] for f in frames])
    gt_xyz = np.array([f["gt_cam_to_world"][:3, 3] for f in frames])
    online = evaluate_ate(ts_o, mats_o[:, :3, 3], gt_ts, gt_xyz)["rmse"]
    pipe.finalize()
    ts, mats = pipe.trajectory_cam_to_world()
    final = evaluate_ate(ts, mats[:, :3, 3], gt_ts, gt_xyz)["rmse"]
    # starved run: 6 keyframes / 262 landmarks / online 0.47 / final 0.51
    assert pipe.stats["keyframes"] >= 8, pipe.stats
    assert len(pipe.map.active_points()) > 400
    assert online < 0.10, online
    assert final < 0.05, final
