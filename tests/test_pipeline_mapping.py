"""Regression test for the full mapping path: keyframe creation,
triangulation, neighborhood search/fusion, culling, local BA.

The short-baseline tests never leave the initial map; this sequence moves
aggressively (0.35 m/frame, ~9% of scene depth) so the association ratio
drops and new keyframes must be created for tracking to survive."""

import numpy as np
import pytest

from bundleadjustment_tpu.data.synthetic import render_plane_sequence
from bundleadjustment_tpu.metrics import evaluate_ate
from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline, PipelineConfig
from tests.test_pipeline import frames_to_framedata


@pytest.mark.slow
def test_keyframe_mapping_path():
    frames, K4 = render_plane_sequence(
        n_frames=14, width=320, height=240, fx=300.0, fy=300.0, motion_step=0.35
    )
    ds = frames_to_framedata(frames)
    cfg = PipelineConfig(
        init_type="gtdepth", estimation="ba", n_features=400, n_levels=3,
        local_ba=True, final_ba_outer=1, final_ba_iters=10,
        keyframe_ratio=0.35,
    )
    pipe = BundleAdjustmentPipeline(cfg, K4, 320, 240)
    pipe.run(ds)

    # new keyframes beyond the init pair -> mapping path exercised
    assert pipe.stats["keyframes"] >= 4, pipe.stats
    assert len(pipe.map.active_points()) > 300

    ts, mats = pipe.trajectory_cam_to_world()
    assert len(ts) == len(ds)
    gt_ts = np.array([f["timestamp"] for f in frames])
    gt_xyz = np.array([f["gt_cam_to_world"][:3, 3] for f in frames])
    res = evaluate_ate(ts, mats[:, :3, 3], gt_ts, gt_xyz)
    # 4.5 m trajectory with 9%-of-depth frame jumps: drift bound ~5%
    # (measured 0.15 at commit time; bound leaves headroom for noise)
    assert res["rmse"] < 0.25, res


def test_fuse_requires_geometric_consistency():
    """A descriptor match between keypoints whose landmarks are geometrically
    inconsistent must NOT fuse them (round-3 config-2 root cause: ungated
    fusion on repetitive texture merged distinct landmarks and dragged BA
    ~2 m off).  Reference gate cascade: SfMHelper.cpp:203-496."""
    from bundleadjustment_tpu.mapstate import SceneMap

    K4 = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
    cfg = PipelineConfig(n_features=64, n_levels=1)
    pipe = BundleAdjustmentPipeline(cfg, K4, 320, 240)
    m = pipe.map

    # two keyframes at identity-ish poses; same descriptor everywhere
    desc = np.full((4, 8), 0xAAAAAAAA, np.uint32)
    xy0 = np.array([[160.0, 120.0], [200.0, 120.0], [120.0, 120.0],
                    [160.0, 80.0]], np.float32)
    for k in range(2):
        extr = np.zeros(6)
        extr[3] = 0.1 * k  # small baseline
        m.add_frame(float(k), extr, xy0, np.zeros(4, np.int32),
                    np.ones(4, np.float32), desc)
        m.set_keyframe(k)

    # landmark A: consistent with kf0 kp0 (projects to image center, z=2)
    a = m.add_point(np.array([0.0, 0.0, 2.0]))
    m.add_observation(a, 0, 0)
    # landmark B: far off to the side — reprojects nowhere near kp0 of kf0
    b = m.add_point(np.array([3.0, 0.0, 2.0]))
    m.add_observation(b, 1, 0)

    gate_ok = pipe._transfer_gate(np.array([a]), 0, np.array([0]))
    gate_bad = pipe._transfer_gate(np.array([b]), 0, np.array([0]))
    assert bool(gate_ok[0])
    assert not bool(gate_bad[0])

    # landmark C at (slightly perturbed) the same position as A, observed by
    # kf1 at the matching keypoint: both cross-gates pass -> fusable
    c = m.add_point(np.array([0.0, 0.0, 2.02]))
    # kp in kf1 where C projects: x_cam = X + t = (0.1, 0, 2.02)
    uv_c = np.array([[300 * 0.1 / 2.02 + 160.0, 120.0]], np.float32)
    # overwrite kf1 kp1 position to match C's projection
    m.kp_xy[1, 1] = uv_c[0]
    m.add_observation(c, 1, 1)
    gate_c = pipe._transfer_gate(np.array([c]), 0, np.array([0]))
    assert bool(gate_c[0])
