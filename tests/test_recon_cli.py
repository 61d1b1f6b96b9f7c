import json
import os

import numpy as np
import pytest

from bundleadjustment_tpu.data.synthetic import render_plane_sequence, write_tum_format
from bundleadjustment_tpu.vis.mesh import write_ply
from bundleadjustment_tpu.vis.pointcloud import backproject_depth


@pytest.mark.slow
def test_cli_reconstruction_error(tmp_path):
    """--reconstruction-error computes the ICP fitness against a GT cloud
    (the reference's Replica-only metric, main.cpp:189-202)."""
    from bundleadjustment_tpu import cli

    frames, K4 = render_plane_sequence(n_frames=5, width=160, height=120)
    root = str(tmp_path / "ds")
    write_tum_format(root, frames)
    with open(os.path.join(root, "intrinsics.json"), "w") as f:
        json.dump({"fx": float(K4[0]), "fy": float(K4[1]), "cx": float(K4[2]),
                   "cy": float(K4[3]), "width": 160, "height": 120}, f)

    # GT cloud: backprojected depth of frame 0 in world coords
    pts, valid = backproject_depth(K4, frames[0]["depth"],
                                   frames[0]["gt_cam_to_world"], stride=4)
    gt_ply = str(tmp_path / "gt.ply")
    write_ply(gt_ply, pts[valid])

    out = str(tmp_path / "out")
    results = cli.main([
        "--dataset-name", "synthetic", "--dataset-path", root,
        "--output-path", out, "--init-type", "gtdepth", "--estimation", "ba",
        "--frames", "5", "--n-features", "300", "--n-levels", "3",
        "--reconstruction-error", gt_ply,
    ])
    assert "reconstruction_error" in results
    # clean synthetic: normalized ICP fitness far below the reference's own
    # perturbed-cloud test bound of 0.1
    assert results["reconstruction_error"] < 0.05
    # comparison PLYs (reference ReconstructionError.cpp:106-107,174)
    import glob
    from bundleadjustment_tpu.vis.mesh import read_ply_vertices
    combined = glob.glob(os.path.join(out, "*_combined_colored_cloud.ply"))
    assert combined, os.listdir(out)
    assert glob.glob(os.path.join(out, "*_gt_cloud.ply"))
    assert glob.glob(os.path.join(out, "*_estimated_cloud.ply"))
    assert len(read_ply_vertices(combined[0])) > 0


@pytest.mark.slow
def test_pipeline_essential_homography_tracking():
    """estimation=essential_or_homography end to end (2D-2D pose chaining)."""
    from bundleadjustment_tpu.pipeline import PipelineConfig
    from tests.test_pipeline import run_and_ate

    cfg = PipelineConfig(
        init_type="gtdepth", estimation="essential_or_homography",
        n_features=400, n_levels=3, local_ba=False,
        final_ba_outer=1, final_ba_iters=8,
    )
    res, pipe, stats = run_and_ate(cfg, motion_step=0.12, width=320,
                                   height=240, fx=300.0)
    # 2-view relative pose with constant-velocity scale prior: looser bound
    assert res["rmse"] < 0.12, res
