"""BASELINE config-1/2/3-shaped protocols on hard layered synthetic scenes.

Real TUM/Replica downloads are impossible in this environment (zero egress),
so each BASELINE.json config runs on `render_layered_scene` hard scenes
(multi-depth structure, occlusion, sensor-model depth, photometric nuisance)
at the matching camera geometry, ON the default device (the TPU under the
driver).  Prints one JSON line per config; results recorded in BASELINE.md.

- config 1 — fr1/xyz-shaped: 640x480 fx=525, 50 frames, gtdepth init,
  motion-only-BA tracking, final global BA (reference main.cpp:48-64 with
  --local-ba off).
- config 2 — long-sequence keyframe mapping: 120 frames handheld, keyframe
  selection + local BA + keyframe culling (reference --local-ba
  --cull-frames).
- config 3 — Replica-shaped RGB-D: depth-assisted init + colored map fusion,
  reconstruction error vs the GT cloud (reference --reconstruction-error,
  main.cpp:189-202).
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_dataset(frames):
    from bundleadjustment_tpu.data.tum import FrameData

    rgb = lambda g: np.repeat(
        (np.clip(g, 0, 1) * 255).astype(np.uint8)[..., None], 3, -1
    )
    return [
        FrameData(
            index=i,
            timestamp=f["timestamp"],
            gray=f["gray"],
            depth=f["depth"],
            rgb=rgb(f["gray"]),
            gt_cam_to_world=f["gt_cam_to_world"],
        )
        for i, f in enumerate(frames)
    ]


def run_protocol(frames, K4, cfg, width, height, warmup=10):
    """Run the pipeline frame by frame with per-frame timing.

    Returns (pipe, ate_result, steady_fps, wall_s)."""
    from bundleadjustment_tpu.metrics import evaluate_ate
    from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline

    ds = make_dataset(frames)
    pipe = BundleAdjustmentPipeline(cfg, K4, width, height)
    t_start = time.perf_counter()
    timings = []
    statuses = pipe.process_frames(ds, timings=timings)
    pipe.finalize()
    wall = time.perf_counter() - t_start
    frame_times = list(zip(timings, statuses))

    # steady-state tracked-frame fps: median over post-warmup tracked frames
    tracked = [t for t, s in frame_times[warmup:] if s == "tracked"]
    fps = 1.0 / float(np.median(tracked)) if tracked else float("nan")

    ts, mats = pipe.trajectory_cam_to_world()
    gt_ts = np.array([f["timestamp"] for f in frames])
    gt_xyz = np.array([f["gt_cam_to_world"][:3, 3] for f in frames])
    res = evaluate_ate(ts, mats[:, :3, 3], gt_ts, gt_xyz)
    return pipe, res, fps, wall


def gt_cloud(frames, K4, stride=4, px_stride=8):
    """Ground-truth point cloud from GT depth + GT poses (the synthetic
    stand-in for the Replica GT mesh)."""
    fx, fy, cx, cy = K4
    pts = []
    for f in frames[::stride]:
        d = f["depth"]
        h, w = d.shape
        vs, us = np.mgrid[0:h:px_stride, 0:w:px_stride]
        dep = d[vs, us]
        ok = np.isfinite(dep) & (dep > 0)
        xc = np.stack(
            [(us - cx) / fx * dep, (vs - cy) / fy * dep, dep], -1
        )[ok]
        C = f["gt_cam_to_world"]
        pts.append(xc @ C[:3, :3].T + C[:3, 3])
    return np.concatenate(pts)


def config1(track_batch=1):
    from bundleadjustment_tpu.data.synthetic import render_layered_scene
    from bundleadjustment_tpu.pipeline import PipelineConfig

    frames, K4 = render_layered_scene(
        n_frames=50, width=640, height=480, fx=525.0, fy=525.0,
        trajectory="forward", motion_step=0.03, seed=11,
    )
    cfg = PipelineConfig(
        init_type="gtdepth", estimation="ba", local_ba=False,
        n_features=1000, n_levels=8, track_batch=track_batch,
    )
    pipe, res, fps, wall = run_protocol(frames, K4, cfg, 640, 480)
    return {
        "metric": "config1_fr1_shaped" + (
            f"_tb{track_batch}" if track_batch > 1 else ""
        ),
        "ate_rmse_m": round(res["rmse"], 4),
        "steady_fps": round(fps, 2),
        "wall_s": round(wall, 1),
        "frames": 50,
        "keyframes": pipe.stats["keyframes"],
        "landmarks": int(len(pipe.map.active_points())),
    }


def config2():
    from bundleadjustment_tpu.data.synthetic import render_layered_scene
    from bundleadjustment_tpu.pipeline import PipelineConfig

    frames, K4 = render_layered_scene(
        n_frames=120, width=640, height=480, fx=525.0, fy=525.0,
        trajectory="handheld", motion_step=0.05, rot_step=0.012, seed=12,
    )
    cfg = PipelineConfig(
        init_type="gtdepth", estimation="ba", local_ba=True,
        cull_frames=True, n_features=1000, n_levels=8,
    )
    pipe, res, fps, wall = run_protocol(frames, K4, cfg, 640, 480)
    return {
        "metric": "config2_long_sequence",
        "ate_rmse_m": round(res["rmse"], 4),
        "steady_fps": round(fps, 2),
        "wall_s": round(wall, 1),
        "frames": 120,
        "keyframes": pipe.stats["keyframes"],
        "landmarks": int(len(pipe.map.active_points())),
    }


def config3():
    from bundleadjustment_tpu.data.synthetic import render_layered_scene
    from bundleadjustment_tpu.metrics.reconstruction import reconstruction_error
    from bundleadjustment_tpu.pipeline import PipelineConfig

    frames, K4 = render_layered_scene(
        n_frames=40, width=640, height=480, fx=525.0, fy=525.0,
        trajectory="orbit", motion_step=0.06, seed=13,
    )
    cfg = PipelineConfig(
        init_type="gtdepth", estimation="ba", local_ba=True,
        n_features=1000, n_levels=8,
    )
    pipe, res, fps, wall = run_protocol(frames, K4, cfg, 640, 480)
    pts, cols = pipe.map_points_colored()
    gt = gt_cloud(frames, K4)
    first_kf = int(pipe.map.active_keyframes()[0])
    fitness, _ = reconstruction_error(
        pts, gt, first_kf_gt_pose=pipe.map.kf_gt[first_kf]
    )
    return {
        "metric": "config3_rgbd_fusion",
        "ate_rmse_m": round(res["rmse"], 4),
        "recon_error": round(float(fitness), 5),
        "steady_fps": round(fps, 2),
        "wall_s": round(wall, 1),
        "frames": 40,
        "keyframes": pipe.stats["keyframes"],
        "landmarks": int(len(pts)),
        "colored": bool(np.any(cols != 200)),
    }


def config4_teddy():
    """fr1/teddy-shaped: rotation-dominant object orbit, texture-poor
    background, occluding panels (reference VirtualSensor.h:15-20 ships
    fr1/teddy; this protocol covers the object-orbit regime the forward/
    handheld protocols don't)."""
    from bundleadjustment_tpu.data.synthetic import render_layered_scene
    from bundleadjustment_tpu.pipeline import PipelineConfig

    frames, K4 = render_layered_scene(
        n_frames=60, width=640, height=480, fx=525.0, fy=525.0,
        trajectory="orbit", motion_step=0.08, n_layers=8,
        background_texture=0.15, seed=14,
    )
    cfg = PipelineConfig(
        init_type="gtdepth", estimation="ba", local_ba=True,
        cull_frames=True, n_features=1000, n_levels=8,
    )
    pipe, res, fps, wall = run_protocol(frames, K4, cfg, 640, 480)
    return {
        "metric": "config4_teddy_orbit",
        "ate_rmse_m": round(res["rmse"], 4),
        "steady_fps": round(fps, 2),
        "wall_s": round(wall, 1),
        "frames": 60,
        "keyframes": pipe.stats["keyframes"],
        "landmarks": int(len(pipe.map.active_points())),
    }


PROTOCOLS = {
    "1": config1,
    "2": config2,
    "3": config3,
    "4": config4_teddy,
}


def main(argv=None):
    import sys

    import jax

    names = (argv if argv is not None else sys.argv[1:]) or list(PROTOCOLS)
    dev = str(jax.devices()[0])
    for name in names:
        out = PROTOCOLS[name]()
        out["device"] = dev
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
