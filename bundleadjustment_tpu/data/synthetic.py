"""Synthetic SfM scene generation (numpy, host-side).

Generates ground-truth camera trajectories, landmarks, and observation tables
with configurable noise/outliers.  Used by the test pyramid (SURVEY.md §4: the
reference has no synthetic harness at all — its only test builds 3 points by
hand, `ba_project/tests/ReconstructionError_test.cc:24-42`) and by `bench.py`
to build BA problems of arbitrary size (BASELINE.json configs 4-5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def render_plane_sequence(
    n_frames=8,
    width=160,
    height=120,
    fx=150.0,
    fy=150.0,
    plane_z=4.0,
    tex_size=1024,
    motion_step=0.08,
    seed=0,
):
    """Render a camera track over a textured plane at z = plane_z (world).

    Returns (frames, K4) where each frame is a dict with 'gray' [H,W] float32,
    'depth' [H,W] float32 (meters), 'gt_cam_to_world' [4,4], 'timestamp'.
    Cheap ray-plane rendering — enough texture structure for FAST/BRIEF to
    latch onto, with exact ground-truth depth + poses for end-to-end tests.
    """
    rng = np.random.default_rng(seed)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    K4 = np.array([fx, fy, cx, cy], np.float32)

    # multi-scale random texture (sum of upsampled noise octaves)
    tex = np.zeros((tex_size, tex_size), np.float32)
    for cell in (8, 16, 32, 64):
        small = rng.random((tex_size // cell, tex_size // cell)).astype(np.float32)
        tex += np.kron(small, np.ones((cell, cell), np.float32))
    tex = (tex - tex.min()) / (tex.max() - tex.min())

    # texture maps world plane region x in [-span, span], y in [-span*0.75, ...]
    span = 6.0

    us, vs = np.meshgrid(np.arange(width), np.arange(height))
    d_cam = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float32)], -1)

    frames = []
    for i in range(n_frames):
        rvec = np.array([0.004 * i, 0.01 * i, 0.002 * i])
        center = np.array([motion_step * i, 0.02 * np.sin(i), 0.01 * i])
        R = _aa_to_R(rvec)  # cam->world rotation
        C = np.eye(4)
        C[:3, :3] = R
        C[:3, 3] = center

        dir_w = d_cam @ R.T  # [H,W,3]
        s = (plane_z - center[2]) / np.maximum(dir_w[..., 2], 1e-9)
        pw = center[None, None, :] + s[..., None] * dir_w
        depth = s.astype(np.float32)  # z-depth in camera frame (d_cam z == 1)

        tx = (pw[..., 0] + span) / (2 * span) * (tex_size - 1)
        ty = (pw[..., 1] + span * 0.75) / (1.5 * span) * (tex_size - 1)
        x0 = np.clip(tx.astype(int), 0, tex_size - 2)
        y0 = np.clip(ty.astype(int), 0, tex_size - 2)
        fx_ = np.clip(tx - x0, 0, 1)
        fy_ = np.clip(ty - y0, 0, 1)
        img = (
            tex[y0, x0] * (1 - fx_) * (1 - fy_)
            + tex[y0, x0 + 1] * fx_ * (1 - fy_)
            + tex[y0 + 1, x0] * (1 - fx_) * fy_
            + tex[y0 + 1, x0 + 1] * fx_ * fy_
        ).astype(np.float32)

        frames.append(
            {
                "gray": img,
                "depth": depth,
                "gt_cam_to_world": C,
                "timestamp": i / 30.0,
            }
        )
    return frames, K4


def write_tum_format(root, frames, depth_scale=5000.0):
    """Write rendered frames as an on-disk TUM RGB-D dataset (for loader and
    CLI end-to-end tests)."""
    import os

    from PIL import Image

    from bundleadjustment_tpu.data.tum import rotmat_to_quat

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for f in frames:
        ts = f["timestamp"]
        name = f"{ts:.6f}.png"
        rgb8 = (np.clip(f["gray"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(np.stack([rgb8] * 3, -1)).save(os.path.join(root, "rgb", name))
        d = f["depth"].copy()
        d[~np.isfinite(d)] = 0
        d16 = np.clip(d * depth_scale, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(root, "depth", name))
        rgb_lines.append(f"{ts:.6f} rgb/{name}")
        depth_lines.append(f"{ts:.6f} depth/{name}")
        M = f["gt_cam_to_world"]
        qx, qy, qz, qw = rotmat_to_quat(M[:3, :3])
        t = M[:3, 3]
        gt_lines.append(
            f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} {qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
    for fname, lines in [
        ("rgb.txt", rgb_lines),
        ("depth.txt", depth_lines),
        ("groundtruth.txt", gt_lines),
    ]:
        with open(os.path.join(root, fname), "w") as fh:
            fh.write("# synthetic\n" + "\n".join(lines) + "\n")


def _aa_to_R(r):
    theta = np.linalg.norm(r)
    if theta < 1e-12:
        return np.eye(3)
    k = r / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


@dataclass
class SyntheticScene:
    K4: np.ndarray  # [4] fx fy cx cy
    extr_gt: np.ndarray  # [K, 6] world->camera ground truth
    points_gt: np.ndarray  # [L, 3]
    cam_idx: np.ndarray  # [N] int32
    pt_idx: np.ndarray  # [N] int32
    uv: np.ndarray  # [N, 2] noisy pixel observations
    sigma2: np.ndarray  # [N]
    valid: np.ndarray  # [N] bool
    extr_init: np.ndarray  # [K, 6] perturbed initialization
    points_init: np.ndarray  # [L, 3]
    is_outlier: np.ndarray  # [N] bool (GT corruption labels)
    width: int = 640
    height: int = 480


def make_synthetic_scene(
    n_cams=8,
    n_pts=200,
    obs_per_pt=None,
    pixel_noise=0.5,
    outlier_frac=0.0,
    init_rot_noise=0.02,
    init_trans_noise=0.05,
    init_point_noise=0.05,
    seed=0,
    width=640,
    height=480,
    fx=525.0,
    fy=525.0,
):
    """Cameras on an arc looking at a landmark cloud around the origin.

    Every (camera, point) pair whose projection lands in the image becomes an
    observation (optionally subsampled).  Returns a SyntheticScene with both
    ground truth and a perturbed initialization.
    """
    rng = np.random.default_rng(seed)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    K4 = np.array([fx, fy, cx, cy], np.float32)

    # landmarks in a box in front of the rig
    points = rng.uniform([-2.0, -1.5, 3.0], [2.0, 1.5, 7.0], size=(n_pts, 3))

    # cameras on a gentle arc at z ~ 0, looking +z with small rotations
    extr = np.zeros((n_cams, 6))
    for k in range(n_cams):
        angle = 0.04 * (k - n_cams / 2)
        rvec = np.array([0.0, angle, 0.0]) + rng.normal(0, 0.01, 3)
        # camera centers spread along x
        center = np.array([0.5 * (k - n_cams / 2), 0.05 * rng.normal(), 0.0])
        R = _aa_to_R(rvec)
        t = -R @ center
        extr[k, :3] = rvec
        extr[k, 3:] = t

    cam_all, pt_all, uv_all = [], [], []
    for k in range(n_cams):
        R = _aa_to_R(extr[k, :3])
        xc = points @ R.T + extr[k, 3:]
        z = xc[:, 2]
        u = fx * xc[:, 0] / z + cx
        v = fy * xc[:, 1] / z + cy
        vis = (z > 0.1) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        idx = np.nonzero(vis)[0]
        if obs_per_pt is not None and len(idx) > 0:
            keep = rng.random(len(idx)) < min(1.0, obs_per_pt / n_cams)
            idx = idx[keep]
        cam_all.append(np.full(len(idx), k, np.int32))
        pt_all.append(idx.astype(np.int32))
        uv_all.append(np.stack([u[idx], v[idx]], -1))

    cam_idx = np.concatenate(cam_all)
    pt_idx = np.concatenate(pt_all)
    uv = np.concatenate(uv_all).astype(np.float64)
    n_obs = len(cam_idx)

    uv += rng.normal(0, pixel_noise, size=uv.shape)
    is_outlier = rng.random(n_obs) < outlier_frac
    uv[is_outlier] += rng.uniform(20, 100, size=(is_outlier.sum(), 2)) * rng.choice(
        [-1, 1], size=(is_outlier.sum(), 2)
    )

    # perturbed initialization (frame 0 kept exact: gauge anchor)
    extr_init = extr.copy()
    extr_init[1:, :3] += rng.normal(0, init_rot_noise, size=(n_cams - 1, 3))
    extr_init[1:, 3:] += rng.normal(0, init_trans_noise, size=(n_cams - 1, 3))
    points_init = points + rng.normal(0, init_point_noise, size=points.shape)

    return SyntheticScene(
        K4=K4,
        extr_gt=extr.astype(np.float32),
        points_gt=points.astype(np.float32),
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        uv=uv.astype(np.float32),
        sigma2=np.ones(n_obs, np.float32),
        valid=np.ones(n_obs, bool),
        extr_init=extr_init.astype(np.float32),
        points_init=points_init.astype(np.float32),
        is_outlier=is_outlier,
        width=width,
        height=height,
    )
