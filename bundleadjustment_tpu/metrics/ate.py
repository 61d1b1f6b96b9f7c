"""Absolute Trajectory Error with Horn alignment and optimal scale.

Implements the same math as the reference's offline evaluation scripts
(`ba_project/src/metrics/evaluate_ate_scale.py:51-97,173-180` — the
Sturm/TUM tooling with Mur-Artal's scale extension): closed-form SVD (Horn)
rotation between zero-centered trajectories, the optimal uniform scale, and
RMSE/mean/median statistics of the residual translational error.
"""

from __future__ import annotations

import numpy as np


def align_horn_scale(model, data):
    """Align `model` (estimated, [N,3]) to `data` (ground truth, [N,3]).

    Returns (R [3,3], t [3], s float) such that  s * R @ model_i + t ~= data_i.
    """
    model = np.asarray(model, np.float64).T  # [3, N]
    data = np.asarray(data, np.float64).T
    mu_m = model.mean(axis=1, keepdims=True)
    mu_d = data.mean(axis=1, keepdims=True)
    mc = model - mu_m
    dc = data - mu_d

    W = dc @ mc.T  # covariance (data x model)
    U, _, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt

    rot_mc = R @ mc
    # optimal scale (Mur-Artal): s = <dc, R mc> / <R mc, R mc>
    dots = float(np.sum(dc * rot_mc))
    norms = float(np.sum(rot_mc * rot_mc))
    s = dots / max(norms, 1e-12)

    t = mu_d - s * (R @ mu_m)
    return R, t[:, 0], s


def ate_rmse(model, data, with_scale=True):
    """Aligned RMSE (meters) between trajectories."""
    R, t, s = align_horn_scale(model, data)
    if not with_scale:
        s = 1.0
    aligned = (s * (R @ np.asarray(model, np.float64).T)).T + t
    err = np.linalg.norm(aligned - data, axis=1)
    return float(np.sqrt(np.mean(err**2)))


def evaluate_ate(est_ts, est_xyz, gt_ts, gt_xyz, max_difference=0.02):
    """Timestamp-associated ATE summary (associate.py + evaluate_ate_scale.py).

    Returns dict with rmse / mean / median / std / min / max / n_pairs and the
    alignment (R, t, s).
    """
    est_ts = np.asarray(est_ts)
    gt_ts = np.asarray(gt_ts)
    pairs = []
    used_gt = set()
    order = np.argsort(est_ts)
    for i in order:
        j = int(np.argmin(np.abs(gt_ts - est_ts[i])))
        if abs(gt_ts[j] - est_ts[i]) < max_difference and j not in used_gt:
            used_gt.add(j)
            pairs.append((i, j))
    if len(pairs) < 2:
        raise ValueError("fewer than 2 associated trajectory pairs")
    ei = np.array([p[0] for p in pairs])
    gi = np.array([p[1] for p in pairs])
    model = np.asarray(est_xyz)[ei]
    data = np.asarray(gt_xyz)[gi]
    R, t, s = align_horn_scale(model, data)
    aligned = (s * (R @ model.T)).T + t
    err = np.linalg.norm(aligned - data, axis=1)
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "std": float(err.std()),
        "min": float(err.min()),
        "max": float(err.max()),
        "n_pairs": len(pairs),
        "scale": float(s),
        "R": R,
        "t": t,
    }
