"""Adversarial tests for the finalize-time refinement displacement guard
(round-4 VERDICT #4 + advisor finding on `driver.py` strong-evidence bypass).

The failure mode the guard exists for: a tracked frame whose stored
constraint set is stale-but-self-consistent (landmarks fused/moved after
tracking, repetitive texture) re-solves CONFIDENTLY (every constraint a chi2
inlier) to a wrong pose far from the tracked one.  Round 4 added a
strong-evidence override that removed the displacement cap entirely; round 5
bounds it at 10x the guard.  Reference guard analogue: the PnP translation
sanity check, `ba_project/src/ba/SfMHelper.cpp:76-80`.

Both directions are locked:
- a consistent-but-wrong optimum beyond 10x the guard is REJECTED even at
  100% inlier support;
- a genuine drift correction between 1x and 10x the guard with strong
  support is ACCEPTED (the round-4 fix that collapsed config-1 ATE
  0.0531 -> 0.0149 must keep working).
"""

import numpy as np

from bundleadjustment_tpu.geometry import np_se3
from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline, PipelineConfig
from bundleadjustment_tpu.pipeline.driver import TrackRecord


def _project(K4, extr, X):
    R = np_se3.aa_to_R(extr[:3])
    xc = X @ R.T + extr[3:]
    z = xc[:, 2]
    u = K4[0] * xc[:, 0] / z + K4[2]
    v = K4[1] * xc[:, 1] / z + K4[3]
    return np.stack([u, v], -1)


def _build_pipe(n_landmarks=60, kf_step=0.005, seed=0):
    """Pipeline with 4 keyframes in a tight line and landmarks at ~2 m.

    Tiny keyframe steps make the displacement guard small (3x median step,
    floored at 1% of median landmark range ~= 0.02 m), so a decimeter-scale
    wrong-pose jump exceeds 10x the guard while staying easily convergable
    for the motion-only re-solve."""
    rng = np.random.default_rng(seed)
    K4 = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
    cfg = PipelineConfig(
        n_features=64, n_levels=1, refine_guided=False,
        motion_outer=8, motion_inner=20,
    )
    pipe = BundleAdjustmentPipeline(cfg, K4, 320, 240)
    m = pipe.map
    desc = np.zeros((4, 8), np.uint32)
    xy = rng.uniform(40, 280, (4, 2)).astype(np.float32)
    for k in range(4):
        extr = np.zeros(6)
        extr[3] = kf_step * k
        m.add_frame(float(k), extr, xy, np.zeros(4, np.int32),
                    np.ones(4, np.float32), desc)
        m.set_keyframe(k)
        pipe.trajectory.append(TrackRecord(float(k), k, extr.copy(), True))
    X = np.stack([
        rng.uniform(-0.8, 0.8, n_landmarks),
        rng.uniform(-0.6, 0.6, n_landmarks),
        rng.uniform(1.6, 2.4, n_landmarks),
    ], -1)
    pt_ids = np.array([m.add_point(X[i]) for i in range(n_landmarks)])
    return pipe, K4, X, pt_ids


def _add_tracked_record(pipe, K4, X, pt_ids, true_extr, uv_pose):
    """Tracked (non-key) record at `true_extr` whose stored constraints are
    projections of the landmarks from `uv_pose` — self-consistent evidence
    for the WRONG pose when uv_pose != true_extr."""
    uv = _project(K4, uv_pose, X)
    rec = TrackRecord(
        99.0, -1, true_extr.copy(), False,
        assoc_pt=pt_ids.astype(np.int64),
        assoc_uv=uv.astype(np.float32),
        assoc_sig=np.ones(len(X), np.float32),
    )
    pipe.trajectory.append(rec)
    return rec


def test_consistent_but_wrong_pose_beyond_10x_guard_rejected():
    pipe, K4, X, pt_ids = _build_pipe()
    true_extr = np.zeros(6)
    true_extr[3] = 0.0175  # between the keyframes
    wrong = true_extr.copy()
    wrong[3] += 0.45  # ~0.45 m jump: >> 10x the ~0.02 m guard
    rec = _add_tracked_record(pipe, K4, X, pt_ids, true_extr, wrong)

    pipe._refine_trajectory()
    # every constraint supports `wrong` perfectly, but the displacement is
    # beyond the bounded override: the record must keep its tracked pose
    assert np.linalg.norm(rec.extr - true_extr) < 1e-6, rec.extr


def test_strong_drift_correction_within_10x_guard_accepted():
    pipe, K4, X, pt_ids = _build_pipe()
    drifted = np.zeros(6)
    drifted[3] = 0.0175
    corrected = drifted.copy()
    corrected[3] += 0.08  # 4-5x the guard: the round-4 drift-fix regime
    rec = _add_tracked_record(pipe, K4, X, pt_ids, drifted, corrected)

    pipe._refine_trajectory()
    c_new = np_se3.rt6_to_mat44(np_se3.rt6_inverse(rec.extr))[:3, 3]
    c_tgt = np_se3.rt6_to_mat44(np_se3.rt6_inverse(corrected))[:3, 3]
    assert np.linalg.norm(c_new - c_tgt) < 0.01, (rec.extr, corrected)
