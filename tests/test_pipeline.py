"""End-to-end pipeline tests on rendered synthetic sequences.

The reference has no equivalent harness (its only test mocks 3 points); these
are golden-trajectory tests: render a textured plane with exact GT depth +
poses, run the full pipeline, and require small ATE after Horn+scale
alignment (SURVEY.md §4 'synthetic-scene integration tests')."""

import numpy as np
import pytest

from bundleadjustment_tpu.data.synthetic import render_plane_sequence
from bundleadjustment_tpu.data.tum import FrameData
from bundleadjustment_tpu.metrics import evaluate_ate
from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline, PipelineConfig


def frames_to_framedata(frames):
    return [
        FrameData(
            index=i,
            timestamp=f["timestamp"],
            gray=f["gray"],
            depth=f["depth"],
            rgb=None,
            gt_cam_to_world=f["gt_cam_to_world"],
        )
        for i, f in enumerate(frames)
    ]


def run_and_ate(cfg, n_frames=6, motion_step=0.06, width=160, height=120,
                fx=150.0, **render_kw):
    frames, K4 = render_plane_sequence(
        n_frames=n_frames, width=width, height=height, motion_step=motion_step,
        fx=fx, fy=fx, **render_kw
    )
    ds = frames_to_framedata(frames)
    pipe = BundleAdjustmentPipeline(cfg, K4, width, height)
    stats = pipe.run(ds)
    ts, mats = pipe.trajectory_cam_to_world()
    assert len(ts) >= n_frames - 2, f"tracked too few frames: {len(ts)} ({stats})"
    gt_ts = np.array([f["timestamp"] for f in frames])
    gt_xyz = np.array([f["gt_cam_to_world"][:3, 3] for f in frames])
    est_xyz = mats[:, :3, 3]
    res = evaluate_ate(ts, est_xyz, gt_ts, gt_xyz, max_difference=0.02)
    return res, pipe, stats


@pytest.mark.slow
def test_pipeline_gtdepth_ba_tracking():
    cfg = PipelineConfig(
        init_type="gtdepth",
        estimation="ba",
        n_features=400,
        n_levels=3,
        local_ba=False,
        final_ba_outer=1,
        final_ba_iters=10,
    )
    # 320x240: feature localization noise is small enough for sub-cm ATE
    # (at 160x120 texture quantization dominates; see git history)
    res, pipe, stats = run_and_ate(cfg, width=320, height=240, fx=300.0)
    assert res["rmse"] < 0.012, res
    assert stats["keyframes"] >= 2
    assert len(pipe.map.active_points()) > 50


@pytest.mark.slow
def test_pipeline_standard_init():
    cfg = PipelineConfig(
        init_type="standard",
        estimation="ba",
        n_features=400,
        n_levels=3,
        local_ba=False,
        final_ba_outer=1,
        final_ba_iters=10,
    )
    # larger baseline: 2-view initialization from a homography needs parallax
    # (small-baseline H decomposition is noise-dominated — same limitation as
    # the reference's Standard init); 320x240 keeps triangulation noise
    # (sigma_z ~ z^2 sigma_px / (f b)) below the assertion bound
    res, pipe, stats = run_and_ate(cfg, motion_step=0.25, width=320, height=240, fx=300.0)
    assert res["rmse"] < 0.04, res


@pytest.mark.slow
def test_pipeline_pnp_estimation():
    cfg = PipelineConfig(
        init_type="gtdepth",
        estimation="pnp",
        n_features=400,
        n_levels=3,
        local_ba=False,
        final_ba_outer=1,
        final_ba_iters=10,
    )
    res, pipe, stats = run_and_ate(cfg)
    # pnp at coarse resolution: smoke-level bound (accuracy covered by the
    # 320x240 gtdepth test; pnp shares the same motion-only core)
    assert res["rmse"] < 0.06, res


def test_fused_tracking_matches_split_dispatches():
    """The one-dispatch tracked-frame step must produce the same trajectory
    as the split detect/match/associate/motion-only path (identical math,
    different fusion)."""
    kw = dict(n_frames=6, motion_step=0.06)
    # track_batch=1: this compares the single-frame fused dispatch against
    # the split path (batch-vs-fused parity has its own test below)
    cfg_f = PipelineConfig(init_type="gtdepth", estimation="ba",
                           n_features=200, n_levels=3, fused_tracking=True,
                           track_batch=1)
    cfg_s = PipelineConfig(init_type="gtdepth", estimation="ba",
                           n_features=200, n_levels=3, fused_tracking=False,
                           track_batch=1)
    _, pipe_f, _ = run_and_ate(cfg_f, **kw)
    _, pipe_s, _ = run_and_ate(cfg_s, **kw)
    ts_f, m_f = pipe_f.trajectory_cam_to_world()
    ts_s, m_s = pipe_s.trajectory_cam_to_world()
    assert len(ts_f) == len(ts_s)
    # sub-millimeter tolerance: the fused and split graphs compile with
    # different XLA fusion boundaries, so last-ulp float differences in the
    # frontend (shift-add convs fuse into neighbors) can flip near-tie
    # corner ranks and amplify through the nonlinear pipeline
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_s),
                               atol=5e-4)
    # tighter guards underneath the loosened trajectory bound (round-3
    # advisor): systematic drift cannot hide — the discrete outputs
    # (keyframe set, map size) must agree exactly, and the KEYFRAME poses
    # (BA-refined, insensitive to near-tie corner ranks) much closer
    assert pipe_f.stats["keyframes"] == pipe_s.stats["keyframes"]
    assert len(pipe_f.map.active_points()) == len(pipe_s.map.active_points())
    kf_f = np.asarray([m for r, m in zip(pipe_f.trajectory, m_f)
                       if r.is_keyframe])
    kf_s = np.asarray([m for r, m in zip(pipe_s.trajectory, m_s)
                       if r.is_keyframe])
    np.testing.assert_allclose(kf_f, kf_s, atol=5e-5)


def test_batched_tracking_matches_per_frame():
    """The device-resident tracking microbatch (track_batch>1, one lax.scan
    dispatch per B frames with on-device association-state propagation) must
    reproduce the per-frame fused path: same statuses, same keyframes, same
    map, same trajectory (up to f32-vs-f64 constant-velocity seeding)."""
    frames, K4 = render_plane_sequence(
        n_frames=12, width=160, height=120, motion_step=0.05,
        fx=150.0, fy=150.0,
    )
    ds = frames_to_framedata(frames)
    base = dict(init_type="gtdepth", estimation="ba", n_features=200,
                n_levels=3, local_ba=False, final_ba_outer=1,
                final_ba_iters=10, fused_tracking=True,
                track_local_map=False)  # base-path parity; tlm has its own
    pipe_b = BundleAdjustmentPipeline(
        PipelineConfig(track_batch=4, **base), K4, 160, 120)
    pipe_1 = BundleAdjustmentPipeline(
        PipelineConfig(track_batch=1, **base), K4, 160, 120)
    st_b = pipe_b.process_frames(ds)
    st_1 = [pipe_1.process_frame(f) for f in ds]
    pipe_b.finalize()
    pipe_1.finalize()
    assert st_b == st_1
    assert pipe_b.stats["keyframes"] == pipe_1.stats["keyframes"]
    assert len(pipe_b.map.active_points()) == len(pipe_1.map.active_points())
    ts_b, m_b = pipe_b.trajectory_cam_to_world()
    ts_1, m_1 = pipe_1.trajectory_cam_to_world()
    assert len(ts_b) == len(ts_1)
    # 1e-3: the batch kernel seeds motion-only BA from an f32 on-device
    # constant-velocity prediction; the per-frame path composes it in f64
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_1), atol=1e-3)


def test_batched_tracking_pnp_guard_parity():
    """PnP mode: the batch kernel's on-device translation-jump guard and
    min-association fallback must replicate the host rules."""
    frames, K4 = render_plane_sequence(
        n_frames=10, width=160, height=120, motion_step=0.05,
        fx=150.0, fy=150.0,
    )
    ds = frames_to_framedata(frames)
    base = dict(init_type="gtdepth", estimation="pnp", n_features=200,
                n_levels=3, local_ba=False, final_ba_outer=1,
                final_ba_iters=10, fused_tracking=True,
                track_local_map=False)
    pipe_b = BundleAdjustmentPipeline(
        PipelineConfig(track_batch=4, **base), K4, 160, 120)
    pipe_1 = BundleAdjustmentPipeline(
        PipelineConfig(track_batch=1, **base), K4, 160, 120)
    st_b = pipe_b.process_frames(ds)
    st_1 = [pipe_1.process_frame(f) for f in ds]
    assert st_b == st_1
    ts_b, m_b = pipe_b.trajectory_cam_to_world()
    ts_1, m_1 = pipe_1.trajectory_cam_to_world()
    assert len(ts_b) == len(ts_1)
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_1), atol=1e-3)


def test_batched_tlm_matches_per_frame():
    """The in-scan local-map second pass (tlm stage of _track_batch_jit)
    must reproduce the per-frame host path's guided matching + re-solve.

    Exact discrete parity is not guaranteed — the batch snapshot does not
    see representative-descriptor refreshes from tracked frames WITHIN the
    batch (documented staleness < track_batch frames), and the host path
    projects in f64 — so the assertions are: same statuses, same keyframe
    count, near-identical trajectory, and map sizes within a small delta.
    """
    frames, K4 = render_plane_sequence(
        n_frames=12, width=160, height=120, motion_step=0.05,
        fx=150.0, fy=150.0,
    )
    ds = frames_to_framedata(frames)
    base = dict(init_type="gtdepth", estimation="ba", n_features=200,
                n_levels=3, local_ba=False, final_ba_outer=1,
                final_ba_iters=10, fused_tracking=True,
                track_local_map=True)
    pipe_b = BundleAdjustmentPipeline(
        PipelineConfig(track_batch=4, **base), K4, 160, 120)
    pipe_1 = BundleAdjustmentPipeline(
        PipelineConfig(track_batch=1, **base), K4, 160, 120)
    st_b = pipe_b.process_frames(ds)
    st_1 = [pipe_1.process_frame(f) for f in ds]
    pipe_b.finalize()
    pipe_1.finalize()
    assert st_b == st_1
    assert pipe_b.stats["keyframes"] == pipe_1.stats["keyframes"]
    n_b = len(pipe_b.map.active_points())
    n_1 = len(pipe_1.map.active_points())
    assert abs(n_b - n_1) <= max(0.02 * n_1, 2), (n_b, n_1)
    ts_b, m_b = pipe_b.trajectory_cam_to_world()
    ts_1, m_1 = pipe_1.trajectory_cam_to_world()
    assert len(ts_b) == len(ts_1)
    # 1-2 guided associations per frame legitimately differ (the snapshot's
    # descriptor staleness); assert equivalence at the ATE level instead of
    # pose-wise, plus closely matching guided-association counts
    gt_ts = np.array([f["timestamp"] for f in frames])
    gt_xyz = np.array([f["gt_cam_to_world"][:3, 3] for f in frames])
    ate_b = evaluate_ate(ts_b, m_b[:, :3, 3], gt_ts, gt_xyz)["rmse"]
    ate_1 = evaluate_ate(ts_1, m_1[:, :3, 3], gt_ts, gt_xyz)["rmse"]
    assert ate_b < 0.06 and ate_1 < 0.06, (ate_b, ate_1)
    assert abs(ate_b - ate_1) < 0.01, (ate_b, ate_1)
    cnt_b = [0 if r.assoc_pt is None else len(r.assoc_pt)
             for r in pipe_b.trajectory]
    cnt_1 = [0 if r.assoc_pt is None else len(r.assoc_pt)
             for r in pipe_1.trajectory]
    assert all(abs(a - b) <= 3 for a, b in zip(cnt_b, cnt_1)), (cnt_b, cnt_1)
