"""Data-parallel frame frontend on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
from jax.sharding import Mesh

from bundleadjustment_tpu.data.synthetic import render_plane_sequence
from bundleadjustment_tpu.ops.features import FeatureConfig
from bundleadjustment_tpu.parallel.frontend import FRAME_AXIS, detect_batch_sharded


def _images(n):
    frames, _ = render_plane_sequence(n_frames=n, width=128, height=96,
                                      fx=120.0, fy=120.0)
    return np.stack([f["gray"] for f in frames])


def test_sharded_frontend_matches_vmap():
    cfg = FeatureConfig(n_features=120, n_levels=3)
    imgs = _images(8)
    mesh = Mesh(np.array(jax.devices()), (FRAME_AXIS,))
    ref = jax.device_get(detect_batch_sharded(imgs, cfg, mesh=None))
    got = jax.device_get(detect_batch_sharded(imgs, cfg, mesh=mesh))
    np.testing.assert_array_equal(got.valid, ref.valid)
    np.testing.assert_allclose(got.xy, ref.xy, atol=1e-5)
    np.testing.assert_array_equal(got.desc, ref.desc)
    assert got.valid.any()


def test_sharded_frontend_pads_ragged_batch():
    """B not divisible by the mesh size: zero-padded, padding stripped."""
    cfg = FeatureConfig(n_features=64, n_levels=2)
    imgs = _images(5)
    mesh = Mesh(np.array(jax.devices()), (FRAME_AXIS,))
    out = jax.device_get(detect_batch_sharded(imgs, cfg, mesh=mesh))
    assert out.xy.shape[0] == 5
    ref = jax.device_get(detect_batch_sharded(imgs, cfg, mesh=None))
    np.testing.assert_array_equal(out.valid, ref.valid)
    np.testing.assert_array_equal(out.desc, ref.desc)


def test_predetect_pipeline_parity():
    """Pipeline fed by the mesh-sharded batched frontend matches the normal
    split (non-fused) per-frame pipeline: same statuses, same trajectory."""
    from bundleadjustment_tpu.data.tum import FrameData
    from bundleadjustment_tpu.pipeline import (
        BundleAdjustmentPipeline,
        PipelineConfig,
    )

    frames, K4 = render_plane_sequence(n_frames=6, width=160, height=120,
                                       fx=150.0, fy=150.0, motion_step=0.05)
    ds = [
        FrameData(index=i, timestamp=f["timestamp"], gray=f["gray"],
                  depth=f["depth"], rgb=None,
                  gt_cam_to_world=f["gt_cam_to_world"])
        for i, f in enumerate(frames)
    ]
    cfg = PipelineConfig(init_type="gtdepth", estimation="ba",
                         local_ba=False, n_features=150, n_levels=2,
                         fused_tracking=False, track_batch=1)

    ref = BundleAdjustmentPipeline(cfg, K4, 160, 120)
    ref_statuses = ref.process_frames(ds)

    mesh = Mesh(np.array(jax.devices()), (FRAME_AXIS,))
    pre = BundleAdjustmentPipeline(cfg, K4, 160, 120)
    pf = pre.predetect_features(ds, mesh=mesh)
    pre_statuses = pre.process_frames(ds, prefeats=pf)

    assert pre_statuses == ref_statuses
    for pipe in (ref, pre):
        pipe.finalize()
    _, mats_ref = ref.trajectory_cam_to_world()
    _, mats_pre = pre.trajectory_cam_to_world()
    np.testing.assert_allclose(mats_pre, mats_ref, atol=1e-4)
