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
