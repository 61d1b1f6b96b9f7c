"""Data-parallel frame frontend: feature extraction sharded over a mesh.

SURVEY.md §2.3 row "data-parallel frame frontend": the reference detects
features one frame at a time inside its tracking loop
(`ba_project/src/ba/BundleAdjustment.cpp:79-80`).  Tracking is inherently
sequential, but feature extraction is not — bulk ingest (dataset
preprocessing, relocalization databases, the window layer re-detecting for
loop closure) runs every frame independently.  This module shards the frame
axis of `detect_and_describe` over a 1-D device mesh with `shard_map`:
each device detects its frame block with the same vmapped kernel, zero
collectives (embarrassingly parallel — results gather on the host).

Composes with the window layer: hosts extract their frame blocks in
parallel, then their keyframe windows solve in parallel
(`parallel/windows.py`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bundleadjustment_tpu.ops.features import FeatureConfig, detect_and_describe

FRAME_AXIS = "frame"


def detect_batch_sharded(images, cfg: FeatureConfig = FeatureConfig(),
                         mesh: Mesh | None = None):
    """Detect features on a frame batch [B, H, W], sharded over `mesh`.

    B is padded to a multiple of the mesh size with zero frames (their
    Features come back with valid=False everywhere since zero images have no
    positive-response corners).  Returns Features with leading axis B
    (padding stripped).

    mesh=None falls back to the single-device vmap (ops.features.detect_batch
    semantics) — same results, one device.
    """
    images = np.asarray(images)
    B = images.shape[0]
    if mesh is None:
        fn = jax.jit(
            jax.vmap(lambda im: detect_and_describe(im, cfg)),
        )
        return fn(jnp.asarray(images))

    D = mesh.devices.size
    Bp = ((B + D - 1) // D) * D
    if Bp != B:
        images = np.concatenate(
            [images, np.zeros((Bp - B,) + images.shape[1:], images.dtype)]
        )

    def local(block):
        return jax.vmap(lambda im: detect_and_describe(im, cfg))(block)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(FRAME_AXIS), out_specs=P(FRAME_AXIS)
    )
    out = jax.jit(fn)(jnp.asarray(images))
    if Bp != B:
        out = jax.tree.map(lambda a: a[:B], out)
    return out
