import os

import numpy as np
import pytest

from bundleadjustment_tpu.data.replica import ReplicaDataset
from bundleadjustment_tpu.data.synthetic import render_plane_sequence


def write_replica_format(root, frames, depth_scale=6553.5):
    from PIL import Image

    res = os.path.join(root, "results")
    os.makedirs(res, exist_ok=True)
    rows = []
    for i, f in enumerate(frames):
        g8 = (np.clip(f["gray"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(np.stack([g8] * 3, -1)).save(
            os.path.join(res, f"frame{i:06d}.jpg"), quality=95
        )
        d = f["depth"].copy()
        d[~np.isfinite(d)] = 0
        d16 = np.clip(d * depth_scale, 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(res, f"depth{i:06d}.png"))
        rows.append(" ".join(f"{x:.9f}" for x in f["gt_cam_to_world"].reshape(-1)))
    with open(os.path.join(root, "traj.txt"), "w") as fh:
        fh.write("\n".join(rows) + "\n")


def test_replica_loader_roundtrip(tmp_path):
    frames, K4 = render_plane_sequence(n_frames=3, width=120, height=90)
    root = str(tmp_path / "replica")
    write_replica_format(root, frames)
    ds = ReplicaDataset(root=root)
    assert len(ds) == 3
    f0 = ds[0]
    assert f0.gray.shape == (90, 120)
    # depth within 16-bit quantization at scale 6553.5
    np.testing.assert_allclose(f0.depth, frames[0]["depth"], atol=2e-3)
    # gray within JPEG compression error
    assert np.abs(f0.gray - frames[0]["gray"]).mean() < 0.03
    np.testing.assert_allclose(f0.gt_cam_to_world, frames[0]["gt_cam_to_world"],
                               atol=1e-6)
    # frame stride
    ds2 = ReplicaDataset(root=root, frame_stride=2)
    assert len(ds2) == 2
