import numpy as np

from bundleadjustment_tpu.data.synthetic import render_plane_sequence, write_tum_format
from bundleadjustment_tpu.data.tum import (
    TUMDataset,
    associate,
    quat_to_rotmat,
    read_tum_trajectory,
    rotmat_to_quat,
    write_tum_trajectory,
)


def test_quat_roundtrip(rng):
    from bundleadjustment_tpu.data.synthetic import _aa_to_R

    for _ in range(10):
        r = rng.normal(size=3)
        R = _aa_to_R(r)
        q = rotmat_to_quat(R)
        R2 = quat_to_rotmat(*q)
        np.testing.assert_allclose(R2, R, atol=1e-9)


def test_associate():
    a = [(0.0, ["a"]), (0.1, ["b"]), (0.25, ["c"])]
    b = [(0.005, ["x"]), (0.11, ["y"]), (0.5, ["z"])]
    pairs = associate(a, b, max_difference=0.02)
    assert pairs == [(0, 0), (1, 1)]


def test_render_and_tum_roundtrip(tmp_path, rng):
    frames, K4 = render_plane_sequence(n_frames=4, width=64, height=48)
    root = str(tmp_path / "synthetic_tum")
    write_tum_format(root, frames)
    ds = TUMDataset(root=root)
    ds.K4 = K4  # synthetic intrinsics differ from fr1 defaults
    assert len(ds) == 4
    f0 = ds[0]
    assert f0.gray.shape == (48, 64)
    assert f0.depth.shape == (48, 64)
    # depth round trip within PNG quantization (1/5000 m)
    d_orig = frames[0]["depth"]
    np.testing.assert_allclose(f0.depth, d_orig, atol=2e-3)
    # gray round trip within 8-bit quantization
    np.testing.assert_allclose(f0.gray, frames[0]["gray"], atol=2 / 255)
    # GT pose association
    np.testing.assert_allclose(
        f0.gt_cam_to_world, frames[0]["gt_cam_to_world"], atol=1e-4
    )


def test_trajectory_writer_reader(tmp_path, rng):
    from bundleadjustment_tpu.data.synthetic import _aa_to_R

    mats = []
    ts = []
    for i in range(5):
        M = np.eye(4)
        M[:3, :3] = _aa_to_R(rng.normal(0, 0.3, 3))
        M[:3, 3] = rng.normal(0, 1, 3)
        mats.append(M)
        ts.append(i * 0.1)
    path = str(tmp_path / "traj.txt")
    write_tum_trajectory(path, ts, mats)
    ts2, mats2 = read_tum_trajectory(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-4)
    for a, b in zip(mats, mats2):
        np.testing.assert_allclose(a, b, atol=2e-3)
