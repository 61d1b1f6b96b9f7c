import json
import os

import numpy as np
import pytest

from bundleadjustment_tpu.data.synthetic import render_plane_sequence, write_tum_format
from bundleadjustment_tpu.vis.mesh import (
    create_map_mesh,
    read_ply_vertices,
    write_off,
    write_ply,
)
from bundleadjustment_tpu.vis.pointcloud import backproject_depth, depth_normals


def test_off_writer(tmp_path, rng):
    pts = rng.normal(size=(20, 3))
    colors = rng.integers(0, 255, (20, 3)).astype(np.uint8)
    path = str(tmp_path / "m.off")
    write_off(path, pts, colors=colors)
    lines = open(path).read().splitlines()
    assert lines[0] == "COFF"
    assert lines[1].split()[0] == "20"
    assert len(lines) == 22


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(15, 3))
    path = str(tmp_path / "c.ply")
    write_ply(path, pts)
    back = read_ply_vertices(path)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_create_map_mesh_with_glyphs(rng):
    pts = rng.normal(size=(50, 3))
    cams = [np.eye(4), np.eye(4)]
    verts, faces, colors = create_map_mesh(pts, cam_poses=cams, faces_type="greedy")
    assert len(verts) == 50 + 2 * 5  # points + 2 glyphs
    assert len(faces) > 8  # Delaunay faces + 8 glyph faces
    assert len(colors) == len(verts)


def test_backproject_depth_plane():
    K4 = np.array([100.0, 100.0, 31.5, 23.5], np.float32)
    depth = np.full((48, 64), 2.0, np.float32)
    depth[0, 0] = -np.inf
    pts, valid = backproject_depth(K4, depth)
    assert valid.sum() == 48 * 64 - 1
    np.testing.assert_allclose(pts[valid][:, 2], 2.0, atol=1e-5)


def test_depth_normals_plane():
    K4 = np.array([100.0, 100.0, 31.5, 23.5], np.float32)
    depth = np.full((48, 64), 2.0, np.float32)
    n, ok = depth_normals(K4, depth)
    # plane perpendicular to optical axis -> normal along -z (toward camera)
    inner = n[ok]
    assert np.abs(np.abs(inner[:, 2]) - 1.0).max() < 1e-4


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """Full CLI run on an on-disk synthetic TUM dataset."""
    from bundleadjustment_tpu import cli

    frames, K4 = render_plane_sequence(n_frames=5, width=160, height=120)
    root = str(tmp_path / "ds")
    write_tum_format(root, frames)
    with open(os.path.join(root, "intrinsics.json"), "w") as f:
        json.dump(
            {"fx": float(K4[0]), "fy": float(K4[1]), "cx": float(K4[2]),
             "cy": float(K4[3]), "width": 160, "height": 120},
            f,
        )
    out = str(tmp_path / "out")
    results = cli.main(
        [
            "--dataset-name", "synthetic",
            "--dataset-path", root,
            "--output-path", out,
            "--init-type", "gtdepth",
            "--estimation", "ba",
            "--frames", "5",
            "--trajectory",
            "--n-features", "300",
            "--n-levels", "3",
        ]
    )
    assert results["keyframes"] >= 2
    assert "ate_rmse" in results
    assert results["ate_rmse"] < 0.08
    prefix = [f for f in os.listdir(out) if f.endswith("_results.json")]
    assert prefix
    traj = [f for f in os.listdir(out) if f.endswith("_estimatedPoses.txt")]
    assert traj
    mesh = [f for f in os.listdir(out) if f.endswith("_mesh.off")]
    assert mesh
