"""Worker for the multi-process (multi-"host") smoke test.

Spawned by tests/test_multihost.py with N processes x 4 virtual CPU devices
each.  Exercises the real `jax.distributed` path (SURVEY.md §2.3 collective
backend): cross-process psum inside `sharded_dense_ba_solve` and
`windowed_global_ba`, with parity asserted against the single-process
solves of the same problems.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Process 0 prints one JSON line with the parity results.
"""

from __future__ import annotations

import json
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bundleadjustment_tpu.parallel.multihost import (
        global_mesh,
        initialize_multihost,
    )

    ok = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert ok, "initialize_multihost did not initialize"
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = jax.device_count()
    assert n_dev == 4 * nproc, n_dev

    import numpy as np
    import jax.numpy as jnp

    from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
    from bundleadjustment_tpu.parallel.sharded_dense_ba import (
        shard_dense_problem,
        sharded_dense_ba_solve,
    )
    from bundleadjustment_tpu.solvers import LMConfig
    from bundleadjustment_tpu.solvers.dense_ba import (
        dense_ba_solve,
        densify_problem,
    )

    # --- sharded_dense_ba_solve across processes ------------------------
    # identical host-global problem on every process (same seed)
    sc = make_synthetic_scene(n_cams=8, n_pts=256, pixel_noise=0.3, seed=7)
    cam_fixed = np.zeros(8, bool)
    cam_fixed[:2] = True
    sc.extr_init[1] = sc.extr_gt[1]
    cfg = LMConfig(max_iters=8, solver="dense")

    mesh = global_mesh()
    prob, pts_sharded, _, _ = shard_dense_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid,
        cam_fixed, sc.points_init, n_dev,
    )
    cams_d, _X, info_d = sharded_dense_ba_solve(
        prob, sc.extr_init, pts_sharded, cfg, mesh
    )
    cams_d = np.asarray(cams_d)  # replicated output: addressable everywhere

    # single-process reference on the local default device
    dense, _ = densify_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid,
        cam_fixed, 256,
    )
    cams_ref, _pts_ref, info_ref = dense_ba_solve(
        dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init), cfg
    )
    cams_err = float(np.abs(cams_d - np.asarray(cams_ref)).max())
    cost_rel = abs(
        float(info_d["cost"]) - float(info_ref["cost"])
    ) / max(float(info_ref["cost"]), 1e-12)

    # --- windowed_global_ba across processes ----------------------------
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_windows import _build_synthetic_store

    sc_w, m_dist = _build_synthetic_store(n_cams=12, n_pts=200, seed=21)
    from jax.sharding import Mesh

    wmesh = Mesh(np.array(jax.devices()), ("window",))
    from bundleadjustment_tpu.parallel.windows import windowed_global_ba

    info_w = windowed_global_ba(m_dist, window=6, stride=3, mesh=wmesh)

    _, m_ref = _build_synthetic_store(n_cams=12, n_pts=200, seed=21)
    windowed_global_ba(m_ref, window=6, stride=3)
    pose_err = float(
        np.abs(m_dist.kf_pose[:12] - m_ref.kf_pose[:12]).max()
    )
    err_gt_after = float(
        np.linalg.norm(m_dist.kf_pose[:12] - sc_w.extr_gt, axis=1).mean()
    )

    if pid == 0:
        print(json.dumps({
            "process_count": jax.process_count(),
            "device_count": n_dev,
            "cams_err": cams_err,
            "cost_rel": cost_rel,
            "windows": int(info_w["windows"]),
            "window_pose_err": pose_err,
            "err_gt_after": err_gt_after,
        }), flush=True)


if __name__ == "__main__":
    main()
