"""Sliding-window BA + pose-graph stitching — the trajectory as the
"sequence" axis (SURVEY.md §2.3 "sequence/context parallelism" analogue).

The reference's scalability story is a single 10-frame local BA around the
newest keyframe (`ba_project/src/ba/Optimizer.cpp:508`).  Here the whole
trajectory is partitioned into overlapping keyframe windows and ALL windows
solve simultaneously: per-window problems are padded to a common shape and
the LM/Schur solve is `vmap`ped over the window axis.  Pass `mesh=` to
actually distribute: the window axis is sharded over the mesh with
`shard_map` (each device solves its window subset locally — windows are
embarrassingly parallel), and landmarks shared between overlapping windows
are reconciled by an explicit **halo exchange**: every shard contributes
(position-sum, count) per global landmark id and one `psum` over the mesh
averages the copies — the only cross-device traffic in the whole solve.

The per-window solutions are gauge-free (each pins its own first camera), so
a pose-graph solve stitches the relative poses from every window into one
global trajectory (redundant edges from overlapping windows average drift),
followed by a cameras-fixed point-only refinement seeded with the
halo-averaged landmarks.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bundleadjustment_tpu.geometry import np_se3
from bundleadjustment_tpu.parallel.posegraph import PoseGraph, solve_pose_graph
from bundleadjustment_tpu.solvers import BAProblem, LMConfig
from bundleadjustment_tpu.solvers.lm import ba_solve

WINDOW_AXIS = "window"


def make_windows(n, window=10, stride=5):
    """Overlapping index windows covering range(n).  Always >= 1 window."""
    if n <= window:
        return [list(range(n))]
    out = []
    start = 0
    while True:
        out.append(list(range(start, min(start + window, n))))
        if start + window >= n:
            break
        start += stride
    # pad the last window backward so all windows have equal length
    last = out[-1]
    if len(last) < window:
        out[-1] = list(range(n - window, n))
    return out


@partial(jax.jit, static_argnames=("config",))
def _batched_solve(probs, cams, points, config):
    return jax.vmap(lambda p, c, x: ba_solve(p, c, x, config))(probs, cams, points)


def _halo_segments(pts_opt, gids, n_global):
    """Per-global-landmark (position-sum, count) from window-local solutions.
    gids: [W, Lp] compact global landmark ids, -1 = padding."""
    flat_g = gids.reshape(-1)
    ok = flat_g >= 0
    seg = jnp.where(ok, flat_g, 0)
    flat_p = pts_opt.reshape(-1, 3)
    sums = jax.ops.segment_sum(
        jnp.where(ok[:, None], flat_p, 0.0), seg, num_segments=n_global
    )
    cnts = jax.ops.segment_sum(
        ok.astype(jnp.float32), seg, num_segments=n_global
    )
    return sums, cnts


@partial(jax.jit, static_argnames=("config", "n_global"))
def _batched_solve_halo(probs, cams, points, gids, config, n_global):
    cams_o, pts_o, info = _batched_solve(probs, cams, points, config)
    sums, cnts = _halo_segments(pts_o, gids, n_global)
    return cams_o, pts_o, info, sums, cnts


def make_sharded_halo_fn(config, n_global, mesh):
    """The jittable window-sharded solve + halo exchange (exposed so tests
    can `.lower()` it and assert the compiled collective traffic)."""

    def local(p, c, x, g):
        cams_o, pts_o, info = jax.vmap(
            lambda pp, cc, xx: ba_solve(pp, cc, xx, config)
        )(p, c, x)
        sums, cnts = _halo_segments(pts_o, g, n_global)
        sums = jax.lax.psum(sums, WINDOW_AXIS)
        cnts = jax.lax.psum(cnts, WINDOW_AXIS)
        return cams_o, pts_o, info, sums, cnts

    spec = P(WINDOW_AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, P(), P()),
        # the LM scan's carry mixes sharded state with unvarying scalars
        # (lambda/nu/done start as literals); the varying-axis checker
        # rejects that even though the math is device-local — skip it
        check_vma=False,
    )


def _sharded_solve_halo(probs, cams, points, gids, config, n_global, mesh):
    """Window-axis sharded solve (shard_map over `mesh`) + landmark halo
    exchange.  Each device solves W/D windows locally; the psum of the halo
    segments is the ONLY collective — traffic ∝ distinct landmarks, not
    observations."""
    fn = make_sharded_halo_fn(config, n_global, mesh)
    spec = P(WINDOW_AXIS)
    if len({d.process_index for d in mesh.devices.flat}) > 1:
        # multi-process mesh: place each input explicitly (every process
        # holds the same host-global value; device_put keeps only the
        # addressable shards)
        from jax.sharding import NamedSharding

        ns = NamedSharding(mesh, spec)
        put = lambda a: jax.device_put(np.asarray(a), ns)
        probs, cams, points, gids = jax.tree.map(
            put, (probs, cams, points, gids)
        )
    return jax.jit(fn)(probs, cams, points, gids)


def windowed_global_ba(scene_map, window=10, stride=5,
                       config=None, pg_iters=15, mesh=None):
    """Full-map refinement via batched window BA + pose-graph stitch.

    Mutates the scene map: keyframe poses and landmark positions are updated
    in place.  Returns an info dict.

    mesh: optional 1-D `jax.sharding.Mesh` with axis "window" — shards the
    window axis across devices (windows padded to a multiple of the mesh
    size with inert all-fixed dummies).  Results match the single-device
    vmap path (see tests/test_windows.py parity test).
    """
    if config is None:
        config = LMConfig(max_iters=8, solver="dense")
    kfs = [int(k) for k in scene_map.active_keyframes()]
    K = len(kfs)
    if K < 3:
        return {"windows": 0}

    windows = make_windows(K, window, stride)
    snaps = [
        scene_map.snapshot_problem([kfs[i] for i in w], min_obs=2)
        for w in windows
    ]

    # pad all windows to common shapes
    Kp = max(s.extr.shape[0] for s in snaps)
    Lp = max(s.points.shape[0] for s in snaps)
    Np = max(s.cam_idx.shape[0] for s in snaps)
    W = len(snaps)

    def pad2(a, n, fill=0):
        out = np.full((n,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    cam_idx = np.stack([pad2(s.cam_idx, Np) for s in snaps])
    pt_idx = np.stack([pad2(s.pt_idx, Np) for s in snaps])
    uv = np.stack([pad2(s.uv, Np) for s in snaps])
    sig = np.stack([pad2(s.sigma2, Np, 1) for s in snaps])
    valid = np.stack([pad2(s.valid, Np, False) for s in snaps])
    cam_fixed = np.stack([pad2(s.cam_fixed, Kp, True) for s in snaps])
    extr = np.stack([pad2(s.extr, Kp) for s in snaps])
    points = np.stack([pad2(s.points, Lp) for s in snaps])

    # compact global landmark ids for the halo exchange: windows overlap, so
    # a landmark may be solved by several windows; gid[w, l] indexes the
    # union of all windows' landmarks (-1 = padding slot)
    all_pt_ids = np.unique(np.concatenate([s.pt_ids for s in snaps]))
    id_to_gid = {int(p): g for g, p in enumerate(all_pt_ids)}
    n_global = len(all_pt_ids)
    gids = np.full((W, Lp), -1, np.int32)
    for wi, s in enumerate(snaps):
        gids[wi, : len(s.pt_ids)] = [id_to_gid[int(p)] for p in s.pt_ids]

    # pad the window axis to a multiple of the mesh size with inert dummy
    # windows (all cameras fixed, no valid observations, no landmarks)
    W_solve = W
    if mesh is not None:
        D = mesh.devices.size
        W_solve = ((W + D - 1) // D) * D
        pad_w = W_solve - W
        if pad_w:
            def padw(a, fill=None):
                extra = np.zeros((pad_w,) + a.shape[1:], a.dtype)
                if fill is not None:
                    extra[:] = fill
                return np.concatenate([a, extra])

            cam_idx = padw(cam_idx)
            pt_idx = padw(pt_idx)
            uv = padw(uv)
            sig = padw(sig, 1)
            valid = padw(valid, False)
            cam_fixed = padw(cam_fixed, True)
            extr = padw(extr)
            points = padw(points)
            gids = padw(gids, -1)

    K4 = np.broadcast_to(np.asarray(scene_map.K4), (W_solve, 4)).copy()
    probs = BAProblem(
        K4=jnp.asarray(K4),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv),
        sigma2=jnp.asarray(sig),
        valid=jnp.asarray(valid),
        cam_fixed=jnp.asarray(cam_fixed),
        pt_fixed=jnp.zeros((W_solve, Lp), bool),
    )
    if mesh is None:
        cams_opt, pts_opt, info, halo_sum, halo_cnt = _batched_solve_halo(
            probs, jnp.asarray(extr), jnp.asarray(points),
            jnp.asarray(gids), config, n_global,
        )
    else:
        cams_opt, pts_opt, info, halo_sum, halo_cnt = _sharded_solve_halo(
            probs, jnp.asarray(extr), jnp.asarray(points),
            jnp.asarray(gids), config, n_global, mesh,
        )
    def _fetch(x):
        """Host-global numpy view of a possibly cross-process-sharded array."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    cams_opt = _fetch(cams_opt)[:W]
    pts_opt = _fetch(pts_opt)[:W]
    halo_sum = _fetch(halo_sum)
    halo_cnt = _fetch(halo_cnt)
    info = {k: _fetch(v)[:W] for k, v in info.items()}

    # halo-averaged landmark positions -> map (each shared landmark gets the
    # mean of its windows' solutions; the cameras-fixed refinement below
    # polishes from this consensus initialization)
    has = halo_cnt > 0
    avg = halo_sum[has] / halo_cnt[has, None]
    scene_map.pt_pos[all_pt_ids[has]] = avg.astype(np.float32)

    # pose graph: edges between consecutive kfs of each window from the
    # window-local solutions (relative poses are gauge-invariant)
    ei, ej, rels, ws = [], [], [], []
    for wi, w in enumerate(windows):
        n_real = len(w)
        for a in range(n_real - 1):
            Ti = cams_opt[wi, a].astype(np.float64)
            Tj = cams_opt[wi, a + 1].astype(np.float64)
            rels.append(np_se3.rt6_compose(Ti, np_se3.rt6_inverse(Tj)))
            ei.append(w[a])
            ej.append(w[a + 1])
            ws.append(1.0)
    fixed = np.zeros(K, bool)
    fixed[0] = True
    graph = PoseGraph(
        edge_i=jnp.asarray(np.asarray(ei, np.int32)),
        edge_j=jnp.asarray(np.asarray(ej, np.int32)),
        rel=jnp.asarray(np.asarray(rels, np.float32)),
        weight=jnp.asarray(np.asarray(ws, np.float32)),
        valid=jnp.ones(len(ei), bool),
        node_fixed=jnp.asarray(fixed),
    )
    poses0 = scene_map.kf_pose[kfs].astype(np.float32)
    poses_glob, pg_info = solve_pose_graph(graph, jnp.asarray(poses0),
                                           max_iters=pg_iters)
    poses_glob = np.asarray(poses_glob, np.float64)
    for i, kf in enumerate(kfs):
        scene_map.set_pose(kf, poses_glob[i])

    # cameras-fixed point refinement on the stitched trajectory
    snap = scene_map.snapshot_problem(kfs, min_obs=2)
    prob = BAProblem(
        K4=jnp.asarray(snap.K4),
        cam_idx=jnp.asarray(snap.cam_idx),
        pt_idx=jnp.asarray(snap.pt_idx),
        uv=jnp.asarray(snap.uv),
        sigma2=jnp.asarray(snap.sigma2),
        valid=jnp.asarray(snap.valid),
        cam_fixed=jnp.ones(snap.extr.shape[0], bool),
        pt_fixed=jnp.zeros(snap.points.shape[0], bool),
    )
    _, pts_ref, _ = ba_solve(
        prob, jnp.asarray(snap.extr), jnp.asarray(snap.points),
        LMConfig(max_iters=5, solver="dense"),
    )
    scene_map.writeback(snap, snap.extr, np.asarray(pts_ref))

    return {
        "windows": W,
        "window_cost0": np.asarray(info["cost0"]).tolist(),
        "window_cost": np.asarray(info["cost"]).tolist(),
        "pg_cost0": float(pg_info["cost0"]),
        "pg_cost": float(pg_info["cost"]),
    }
