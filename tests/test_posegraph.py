import numpy as np
import jax.numpy as jnp

from bundleadjustment_tpu.geometry import np_se3
from bundleadjustment_tpu.parallel.posegraph import (
    PoseGraph,
    build_odometry_graph,
    solve_pose_graph,
)


def make_loop_trajectory(rng, K=20, drift=0.02):
    """GT poses on a circle; noisy odometry accumulates drift; one loop edge."""
    gt = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        rvec = np.array([0.0, 0.0, ang])
        center = np.array([np.cos(ang), np.sin(ang), 0.0])
        R = np_se3.aa_to_R(rvec)
        gt.append(np.concatenate([rvec, -R @ center]))
    gt = np.asarray(gt)

    # noisy odometry measurements (relative i -> i+1)
    rels = []
    for i in range(K - 1):
        rel = np_se3.rt6_compose(gt[i], np_se3.rt6_inverse(gt[i + 1]))
        rel[:3] += rng.normal(0, drift, 3)
        rel[3:] += rng.normal(0, drift, 3)
        rels.append(rel)

    # integrate noisy odometry -> drifted initial poses
    poses = [gt[0]]
    for i in range(K - 1):
        poses.append(np_se3.rt6_compose(np_se3.rt6_inverse(rels[i]), poses[i]))
    poses = np.asarray(poses)
    return gt, poses, rels


def test_pose_graph_closes_loop(rng):
    gt, drifted, rels = make_loop_trajectory(rng, K=20, drift=0.02)
    # exact loop closure between last and first node
    loop_rel = np_se3.rt6_compose(gt[-1], np_se3.rt6_inverse(gt[0]))
    loop = [(19, 0, loop_rel, 50.0)]

    ei = list(range(19)) + [19]
    ej = list(range(1, 20)) + [0]
    rel = np.stack(rels + [loop_rel])
    w = np.array([1.0] * 19 + [50.0], np.float32)
    fixed = np.zeros(20, bool)
    fixed[0] = True
    graph = PoseGraph(
        edge_i=jnp.asarray(np.asarray(ei, np.int32)),
        edge_j=jnp.asarray(np.asarray(ej, np.int32)),
        rel=jnp.asarray(rel.astype(np.float32)),
        weight=jnp.asarray(w),
        valid=jnp.ones(20, bool),
        node_fixed=jnp.asarray(fixed),
    )
    poses_opt, info = solve_pose_graph(graph, jnp.asarray(drifted.astype(np.float32)))
    poses_opt = np.asarray(poses_opt)

    # drifted end pose is far from GT; optimized is much closer
    def centers(poses):
        return np.stack([np_se3.rt6_inverse(p)[3:] for p in poses])

    err_before = np.linalg.norm(centers(drifted) - centers(gt), axis=1)
    err_after = np.linalg.norm(centers(poses_opt) - centers(gt), axis=1)
    assert float(info["cost"]) < float(info["cost0"]) * 0.2
    assert err_after.max() < err_before.max() * 0.6
    assert err_after.mean() < 0.1


def test_build_odometry_graph_consistent(rng):
    gt, drifted, _ = make_loop_trajectory(rng, K=8, drift=0.0)
    graph = build_odometry_graph(gt)
    # residuals of a graph built FROM the poses evaluate to ~0 at those poses
    poses_opt, info = solve_pose_graph(graph, jnp.asarray(gt.astype(np.float32)),
                                       max_iters=2)
    assert float(info["cost0"]) < 1e-8
    np.testing.assert_allclose(np.asarray(poses_opt), gt, atol=1e-4)
