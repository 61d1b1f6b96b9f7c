import numpy as np
import pytest

from bundleadjustment_tpu.mapstate import SceneMap


@pytest.fixture
def small_map():
    return SceneMap(max_frames=32, max_points=256, max_kp=64, K4=[525, 525, 319.5, 239.5])


def add_simple_frame(m, ts, n_kp=10, pose=None):
    pose = np.zeros(6) if pose is None else pose
    xy = np.random.default_rng(int(ts * 100)).uniform(0, 100, (n_kp, 2)).astype(np.float32)
    octv = np.zeros(n_kp, np.int32)
    sig = np.ones(n_kp, np.float32)
    desc = np.arange(n_kp * 8, dtype=np.uint32).reshape(n_kp, 8)
    return m.add_frame(ts, pose, xy, octv, sig, desc)


def test_add_frame_and_point(small_map):
    m = small_map
    kf = add_simple_frame(m, 0.0)
    assert kf == 0
    assert m.kf_active[0] == 1
    pt = m.add_point([1.0, 2.0, 3.0], first_kf=kf)
    np.testing.assert_allclose(m.pt_pos[pt], [1, 2, 3])
    assert m.add_observation(pt, kf, 3) == 1
    assert m.kp_pt[kf, 3] == pt
    assert m.point_obs_count(pt) == 1
    # double-add is a no-op
    assert m.add_observation(pt, kf, 3) == 0
    # occupied slot refuses
    pt2 = m.add_point([0, 0, 1.0])
    assert m.add_observation(pt2, kf, 3) == -2


def test_erase_point_detaches(small_map):
    m = small_map
    kf1 = add_simple_frame(m, 0.0)
    kf2 = add_simple_frame(m, 1.0)
    pt = m.add_point([0, 0, 5.0], first_kf=kf1)
    m.add_observation(pt, kf1, 0)
    m.add_observation(pt, kf2, 1)
    m.erase_point(pt)
    assert m.kp_pt[kf1, 0] == -1
    assert m.kp_pt[kf2, 1] == -1
    assert m.pt_active[pt] == 0


def test_fuse_points(small_map):
    m = small_map
    kf1 = add_simple_frame(m, 0.0)
    kf2 = add_simple_frame(m, 1.0)
    kf3 = add_simple_frame(m, 2.0)
    a = m.add_point([0, 0, 5.0])
    b = m.add_point([0, 0, 5.1])
    m.add_observation(a, kf1, 0)
    m.add_observation(a, kf2, 0)
    m.add_observation(b, kf2, 1)  # kf2 sees both -> conflicting obs dropped
    m.add_observation(b, kf3, 0)
    m.fuse_points(a, b)
    assert m.pt_active[b] == 0
    assert m.kp_pt[kf3, 0] == a  # transferred
    assert m.kp_pt[kf2, 1] == -1  # dropped (kf2 already observes a)
    assert m.point_obs_count(a) == 3


def test_erase_frame_detaches(small_map):
    m = small_map
    kf1 = add_simple_frame(m, 0.0)
    kf2 = add_simple_frame(m, 1.0)
    pt = m.add_point([0, 0, 5.0])
    m.add_observation(pt, kf1, 0)
    m.add_observation(pt, kf2, 0)
    m.erase_frame(kf2)
    assert m.point_obs_count(pt) == 1
    assert m.kf_active[kf2] == 0


def test_covisibility(small_map):
    m = small_map
    kfs = [add_simple_frame(m, float(i), n_kp=30) for i in range(3)]
    for kf in kfs:
        m.set_keyframe(kf)
    # 12 shared points between kf0 and kf1; 3 between kf0 and kf2
    for i in range(12):
        pt = m.add_point([i, 0, 5.0])
        m.add_observation(pt, kfs[0], i)
        m.add_observation(pt, kfs[1], i)
    for i in range(3):
        pt = m.add_point([i, 1, 5.0])
        m.add_observation(pt, kfs[0], 20 + i)
        m.add_observation(pt, kfs[2], 20 + i)
    m.update_covisibility(kfs[0], threshold=10)
    nbrs, w = m.best_covisible(kfs[0], 5)
    # kf1 passes the threshold; kf2 (weight 3) is below and not max -> excluded
    assert nbrs.tolist() == [kfs[1]]
    assert w.tolist() == [12]
    # max-weight neighbor always kept even below threshold
    m.update_covisibility(kfs[2], threshold=10)
    nbrs2, w2 = m.best_covisible(kfs[2], 5)
    assert nbrs2.tolist() == [kfs[0]]
    assert w2.tolist() == [3]


def test_cull_recent_points(small_map):
    m = small_map
    kfs = [add_simple_frame(m, float(i)) for i in range(6)]
    for kf in kfs:
        m.set_keyframe(kf)
    # point born at kf0 with only 1 obs -> culled when current=2
    weak = m.add_point([0, 0, 5.0], first_kf=0)
    m.add_observation(weak, kfs[0], 0)
    # strong point with 3 obs survives
    strong = m.add_point([1, 0, 5.0], first_kf=0)
    for k in range(3):
        m.add_observation(strong, kfs[k], 1)
    erased = m.cull_recent_points(current_kf=2, window=4, min_obs=3)
    assert weak in erased.tolist()
    assert m.pt_active[weak] == 0
    assert m.pt_active[strong] == 1


def test_cull_redundant_keyframes(small_map):
    m = small_map
    kfs = [add_simple_frame(m, float(i), n_kp=20) for i in range(5)]
    for kf in kfs:
        m.set_keyframe(kf)
    # every point of kf4 is seen by kf0..kf3 -> kf4 redundant
    for i in range(20):
        pt = m.add_point([i, 0, 5.0])
        for k in range(5):
            m.add_observation(pt, kfs[k], i)
    erased = m.cull_redundant_keyframes(redundant_frac=0.95, min_other=3, keep_first=4)
    assert erased.tolist() == [kfs[4]]
    assert m.kf_active[kfs[4]] == 0


def test_snapshot_and_writeback(small_map):
    m = small_map
    kfs = [add_simple_frame(m, float(i), n_kp=30) for i in range(3)]
    for kf in kfs:
        m.set_keyframe(kf)
    pts = []
    for i in range(20):
        pt = m.add_point([i * 0.1, 0, 5.0], first_kf=0)
        for k in range(3):
            m.add_observation(pt, kfs[k], i)
        pts.append(pt)
    # one under-observed point must be dropped from the problem
    lonely = m.add_point([9, 9, 9.0])
    m.add_observation(lonely, kfs[0], 25)

    snap = m.snapshot_problem(kfs, min_obs=2)
    assert snap.n_cams == 3
    assert snap.n_pts == 20
    assert lonely not in snap.pt_ids.tolist()
    assert snap.valid.sum() == 60
    # padded shapes are buckets
    assert snap.extr.shape[0] >= 3 and (snap.extr.shape[0] & (snap.extr.shape[0] - 1)) == 0

    # writeback moves poses and points
    new_extr = snap.extr.copy()
    new_extr[1:3, 3] += 0.5
    new_pts = snap.points.copy()
    new_pts[:, 2] += 1.0
    valid = snap.valid.copy()
    valid[0] = False  # mark one obs outlier
    m.writeback(snap, new_extr, new_pts, valid)
    assert m.kf_pose[kfs[1], 3] == pytest.approx(0.5)
    assert m.kf_pose[kfs[0], 3] == pytest.approx(0.0)  # fixed camera untouched
    np.testing.assert_allclose(m.pt_pos[pts][:, 2], 6.0)
    assert m.kp_outlier[kfs[snap.cam_idx[0]], snap.kp_idx[0]] == 1


def test_refresh_point_descriptor(small_map):
    m = small_map
    kfs = [add_simple_frame(m, float(i)) for i in range(3)]
    pt = m.add_point([0, 0, 5.0])
    for k, kp in zip(kfs, [0, 1, 2]):
        m.add_observation(pt, k, kp)
    m.refresh_point_descriptor(pt)
    # representative descriptor is one of the observed descriptors
    descs = [m.kp_desc[k, kp] for k, kp in zip(kfs, [0, 1, 2])]
    assert any(np.array_equal(m.pt_desc[pt], d) for d in descs)


def test_point_obs_counts_batched(small_map):
    m = small_map
    s0 = add_simple_frame(m, 0.0)
    s1 = add_simple_frame(m, 1.0)
    p0 = m.add_point(np.array([0.0, 0.0, 1.0]))
    p1 = m.add_point(np.array([0.0, 1.0, 1.0]))
    m.add_observation(p0, s0, 0)
    m.add_observation(p0, s1, 0)
    m.add_observation(p1, s0, 1)
    counts = m.point_obs_counts(np.array([p0, p1, -1, 999]))
    assert list(counts) == [2, 1, 0, 0]
    # matches the scalar accessor
    assert counts[0] == m.point_obs_count(p0)


def test_point_view_dirs_native_matches_numpy(small_map):
    """Native batched viewing directions == the straightforward numpy
    computation (reference MapPoint::computeViewingDirection semantics)."""
    from bundleadjustment_tpu.geometry import np_se3

    m = small_map
    rng = np.random.default_rng(3)
    kfs = []
    for i in range(4):
        k = add_simple_frame(m, float(i))
        m.set_pose(k, rng.normal(0, 0.3, 6))
        kfs.append(k)
    pts = []
    for j in range(5):
        pt = m.add_point(rng.normal(0, 2, 3).astype(np.float32))
        for k in kfs[: 2 + j % 3]:
            m.add_observation(pt, k, j)
        pts.append(pt)
    got = m.point_view_dirs(pts)
    for i, pt in enumerate(pts):
        obs_kfs, _ = m.point_observations(pt)
        acc = np.zeros(3)
        for kf in obs_kfs:
            center = np_se3.rt6_inverse(m.kf_pose[kf])[3:]
            v = m.pt_pos[pt] - center
            acc += v / np.linalg.norm(v)
        expect = acc / np.linalg.norm(acc)
        np.testing.assert_allclose(got[i], expect, atol=1e-6)
    # invalid ids -> zero vector
    bad = m.point_view_dirs([-1, 10**6])
    np.testing.assert_array_equal(bad, 0.0)


def test_refresh_descriptor_picks_min_median(small_map):
    """The representative descriptor is the min-median-Hamming observation
    (reference MapPoint::computeDescriptor, MapPoint.cpp:202-252)."""
    m = small_map
    kfs = [add_simple_frame(m, float(i)) for i in range(4)]
    pt = m.add_point([0, 0, 5.0])
    # craft descriptors: three near-identical, one far-off; the medoid must
    # be one of the cluster, never the outlier
    base = np.zeros(8, np.uint32)
    descs = [base.copy(), base.copy(), base.copy(), base ^ 0xFFFFFFFF]
    descs[1][0] = 1  # 1 bit off
    descs[2][0] = 3  # 2 bits off
    for k, d in zip(kfs, descs):
        m.kp_desc[k, 0] = d
        m.add_observation(pt, k, 0)
    m.refresh_point_descriptors([pt])
    assert not np.array_equal(m.pt_desc[pt], descs[3])
    # numpy cross-check: medoid by median Hamming
    D = np.asarray(descs)
    x = D[:, None, :] ^ D[None, :, :]
    ham = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
    best = int(np.argmin(np.median(ham, axis=1)))
    assert np.array_equal(m.pt_desc[pt], D[best])


def test_refresh_frame_points_covers_tracked(small_map):
    m = small_map
    k0 = add_simple_frame(m, 0.0)
    k1 = add_simple_frame(m, 1.0)
    p0 = m.add_point([0, 0, 4.0], desc=np.zeros(8, np.uint32))
    m.add_observation(p0, k0, 0)
    m.add_observation(p0, k1, 0)
    # point descriptor starts at zeros; observations carry frame descriptors
    n = m.refresh_frame_points(k1)
    assert n == 1
    descs = [m.kp_desc[k0, 0], m.kp_desc[k1, 0]]
    assert any(np.array_equal(m.pt_desc[p0], d) for d in descs)


def test_point_has_outlier_obs(small_map):
    m = small_map
    k0 = add_simple_frame(m, 0.0)
    k1 = add_simple_frame(m, 1.0)
    p0 = m.add_point([0, 0, 4.0])
    p1 = m.add_point([1, 0, 4.0])
    m.add_observation(p0, k0, 0)
    m.add_observation(p0, k1, 0)
    m.add_observation(p1, k0, 1)
    m.set_outlier(k1, 0, True)
    flags = m.point_has_outlier_obs([p0, p1, -1, 10**6])
    assert list(flags) == [True, False, False, False]


def test_one_observation_per_frame_per_landmark(small_map):
    """A landmark may be observed at most once per frame (the reference's
    obs map is keyed by Frame, src/model/MapPoint.cpp:51-61).  A second
    add_observation of the same landmark at a DIFFERENT keypoint of the
    same frame must be rejected, not double-counted."""
    m = small_map
    kf = add_simple_frame(m, 0.0)
    pt = m.add_point([0, 0, 2.0])
    assert m.add_observation(pt, kf, 0) == 1
    assert m.add_observation(pt, kf, 1) == -3
    assert m.kp_pt[kf, 1] == -1
    assert m.point_obs_count(pt) == 1
    # the same (kf, kp) pair stays idempotent
    assert m.add_observation(pt, kf, 0) == 0
