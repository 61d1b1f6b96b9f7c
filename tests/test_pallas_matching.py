"""Pallas fused Hamming top-2 kernel vs the XLA reference path.

Runs in interpret mode on CPU (the TPU lowering is exercised by bench/TPU
runs; interpret mode validates the kernel's logic and memory plan)."""

import numpy as np
import jax.numpy as jnp

from bundleadjustment_tpu.ops.matching import hamming_distance_matrix
from bundleadjustment_tpu.ops.pallas_matching import hamming_top2_pallas


def _ref_top2(d):
    order = np.argsort(d, axis=1)
    best = d[np.arange(len(d)), order[:, 0]]
    second = d[np.arange(len(d)), order[:, 1]]
    return best, second, order[:, 0]


def test_kernel_matches_reference(rng):
    m1, m2, w = 64, 1200, 8
    q = rng.integers(0, 2**32, (m1, w), dtype=np.uint32)
    t = rng.integers(0, 2**32, (m2, w), dtype=np.uint32)
    valid = np.ones(m2, np.int32)
    best, second, idx = hamming_top2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(valid), interpret=True
    )
    d = np.asarray(hamming_distance_matrix(jnp.asarray(q), jnp.asarray(t)))
    rb, rs, ri = _ref_top2(d)
    np.testing.assert_array_equal(np.asarray(best), rb)
    np.testing.assert_array_equal(np.asarray(second), rs)
    # argmin ties may differ between tiles; distances at idx must equal best
    np.testing.assert_array_equal(d[np.arange(m1), np.asarray(idx)], rb)


def test_kernel_handles_invalid_train(rng):
    m1, m2, w = 16, 512, 8
    q = rng.integers(0, 2**32, (m1, w), dtype=np.uint32)
    t = np.tile(q[0], (m2, 1))  # every train row identical to query 0
    valid = np.zeros(m2, np.int32)
    valid[7] = 1  # only one valid candidate
    best, second, idx = hamming_top2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(valid), interpret=True
    )
    assert int(idx[0]) == 7
    assert float(best[0]) == 0.0
    assert np.isinf(float(second[0]))  # no second valid candidate


def test_kernel_multiple_tiles_exact_match(rng):
    """Matches must be found across tile boundaries."""
    m1, w = 8, 8
    m2 = 3 * 512
    t = rng.integers(0, 2**32, (m2, w), dtype=np.uint32)
    # plant exact matches in tiles 0, 1, 2
    targets = [3, 512 + 100, 2 * 512 + 511]
    q = np.stack([t[targets[i % 3]] for i in range(m1)])
    best, second, idx = hamming_top2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(np.ones(m2, np.int32)),
        interpret=True,
    )
    for i in range(m1):
        assert float(best[i]) == 0.0
        assert int(idx[i]) == targets[i % 3] or float(best[i]) == 0.0
