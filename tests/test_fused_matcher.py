import numpy as np
import jax.numpy as jnp

from bundleadjustment_tpu.ops.matching import (
    match_descriptors,
    match_descriptors_fused,
)


def test_fused_matches_xla_path(rng):
    """Fused (Pallas, interpret mode) == XLA reference matcher."""
    m1, m2, w = 80, 700, 8
    a = rng.integers(0, 2**32, (m1, w), dtype=np.uint32)
    perm = rng.permutation(m1)
    b = np.concatenate([a[perm], rng.integers(0, 2**32, (m2 - m1, w), dtype=np.uint32)])
    # flip a few bits so matches aren't exact
    flip = rng.integers(0, 2**8, (m1, w)).astype(np.uint32)
    b[:m1] ^= flip
    va = np.ones(m1, bool)
    va[5] = False
    vb = np.ones(m2, bool)
    vb[perm[7]] = False

    idx_ref, dist_ref = match_descriptors(
        jnp.asarray(a), jnp.asarray(b), valid_a=jnp.asarray(va),
        valid_b=jnp.asarray(vb), metric="hamming", ratio=0.8, max_dist=64.0,
    )
    idx_fused, dist_fused = match_descriptors_fused(
        jnp.asarray(a), jnp.asarray(b), valid_a=jnp.asarray(va),
        valid_b=jnp.asarray(vb), ratio=0.8, max_dist=64.0, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(idx_fused), np.asarray(idx_ref))
    matched = np.asarray(idx_ref) >= 0
    np.testing.assert_array_equal(
        np.asarray(dist_fused)[matched], np.asarray(dist_ref)[matched]
    )
