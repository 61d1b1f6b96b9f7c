import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bundleadjustment_tpu.geometry import (
    aa_to_rotmat,
    rotmat_to_aa,
    rt6_apply,
    rt6_compose,
    rt6_from_mat44,
    rt6_inverse,
    rt6_to_mat44,
    skew,
)


def random_rt6(rng, n=None, max_angle=np.pi * 0.95):
    shape = (n, 3) if n else (3,)
    axis = rng.normal(size=shape)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(0, max_angle, size=shape[:-1] + (1,))
    t = rng.normal(size=shape)
    return np.concatenate([axis * angle, t], axis=-1).astype(np.float32)


def test_skew():
    w = jnp.array([1.0, 2.0, 3.0])
    x = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(skew(w) @ x, jnp.cross(w, x), atol=1e-6)


def test_aa_roundtrip(rng):
    rt = random_rt6(rng, 64)
    R = aa_to_rotmat(rt[:, :3])
    # orthonormality
    eye = np.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(np.asarray(R @ np.swapaxes(R, -1, -2)), eye, atol=1e-5)
    aa = rotmat_to_aa(R)
    np.testing.assert_allclose(np.asarray(aa), rt[:, :3], atol=2e-4)


def test_aa_small_angle():
    r = jnp.array([1e-9, -1e-9, 1e-9])
    R = aa_to_rotmat(r)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    aa = rotmat_to_aa(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(aa), 0.0, atol=1e-7)


def test_aa_near_pi(rng):
    for axis in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, -0.8, 0.0], [0.5, 0.5, -0.70710678]):
        a = np.asarray(axis) / np.linalg.norm(axis)
        r = (a * (np.pi - 1e-4)).astype(np.float32)
        R = aa_to_rotmat(jnp.asarray(r))
        aa = np.asarray(rotmat_to_aa(R))
        R2 = np.asarray(aa_to_rotmat(jnp.asarray(aa)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_compose_inverse(rng):
    a, b = random_rt6(rng, 8), random_rt6(rng, 8)
    x = rng.normal(size=(8, 3)).astype(np.float32)
    ab = rt6_compose(jnp.asarray(a), jnp.asarray(b))
    y1 = rt6_apply(ab, jnp.asarray(x))
    y2 = rt6_apply(jnp.asarray(a), rt6_apply(jnp.asarray(b), jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)

    inv = rt6_inverse(jnp.asarray(a))
    z = rt6_apply(inv, rt6_apply(jnp.asarray(a), jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-4)


def test_mat44_roundtrip(rng):
    a = random_rt6(rng, 8)
    M = rt6_to_mat44(jnp.asarray(a))
    assert M.shape == (8, 4, 4)
    np.testing.assert_allclose(np.asarray(M[:, 3]), np.tile([0, 0, 0, 1], (8, 1)), atol=0)
    back = rt6_from_mat44(M)
    np.testing.assert_allclose(np.asarray(back), a, atol=2e-4)


def test_jit_grad():
    f = jax.jit(lambda r, x: jnp.sum(rt6_apply(r, x) ** 2))
    g = jax.grad(f)(jnp.zeros(6), jnp.ones(3))
    assert np.all(np.isfinite(np.asarray(g)))
