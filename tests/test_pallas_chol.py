"""Correctness of the experimental Pallas blocked Cholesky solve
(interpret mode; compiled-TPU accuracy was verified on hardware — see the
module docstring for the measured perf verdict that keeps it unwired)."""

import numpy as np
import jax.numpy as jnp

from bundleadjustment_tpu.solvers.pallas_chol import pallas_chol_solve


def test_pallas_chol_solve_matches_numpy():
    rng = np.random.default_rng(0)
    for N in (48, 128, 384):
        A = rng.standard_normal((N, N)).astype(np.float32)
        S = A @ A.T + N * np.eye(N, dtype=np.float32)
        b = rng.standard_normal(N).astype(np.float32)
        x = pallas_chol_solve(jnp.asarray(S), jnp.asarray(b), interpret=True)
        xr = np.linalg.solve(S.astype(np.float64), b)
        rel = np.abs(np.asarray(x) - xr).max() / np.abs(xr).max()
        assert rel < 1e-5, (N, rel)
