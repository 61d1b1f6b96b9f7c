"""Profile the dense-layout LM solve on the current device (scratch tool).

Measures full-solve wall time and marginal per-LM-iteration / per-PCG-iter
costs via scan-length differencing (single-dispatch timings are polluted by
the ~25 ms relay latency of the tunneled TPU).
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
from bundleadjustment_tpu.solvers.dense_ba import densify_problem, dense_ba_solve
from bundleadjustment_tpu.solvers.lm import LMConfig

N_CAMS, N_PTS, OBS, MAX_OBS, PCG = 64, 10_000, 8, 16, 50

sc = make_synthetic_scene(n_cams=N_CAMS, n_pts=N_PTS, obs_per_pt=OBS,
                          pixel_noise=0.5, seed=0)
cam_fixed = np.zeros(N_CAMS, bool); cam_fixed[0] = True
prob, _ = densify_problem(sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2,
                          sc.valid, cam_fixed, N_PTS, max_obs=MAX_OBS)
cam_rt6 = jnp.asarray(sc.extr_init)
points = jnp.asarray(sc.points_init)


def solve(cfg):
    c, p, info = dense_ba_solve(prob, cam_rt6, points, cfg)
    return info["cost"]


def t_solve(cfg, n=6):
    fn = partial(solve, cfg)
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n * 1e3


print("device:", jax.devices()[0])
for name, cfg in [
    ("10 LM it, pcg f32", LMConfig(max_iters=10, solver="pcg", pcg_iters=PCG)),
    ("10 LM it, pcg bf16", LMConfig(max_iters=10, solver="pcg", pcg_iters=PCG,
                                    mxu_bf16=True)),
    ("10 LM it, exact dense", LMConfig(max_iters=10, solver="dense")),
]:
    dt = t_solve(cfg, n=5)
    print(f"{name:28s} {dt:8.2f} ms   final cost {float(solve(cfg)):.2f}")

print("\n-- marginal cost (scan-length differencing) --")
for tag, mk in [
    ("pcg f32", lambda it, pcg: LMConfig(max_iters=it, solver="pcg", pcg_iters=pcg)),
    ("pcg bf16", lambda it, pcg: LMConfig(max_iters=it, solver="pcg",
                                          pcg_iters=pcg, mxu_bf16=True)),
    ("exact", lambda it, pcg: LMConfig(max_iters=it, solver="dense")),
]:
    t2 = t_solve(mk(2, 50)); t12 = t_solve(mk(12, 50))
    per_iter = (t12 - t2) / 10
    t12_p10 = t_solve(mk(12, 10))
    per_pcg = (t12 - t12_p10) / (12 * 40)
    build = per_iter - 50 * per_pcg
    if tag == "exact":
        print(f"{tag}: per-LM-iter {per_iter:.2f} ms")
    else:
        print(f"{tag}: per-LM-iter {per_iter:.2f} ms | per-PCG-iter "
              f"{per_pcg*1e3:.1f} us | build+rhs+cost {build:.2f} ms")
