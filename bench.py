"""Headline benchmark: global-BA LM iterations/s per chip.

Builds a synthetic global bundle-adjustment problem at BASELINE.json
config-4 scale (~10k landmarks, Schur-PCG camera-reduced solve), times the
jitted LM solve on the default device (the TPU under the driver), and
compares against the identical computation on the host CPU backend — the
hardware class the reference's Ceres solver runs on (4 threads,
`ba_project/src/ba/Optimizer.cpp:88`).

Prints ONE JSON line:
  {"metric": "ba_iterations_per_s", "value": N, "unit": "iter/s",
   "vs_baseline": tpu_over_cpu_speedup, ...extras}
"""

from __future__ import annotations

import json
import time

import numpy as np


N_CAMS = 64
N_PTS = 10_000
OBS_PER_PT = 8
LM_ITERS = 10
PCG_ITERS = 50


def build_problem():
    import jax.numpy as jnp

    from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
    from bundleadjustment_tpu.solvers import BAProblem

    sc = make_synthetic_scene(
        n_cams=N_CAMS, n_pts=N_PTS, obs_per_pt=OBS_PER_PT,
        pixel_noise=0.5, seed=0,
    )
    cam_fixed = np.zeros(N_CAMS, bool)
    cam_fixed[0] = True
    arrays = dict(
        K4=sc.K4,
        cam_idx=sc.cam_idx,
        pt_idx=sc.pt_idx,
        uv=sc.uv,
        sigma2=sc.sigma2,
        valid=sc.valid,
        cam_fixed=cam_fixed,
        pt_fixed=np.zeros(N_PTS, bool),
    )
    return sc, arrays


def time_solve(device, sc, arrays, repeats=3):
    import jax
    import jax.numpy as jnp

    from bundleadjustment_tpu.solvers import BAProblem, LMConfig
    from bundleadjustment_tpu.solvers import lm as lm_mod

    put = lambda x: jax.device_put(jnp.asarray(x), device)
    prob = BAProblem(**{k: put(v) for k, v in arrays.items()})
    cams0 = put(sc.extr_init)
    pts0 = put(sc.points_init)
    config = LMConfig(max_iters=LM_ITERS, solver="pcg", pcg_iters=PCG_ITERS)

    def run():
        cams, pts, info = lm_mod.ba_solve(prob, cams0, pts0, config)
        # device->host fetch: forces completion even where block_until_ready
        # is unreliable (experimental platforms); ~120 KB, negligible vs solve
        np.asarray(cams)
        np.asarray(pts)
        return info

    info = run()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return LM_ITERS / best, float(info["cost0"]), float(info["cost"])


def main():
    import jax

    sc, arrays = build_problem()

    default_dev = jax.devices()[0]
    iters_dev, cost0, cost = time_solve(default_dev, sc, arrays)

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and cpu != default_dev:
        iters_cpu, _, _ = time_solve(cpu, sc, arrays, repeats=1)
    else:
        iters_cpu = iters_dev

    n_obs = int(arrays["valid"].sum())
    print(
        json.dumps(
            {
                "metric": "ba_iterations_per_s",
                "value": round(iters_dev, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_dev / max(iters_cpu, 1e-9), 3),
                "device": str(default_dev),
                "n_cams": N_CAMS,
                "n_landmarks": N_PTS,
                "n_obs": n_obs,
                "pcg_iters": PCG_ITERS,
                "cpu_iters_per_s": round(iters_cpu, 3),
                "cost_reduction": round(cost0 / max(cost, 1e-12), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
