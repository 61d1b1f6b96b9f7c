"""Large-scale BA benchmark: 100k landmarks on one chip (BASELINE config 5's
problem size, single-device; the distributed variant shards the same layout).

bench.py runs this as a timeout-guarded subprocess and merges the JSON line
into its headline record (the marginal MFU at this scale is the
speed-of-light figure — fixed per-iteration costs amortize); it also runs
standalone, with numbers landing in BASELINE.md.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_CAMS = 128
N_PTS = 100_000
OBS_PER_PT = 6
LM_ITERS = 5
PCG_ITERS = 40
MAX_OBS = 8


def main():
    import jax
    import jax.numpy as jnp

    from bundleadjustment_tpu.data.synthetic import make_synthetic_scene
    from bundleadjustment_tpu.solvers import LMConfig
    from bundleadjustment_tpu.solvers.dense_ba import dense_ba_solve, densify_problem

    sc = make_synthetic_scene(
        n_cams=N_CAMS, n_pts=N_PTS, obs_per_pt=OBS_PER_PT, pixel_noise=0.5, seed=0
    )
    cam_fixed = np.zeros(N_CAMS, bool)
    cam_fixed[0] = True
    dense, dropped = densify_problem(
        sc.K4, sc.cam_idx, sc.pt_idx, sc.uv, sc.sigma2, sc.valid, cam_fixed,
        N_PTS, max_obs=MAX_OBS,
    )
    n_obs = int(np.asarray(dense.valid).sum())
    cfg = LMConfig(max_iters=LM_ITERS, solver="dense")  # exact DENSE_SCHUR

    def run():
        cams, pts, info = dense_ba_solve(
            dense, jnp.asarray(sc.extr_init), jnp.asarray(sc.points_init), cfg
        )
        jax.device_get((cams, pts))  # one batched completion fetch
        return info

    info = run()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    from bundleadjustment_tpu.utils.flops import FLOP_MODEL_VERSION, roofline

    iters_s = LM_ITERS / best
    roof = roofline(iters_s, N_CAMS, N_PTS, MAX_OBS, jax.devices()[0],
                    solver="dense")

    # marginal per-iteration device time: least-squares slope of wall time
    # vs scan length (4 counts x 3 repeats; see utils/marginal.py — the
    # round-3 two-point differencing was noise-dominated and inflated the
    # marginal 3x)
    from bundleadjustment_tpu.utils.marginal import measure_marginal

    def _t(it):
        cfg_it = LMConfig(max_iters=it, solver="dense")

        def run_it():
            cams, pts, _ = dense_ba_solve(
                dense, jnp.asarray(sc.extr_init),
                jnp.asarray(sc.points_init), cfg_it
            )
            jax.device_get((cams, pts))

        run_it()  # compile + warm (jit cache makes this cheap after 1st)
        t0 = time.perf_counter()
        run_it()
        return time.perf_counter() - t0

    fit = measure_marginal(_t, iter_counts=(5, 15, 40), repeats=3)
    marginal_iter_s = fit["iters_per_s"]
    roof_marginal = roofline(marginal_iter_s, N_CAMS, N_PTS, MAX_OBS,
                             jax.devices()[0], solver="dense")
    print(
        json.dumps(
            {
                "metric": "ba_iterations_per_s_100k",
                "value": round(iters_s, 3),
                "unit": "iter/s",
                "device": str(jax.devices()[0]),
                "n_cams": N_CAMS,
                "n_landmarks": N_PTS,
                "n_obs": n_obs,
                "solver": "exact_dense_schur",
                "cost_reduction": round(
                    float(info["cost0"]) / max(float(info["cost"]), 1e-12), 1
                ),
                "flop_model_version": FLOP_MODEL_VERSION,
                "flops_per_iter": roof["flops_per_iter"],
                "achieved_tflops": round(roof["achieved_tflops"], 3),
                "mfu": round(roof["mfu"], 4) if roof["mfu"] else None,
                "arith_intensity": round(roof["arith_intensity"], 1),
                "dominant_term": roof["dominant_term"],
                "marginal_iter_per_s": round(marginal_iter_s, 2),
                "marginal_mfu": (
                    round(roof_marginal["mfu"], 4)
                    if roof_marginal["mfu"] else None
                ),
                "marginal_tflops": round(roof_marginal["achieved_tflops"], 3),
                "marginal_ms_per_iter": round(fit["slope_s"] * 1e3, 4),
                "marginal_ms_stderr": round(fit["slope_stderr_s"] * 1e3, 4),
                "marginal_fit_points": [
                    [it, round(t, 5)] for it, t in fit["points"]],
            }
        )
    )


if __name__ == "__main__":
    main()
