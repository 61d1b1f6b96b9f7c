"""Frontend speed-of-light profiling at fr1 geometry (VERDICT r1 #3).

Times `detect_and_describe` at 640x480 / 1000 features / 8 levels on the
default device, then breaks the per-frame device time down by stage and by
pyramid level (separately-jitted stage closures; marginal wall-time over
repeats).  Prints one JSON line per measurement.

Matches the reference's per-frame SURF hot loop
(`ba_project/src/ba/FeatureProcessor.cpp:213-241`).
"""

from __future__ import annotations

import json
import time

import numpy as np


W, H = 640, 480
CFG_KW = dict(n_features=1000, n_levels=8)
REPEATS = 5


def _time(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from bundleadjustment_tpu.data.synthetic import render_layered_scene
    from bundleadjustment_tpu.ops import features as F

    cfg = F.FeatureConfig(**CFG_KW)
    frames, _ = render_layered_scene(n_frames=1, width=W, height=H,
                                     fx=525.0, fy=525.0, seed=7)
    img = jnp.asarray(frames[0]["gray"])
    dev = str(jax.devices()[0])

    full = _time(jax.jit(lambda im: F.detect_and_describe(im, cfg)), img)
    print(json.dumps({"metric": "frontend_full_ms", "value": round(full * 1e3, 2),
                      "unit": "ms/frame", "device": dev, "geometry": f"{W}x{H}x{cfg.n_levels}L"}),
          flush=True)

    # stage breakdown at level 0 (the largest level dominates)
    stages = {
        "harris": jax.jit(lambda im: F.harris_response(im, cfg.harris_k)[0]),
        "fast": jax.jit(lambda im: F.fast_corners(im, cfg.fast_threshold)),
        "nms+topk": jax.jit(
            lambda im: jax.lax.top_k(
                jnp.where(F._nms3(F.harris_response(im, cfg.harris_k)[0]),
                          F.harris_response(im, cfg.harris_k)[0],
                          -jnp.inf).reshape(-1),
                212,
            )
        ),
        "blur": jax.jit(lambda im: F.gaussian_blur(im)),
    }
    for name, fn in stages.items():
        t = _time(fn, img)
        print(json.dumps({"metric": f"frontend_stage_{name}_ms_l0",
                          "value": round(t * 1e3, 2)}), flush=True)

    # orientation + descriptor at level-0 keypoint count
    allocs = F._level_allocations(cfg)
    ys = jnp.asarray(np.random.default_rng(0).integers(16, H - 16, allocs[0]))
    xs = jnp.asarray(np.random.default_rng(1).integers(16, W - 16, allocs[0]))
    blur = F.gaussian_blur(img)
    t_ori = _time(jax.jit(F.orientation_angles), blur, ys, xs)
    ang = F.orientation_angles(blur, ys, xs)
    t_desc = _time(jax.jit(F.brief_descriptors), blur, ys, xs, ang)
    print(json.dumps({"metric": "frontend_stage_orientation_ms_l0",
                      "value": round(t_ori * 1e3, 2)}), flush=True)
    print(json.dumps({"metric": "frontend_stage_brief_ms_l0",
                      "value": round(t_desc * 1e3, 2)}), flush=True)

    # per-level full detection time (separately jitted -> includes dispatch;
    # the marginal column is the honest per-level device cost)
    lvl_ms = []
    for lvl in range(cfg.n_levels):
        scale = cfg.scale_factor**lvl
        h_l = max(int(round(H / scale)), 2 * cfg.border + 8)
        w_l = max(int(round(W / scale)), 2 * cfg.border + 8)
        img_l = jax.image.resize(img, (h_l, w_l), "linear")
        fn = jax.jit(lambda im, n=allocs[lvl]: F._detect_level(im, n, cfg))
        lvl_ms.append(round(_time(fn, img_l) * 1e3, 2))
    print(json.dumps({"metric": "frontend_per_level_ms", "value": lvl_ms}),
          flush=True)


if __name__ == "__main__":
    main()
