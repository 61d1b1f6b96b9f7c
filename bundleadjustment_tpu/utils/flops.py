"""FLOP / byte accounting for the BA solvers — MFU and roofline reporting.

BASELINE.md demands speed-of-light evidence, which requires knowing what
fraction of peak the solve achieves, not just iterations/s.  The counts
below follow the dense component-major engine (`solvers/dense_ba.py`)
term by term; the reference has no analogue (Ceres reports only wall time,
`ba_project/src/ba/Optimizer.cpp:116-125`).

Conventions: 1 multiply-add = 2 FLOPs; K cameras, L landmarks (padded), O
observation slots per landmark.
"""

from __future__ import annotations


# Peak dense-matmul throughput per chip, FLOP/s.  MXU peaks are for the
# native mixed-precision mode (bf16 inputs, f32 accumulate) — fp32 matmuls
# on TPU run at a fraction of this, so MFU computed against the bf16 peak is
# a conservative lower bound.
PEAK_FLOPS = {
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


# Peak HBM bandwidth per chip, bytes/s — the binding roofline for the
# (bandwidth-bound) feature frontend.
PEAK_HBM_BW = {
    "TPU v3": 900e9,
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,  # v5p
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def device_peak_flops(device) -> float | None:
    """Peak FLOP/s for a jax device, or None if unknown (e.g. CPU)."""
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_FLOPS.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def device_peak_bw(device) -> float | None:
    """Peak HBM bandwidth (B/s) for a jax device, or None if unknown."""
    kind = getattr(device, "device_kind", "")
    for name, bw in PEAK_HBM_BW.items():
        if kind.lower().startswith(name.lower()):
            return bw
    return None


# FLOP-model version, reported alongside MFU numbers in bench JSON.  v2
# (round 2): resid_jac 420->440 and the separate 2x cost-eval term removed
# when the engine switched to single-eval LM (trial residuals reused) —
# MFU/roofline figures are NOT comparable with v1 (BENCH_r01) numbers.
FLOP_MODEL_VERSION = 2


def dense_ba_iter_flops(K: int, L: int, O: int, solver: str = "dense",
                        pcg_iters: int = 0) -> dict:
    """FLOPs for ONE LM iteration of `dense_ba_solve` (component-major).

    Returns a breakdown dict with 'total'.  Terms follow dense_ba.py:

    - fused eval (one per iteration): projection, duv_dx, J_phi/Jp
      contractions, robust-cost rho — elementwise over [O, L] (~440
      FLOPs/obs counted from the unrolled component loops).  The trial
      point's REDUCED blocks (red/Vu/g_p/W) come from the SAME pass and are
      carried into the next iteration on acceptance, so there is no
      separate cost evaluation or per-iteration re-assembly;
    - block build: U/g_c one-hot reduce (21 symmetric-unique U rows + 6
      gradient rows = 27), V (6 unique), g_p (6), W (36);
    - schur (exact): G build, Pf one-hot batched matmul, S = QQ^T
      (the dominant term: 2*(6K)^2*(3L)), Cholesky (6K)^3/3, solve;
    - schur (pcg): per-CG-iteration matvec = gather + W-chain + reduce;
    - back-substitution.
    """
    OL = O * L
    br = {}
    br["resid_jac"] = 440 * OL
    # U (21 unique symmetric rows) + g_c (6 rows) via one-hot [K, O*L] matmul
    br["reduce_U"] = 2 * 27 * K * OL
    br["V_gp_W"] = (2 * 6 + 2 * 3 + 36) * OL
    # camera gather of [K,12] pose table
    br["gather_pose"] = 2 * 12 * K * OL
    if solver == "dense":
        br["schur_G"] = 2 * 54 * OL
        br["schur_Pf"] = 2 * 18 * K * OL
        br["schur_QQt"] = 2 * (6 * K) ** 2 * (3 * L)
        br["schur_chol"] = (6 * K) ** 3 // 3
        br["schur_rhs"] = 2 * 6 * K * OL + (2 * 9 + 2 * 18) * OL
    else:
        per_cg = (
            2 * 6 * K * OL  # gather dc
            + (36 + 18 + 36) * 2 * OL  # W chains + V_inv apply
            + 2 * 6 * K * OL  # reduce back
            + 2 * 36 * K  # U x
        )
        br["pcg"] = pcg_iters * per_cg + 2 * 36 * K * K  # + Minv prep
    # back-substitution: gather + W reduce + V_inv apply
    br["backsub"] = 2 * 6 * K * OL + (36 + 18) * 2 * OL
    br["total"] = sum(br.values())
    return br


def dense_ba_iter_bytes(K: int, L: int, O: int, dtype_bytes: int = 4) -> dict:
    """Approximate HBM traffic per LM iteration (reads of the big
    per-observation tensors; small K-sized tables ignored).

    Counts one read per materialized [.., O, L] tensor per consumer pass:
    problem inputs (uv 2, sigma 2, valid ~1, cam_idx 1), residuals (2),
    Jc (12), Jp (6), W (18), G (18), plus the [6K, 3L] Q read twice by the
    QQ^T matmul's operands (XLA reuses tiles; this is the upper bound).
    """
    OL = O * L
    tensors_OL = 2 + 2 + 1 + 1 + 2 + 12 + 6 + 18 + 18
    q = 2 * (6 * K) * (3 * L)
    total = dtype_bytes * (tensors_OL * OL + q)
    return {"total": total, "per_obs_tensors": dtype_bytes * tensors_OL * OL,
            "q_matrix": dtype_bytes * q}


# ---------------------------------------------------------------------------
# feature-frontend model (ops/features.py: detect_and_describe)
# ---------------------------------------------------------------------------


def _frontend_level_dims(H, W, n_levels, scale_factor, border=16):
    """Per-level (h, w) exactly as detect_and_describe computes them."""
    dims = [(H, W)]
    for lvl in range(1, n_levels):
        s = scale_factor ** lvl
        dims.append((max(int(round(H / s)), 2 * border + 8),
                     max(int(round(W / s)), 2 * border + 8)))
    return dims


def _frontend_level_allocs(n_features, n_levels, scale_factor):
    """Per-level keypoint budgets (ops/features.py:_level_allocations)."""
    inv = 1.0 / scale_factor
    weights = [inv ** i for i in range(n_levels)]
    total = sum(weights)
    alloc = [int(n_features * w / total) for w in weights]
    alloc[0] += n_features - sum(alloc)
    return [max(a, 8) for a in alloc]


def frontend_flops(H, W, n_features=1000, n_levels=8, scale_factor=1.2,
                   n_disc=709, n_bits=256) -> dict:
    """FLOPs (+ integer-op and byte estimates) for ONE frame of
    `detect_and_describe` (ops/features.py), term by term.

    Terms follow the shift-add/matmul lowering:

    - resize: two dense matmuls per level>0, [h_l,H]@[H,W] + [h_l,W]@[W,w_l]
      (the MXU work; everything else is VPU elementwise);
    - sobel: 2 gradients x 2 separable passes (2+3 nonzero taps, 2 FLOP/tap);
    - structure tensor: 3 products + 3-channel separable 7-tap blur;
    - harris/shi response arithmetic;
    - fast: 16 circle compares x2 polarities + 2x contiguous-9 shift-AND
      chains (integer ops, counted separately);
    - nms + top-k: 9-neighbor max + ~2 compares/element partial reduction;
    - blur: separable 7-tap over the level image;
    - orientation: [M_l, n_disc] gather + centroid moments (5 FLOP/sample);
    - brief: pattern rotation (8 FLOP/bit), 2 gathers/bit, compare+pack
      (~6 op/bit);
    - subpixel: ~20 FLOP/keypoint.

    Bytes: each full-image pass reads+writes the level plane once; the model
    counts the distinct [h_l, w_l] traversals of the fused graph (XLA fuses
    the elementwise chains, so passes ~ the number of independent
    producer/consumer groups: sobel in, 3ch blur in+out, fast in, nms,
    top-k, blur, resize in/out) — an estimate good to tens of percent,
    stated as such.
    """
    dims = _frontend_level_dims(H, W, n_levels, scale_factor)
    allocs = _frontend_level_allocs(n_features, n_levels, scale_factor)
    br = {"resize_mxu": 0, "sobel": 0, "structure_blur": 0, "response": 0,
          "nms_topk": 0, "blur": 0, "orientation": 0, "brief": 0,
          "subpixel": 0}
    int_ops = 0
    bytes_ = 0
    for lvl, ((h, w), m) in enumerate(zip(dims, allocs)):
        p = h * w
        if lvl > 0:
            br["resize_mxu"] += 2 * h * H * W + 2 * h * W * w
            bytes_ += 4 * (H * W + h * W + h * w)
        br["sobel"] += (4 + 6) * 2 * p  # kd(2 taps)+ks(3 taps), ix and iy
        br["structure_blur"] += 3 * p + 3 * 2 * 7 * 2 * p
        br["response"] += 12 * p
        int_ops += 128 * p  # fast compares + shift-AND chains
        br["nms_topk"] += 10 * p + 2 * p
        br["blur"] += 2 * 7 * 2 * p
        br["orientation"] += m * n_disc * 5
        br["brief"] += m * n_bits * (8 + 6)
        br["subpixel"] += 20 * m
        # ~12 fused full-plane traversals (read+write) per level
        bytes_ += 12 * 2 * 4 * p
        # gathers: orientation disc + brief endpoints
        bytes_ += 4 * m * (n_disc + 2 * n_bits)
    br["total"] = sum(br.values())
    return {**br, "int_ops": int_ops, "bytes": bytes_}


def frontend_roofline(ms_per_frame: float, H, W, device, n_features=1000,
                      n_levels=8, scale_factor=1.2) -> dict:
    """Achieved TFLOP/s, MFU (vs bf16 MXU peak — tiny by construction for a
    VPU/bandwidth-bound frontend; reported for comparability), and HBM
    bandwidth utilization for a measured per-frame time."""
    fl = frontend_flops(H, W, n_features, n_levels, scale_factor)
    t = ms_per_frame / 1e3
    achieved = fl["total"] / t
    peak = device_peak_flops(device)
    bw = device_peak_bw(device)
    return {
        "flops_per_frame": fl["total"],
        "int_ops_per_frame": fl["int_ops"],
        "bytes_per_frame": fl["bytes"],
        "achieved_gflops": achieved / 1e9,
        "mfu": (achieved / peak) if peak else None,
        "achieved_gbps": fl["bytes"] / t / 1e9,
        "bw_util": (fl["bytes"] / t / bw) if bw else None,
        "dominant_term": max(
            ((k, v) for k, v in fl.items()
             if k not in ("total", "int_ops", "bytes")),
            key=lambda kv: kv[1],
        )[0],
    }


def roofline(iter_s: float, K: int, L: int, O: int, device,
             solver: str = "dense", pcg_iters: int = 0) -> dict:
    """Achieved TFLOP/s, MFU vs the chip's bf16 peak, and arithmetic
    intensity for a measured LM-iterations/s figure."""
    fl = dense_ba_iter_flops(K, L, O, solver, pcg_iters)
    by = dense_ba_iter_bytes(K, L, O)
    achieved = fl["total"] * iter_s
    peak = device_peak_flops(device)
    return {
        "flops_per_iter": fl["total"],
        "bytes_per_iter": by["total"],
        "arith_intensity": fl["total"] / max(by["total"], 1),
        "achieved_tflops": achieved / 1e12,
        "mfu": (achieved / peak) if peak else None,
        "peak_tflops": (peak / 1e12) if peak else None,
        "dominant_term": max(
            ((k, v) for k, v in fl.items() if k != "total"),
            key=lambda kv: kv[1],
        )[0],
    }
