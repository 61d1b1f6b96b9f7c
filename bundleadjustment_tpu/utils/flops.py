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


def device_peak_flops(device) -> float | None:
    """Peak FLOP/s for a jax device, or None if unknown (e.g. CPU)."""
    kind = getattr(device, "device_kind", "")
    for name, peak in PEAK_FLOPS.items():
        if kind.lower().startswith(name.lower()):
            return peak
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
