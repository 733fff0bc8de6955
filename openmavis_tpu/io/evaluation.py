"""Trajectory evaluation: Horn alignment + ATE RMSE (with/without scale).

Reimplements the reference's evaluation pipeline
(reference: evaluation/evaluate_ate_scale.py:49-99 `align`, 141-165 metric
reporting; evaluation/associate.py timestamp matching) as a library module so
the framework can self-evaluate after a run.
"""

from __future__ import annotations

import numpy as np


def load_ground_truth(path: str):
    """Load a ground-truth trajectory: TUM format (`t x y z qx qy qz qw`,
    seconds) or EuRoC state-estimate csv (ns timestamps, comma-separated).
    Returns (t [N] seconds, p [N,3])."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.replace(",", " ").split()[:4]])
    arr = np.asarray(rows)
    t = arr[:, 0]
    if len(t) and t.max() > 1e14:       # ns timestamps (EuRoC csv)
        t = t / 1e9
    return t, arr[:, 1:4]


def associate(t_est: np.ndarray, t_gt: np.ndarray,
              max_dt: float = 0.02):
    """Nearest-timestamp association (reference: evaluation/associate.py).

    Returns (idx_est, idx_gt) index arrays of matched pairs.
    """
    i = np.searchsorted(t_gt, t_est)
    i = np.clip(i, 1, len(t_gt) - 1)
    left = np.abs(t_gt[i - 1] - t_est)
    right = np.abs(t_gt[i] - t_est)
    idx_gt = np.where(left < right, i - 1, i)
    dt = np.abs(t_gt[idx_gt] - t_est)
    keep = dt < max_dt
    return np.nonzero(keep)[0], idx_gt[keep]


def horn_align(est: np.ndarray, gt: np.ndarray, with_scale: bool = True):
    """Closed-form alignment gt ~ s R est + t (Horn / Umeyama).

    est, gt: [N, 3]. Returns (s, R [3,3], t [3]).
    (reference: evaluate_ate_scale.py:49-99 — SVD-based with optional scale)
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    e = est - mu_e
    g = gt - mu_g
    W = g.T @ e / len(est)
    U, d, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_e = (e ** 2).sum() / len(est)
        s = float((d * np.diag(S)).sum() / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(t_est, p_est, t_gt, p_gt, with_scale: bool = True,
             max_dt: float = 0.02):
    """Absolute trajectory error RMSE after association + Horn alignment.

    Returns dict(rmse, rmse_noscale, scale, n_pairs).
    """
    ie, ig = associate(np.asarray(t_est), np.asarray(t_gt), max_dt)
    if len(ie) < 3:
        return {"rmse": np.inf, "rmse_noscale": np.inf, "scale": 0.0,
                "n_pairs": len(ie)}
    e = np.asarray(p_est)[ie]
    g = np.asarray(p_gt)[ig]
    out = {}
    for name, ws in (("rmse", True), ("rmse_noscale", False)):
        s, R, t = horn_align(e, g, with_scale=ws)
        err = (s * (R @ e.T).T + t) - g
        out[name] = float(np.sqrt((err ** 2).sum(axis=1).mean()))
        if ws:
            out["scale"] = s
    out["n_pairs"] = len(ie)
    return out
