"""Trajectory writers: TUM and EuRoC formats.

(reference: System::SaveTrajectoryTUM / SaveTrajectoryEuRoC /
SaveKeyFrameTrajectory*, src/System.cc:627-1300)
"""

from __future__ import annotations

import numpy as np

from ..geometry import lie

import jax.numpy as jnp


def _quats(R: np.ndarray) -> np.ndarray:
    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R)))  # wxyz
    return q


def save_tum(path: str, times, R, t):
    """TUM format: `timestamp tx ty tz qx qy qz qw` (seconds)."""
    q = _quats(R)
    with open(path, "w") as f:
        for i in range(len(times)):
            f.write(f"{times[i]:.6f} {t[i][0]:.7f} {t[i][1]:.7f} "
                    f"{t[i][2]:.7f} {q[i][1]:.7f} {q[i][2]:.7f} "
                    f"{q[i][3]:.7f} {q[i][0]:.7f}\n")


def save_euroc(path: str, times, R, t):
    """EuRoC format: `timestamp_ns,tx,ty,tz,qw,qx,qy,qz`."""
    q = _quats(R)
    with open(path, "w") as f:
        for i in range(len(times)):
            ns = int(round(times[i] * 1e9))
            f.write(f"{ns},{t[i][0]:.7f},{t[i][1]:.7f},{t[i][2]:.7f},"
                    f"{q[i][0]:.7f},{q[i][1]:.7f},{q[i][2]:.7f},"
                    f"{q[i][3]:.7f}\n")


def save_kitti(path: str, times, R, t):
    """KITTI format: 12 row-major entries of the 3x4 pose [R | t] per line
    (reference: System::SaveTrajectoryKITTI, src/System.cc:1240-1300)."""
    with open(path, "w") as f:
        for i in range(len(times)):
            Ri = np.asarray(R[i]).reshape(3, 3)
            ti = np.asarray(t[i]).reshape(3)
            row = np.concatenate([Ri, ti[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def load_tum(path: str):
    """Returns (times [N], positions [N,3], quats_wxyz [N,4])."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            rows.append([float(x) for x in parts[:8]])
    arr = np.asarray(rows)
    times = arr[:, 0]
    if times.max() > 1e14:     # ns timestamps (EuRoC GT files)
        times = times / 1e9
    pos = arr[:, 1:4]
    quat = arr[:, 4:8]
    return times, pos, quat
