"""Typed yaml settings -> rig / tracker configuration.

TPU-native replacement for the reference's Settings reader (reference:
src/Settings.cc — `File.version: "1.0"` yaml with Camera1..Camera4
intrinsics, rig extrinsics `IMU.T_b_c1/c3/c4`, IMU noise, ORB params;
the legacy parser lives in Tracking::Parse*ParamFile, Tracking.cc:606-1286).

Supports the same key families with a flat schema; see
`example_settings()` for the expected layout.
"""

from __future__ import annotations

import numpy as np
import yaml

import jax.numpy as jnp

from ..frontend.extractor import OrbConfig
from ..geometry import cameras
from ..imu import preintegration as pre_mod
from ..optim.reprojection import RigParams


def _cam_params(node: dict) -> np.ndarray:
    p = np.zeros(8, np.float32)
    p[0] = node["fx"]
    p[1] = node["fy"]
    p[2] = node["cx"]
    p[3] = node["cy"]
    for i, k in enumerate(["k0", "k1", "k2", "k3"]):
        p[4 + i] = node.get(k, 0.0)
    return p


def _T(node) -> np.ndarray:
    """4x4 from a nested list / flat 16-list."""
    arr = np.asarray(node, np.float64).reshape(4, 4)
    return arr


def load_settings(path_or_dict):
    """Parse settings; returns dict with rig, orb config, imu noise, misc.

    Camera model: `Camera.type` in {"PinHole", "KannalaBrandt8"}.
    Extrinsics: per camera `CameraN.T_b_c` (body-from-camera 4x4).
    """
    if isinstance(path_or_dict, dict):
        cfg = path_or_dict
    else:
        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)

    cam_type = cfg.get("Camera", {}).get("type", "PinHole")
    kind = cameras.PINHOLE if cam_type == "PinHole" else cameras.KB8

    params, R_cb, t_cb, dist = [], [], [], []
    for i in range(1, 9):
        key = f"Camera{i}"
        if key not in cfg:
            break
        node = cfg[key]
        params.append(_cam_params(node))
        if kind == cameras.PINHOLE:
            # radtan distortion of a distorted-pinhole camera (reference:
            # the k1/k2/p1/p2 keys of e.g. EuRoC.yaml handled via
            # cv::undistortPoints in Frame::UndistortKeyPoints)
            dist.append(np.asarray(
                [node.get("k1", 0.0), node.get("k2", 0.0),
                 node.get("p1", 0.0), node.get("p2", 0.0)], np.float32))
        T_bc = _T(node.get("T_b_c", np.eye(4)))
        # stored as camera-from-body
        R = T_bc[:3, :3].T
        t = -R @ T_bc[:3, 3]
        R_cb.append(R.astype(np.float32))
        t_cb.append(t.astype(np.float32))
    if not params:
        raise ValueError("settings define no Camera1")
    dist_arr = (np.stack(dist) if dist and any(d.any() for d in dist)
                else None)

    rig = RigParams(kind=kind,
                    params=jnp.asarray(np.stack(params)),
                    R_cb=jnp.asarray(np.stack(R_cb)),
                    t_cb=jnp.asarray(np.stack(t_cb)))

    orb_node = cfg.get("ORBextractor", {})
    orb = OrbConfig(
        n_features=int(orb_node.get("nFeatures", 512)),
        n_levels=int(orb_node.get("nLevels", 8)),
        scale=float(orb_node.get("scaleFactor", 1.2)),
        th_high=float(orb_node.get("iniThFAST", 15)),
        th_low=float(orb_node.get("minThFAST", 7)),
    )

    noise = None
    if "IMU" in cfg:
        imu = cfg["IMU"]
        noise = pre_mod.ImuNoise.from_sigmas(
            imu.get("NoiseGyro", 1.7e-4), imu.get("NoiseAcc", 2e-3),
            imu.get("GyroWalk", 1.9e-5), imu.get("AccWalk", 3e-3),
            imu.get("Frequency", 200.0))

    return {
        "rig": rig,
        "dist": dist_arr,
        "orb": orb,
        "imu_noise": noise,
        "imu_frequency": cfg.get("IMU", {}).get("Frequency", 200.0),
        "camera_width": int(cfg.get("Camera", {}).get("width", 640)),
        "camera_height": int(cfg.get("Camera", {}).get("height", 480)),
        "camera_fps": float(cfg.get("Camera", {}).get("fps", 30.0)),
        "raw": cfg,
    }


def example_settings(n_cams: int = 1) -> dict:
    base = {
        "File": {"version": "1.0"},
        "Camera": {"type": "PinHole", "width": 640, "height": 480,
                   "fps": 30.0},
        "ORBextractor": {"nFeatures": 512, "nLevels": 8,
                         "scaleFactor": 1.2, "iniThFAST": 15,
                         "minThFAST": 7},
        "IMU": {"NoiseGyro": 1.7e-4, "NoiseAcc": 2e-3,
                "GyroWalk": 1.9e-5, "AccWalk": 3e-3, "Frequency": 200.0},
    }
    for i in range(1, n_cams + 1):
        base[f"Camera{i}"] = {
            "fx": 458.0, "fy": 457.0, "cx": 367.0, "cy": 248.0,
            "T_b_c": np.eye(4).tolist(),
        }
    return base
