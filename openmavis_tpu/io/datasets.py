"""Dataset loaders: EuRoC / TUM-VI directory layouts (+ synthetic).

(reference: the per-dataset loaders in Examples/*/*.cc — e.g.
Examples/Multi-Inertial/multi_inertial_euroc.cc:49-215 loads N camera image
lists + per-camera timestamps + an IMU csv.)

Image decoding prefers the native C++ prefetching loader
(openmavis_tpu.io.native_loader) and falls back to PIL.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass

import numpy as np


@dataclass
class Sequence:
    """A time-indexed multi-camera + IMU sequence."""
    cam_dirs: list          # per camera: directory with image files
    cam_files: list         # per camera: sorted filenames
    cam_times: np.ndarray   # [T] seconds (common timeline, cam0)
    imu: np.ndarray         # [N, 7]: t, wx, wy, wz, ax, ay, az
    _loader: object = None

    @property
    def n_frames(self):
        return len(self.cam_times)

    @property
    def n_cams(self):
        return len(self.cam_dirs)

    def frame(self, i: int) -> np.ndarray:
        """[C, H, W] float32 grayscale images of frame i."""
        imgs = []
        for c in range(self.n_cams):
            path = os.path.join(self.cam_dirs[c], self.cam_files[c][i])
            imgs.append(load_gray(path, self._loader))
        return np.stack(imgs)

    def imu_between(self, t0: float, t1: float) -> np.ndarray:
        sel = (self.imu[:, 0] > t0) & (self.imu[:, 0] <= t1)
        return self.imu[sel]


def load_gray(path: str, loader=None) -> np.ndarray:
    """Decode one image to [H, W] float32 (native loader if available)."""
    if loader is not None:
        img = loader.decode(path)
        if img is not None:
            return img
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.float32)


def _read_euroc_csv(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append(line.split(","))
    return rows


def load_euroc(root: str, cams=("cam0",), imu: str = "imu0",
               use_native: bool = True) -> Sequence:
    """Load an EuRoC-format sequence directory.

    Layout: <root>/mav0/{cam0,cam1,...}/data/*.png + data.csv,
            <root>/mav0/imu0/data.csv (ns timestamps).
    """
    mav = os.path.join(root, "mav0")
    if not os.path.isdir(mav):
        mav = root
    cam_dirs, cam_files, times0 = [], [], None
    for c in cams:
        d = os.path.join(mav, c, "data")
        rows = _read_euroc_csv(os.path.join(mav, c, "data.csv"))
        files = [r[1].strip() for r in rows]
        ts = np.asarray([int(r[0]) for r in rows], np.int64) / 1e9
        cam_dirs.append(d)
        cam_files.append(files)
        if times0 is None:
            times0 = ts
    imu_rows = _read_euroc_csv(os.path.join(mav, imu, "data.csv"))
    imu_arr = np.asarray(
        [[int(r[0]) / 1e9] + [float(x) for x in r[1:7]]
         for r in imu_rows], np.float64)

    loader = None
    if use_native:
        try:
            from . import native_loader
            loader = native_loader.NativeDecoder()
        except Exception:
            loader = None
    return Sequence(cam_dirs=cam_dirs, cam_files=cam_files,
                    cam_times=times0, imu=imu_arr, _loader=loader)


def load_tumvi(root: str, cams=("cam0",), imu: str = "imu0",
               use_native: bool = True) -> Sequence:
    """Load a TUM-VI sequence (same mav0 layout as EuRoC).

    (reference: Examples/Monocular-Inertial/mono_inertial_tum_vi.cc — the
    TUM-VI release ships EuRoC-format directories: mav0/cam0/data + csv,
    mav0/imu0/data.csv with ns timestamps; only the calibration — 512x512
    fisheye KannalaBrandt8 — differs, which lives in the yaml settings.)
    """
    return load_euroc(root, cams=cams, imu=imu, use_native=use_native)


def load_kitti(root: str, cams=("image_0",),
               use_native: bool = True) -> Sequence:
    """Load a KITTI odometry sequence directory.

    Layout: <root>/times.txt (seconds, one per line) and
    <root>/image_0/000000.png ... (image_1 = right grayscale camera).
    (reference: Examples/Stereo/stereo_kitti.cc LoadImages — times.txt +
    zero-padded 6-digit frame files; KITTI has no IMU in the odometry
    benchmark, so `imu` is empty.)
    """
    with open(os.path.join(root, "times.txt")) as f:
        times = np.asarray([float(line) for line in f if line.strip()],
                           np.float64)
    cam_dirs, cam_files = [], []
    for c in cams:
        d = os.path.join(root, c)
        files = sorted(fn for fn in os.listdir(d)
                       if fn.endswith((".png", ".jpg", ".pgm")))
        if len(files) < len(times):
            raise ValueError(
                f"{d}: {len(files)} images < {len(times)} timestamps")
        cam_dirs.append(d)
        cam_files.append(files[:len(times)])
    loader = None
    if use_native:
        try:
            from . import native_loader
            loader = native_loader.NativeDecoder()
        except Exception:
            loader = None
    return Sequence(cam_dirs=cam_dirs, cam_files=cam_files,
                    cam_times=times, imu=np.zeros((0, 7), np.float64),
                    _loader=loader)
