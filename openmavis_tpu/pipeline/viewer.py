"""Headless map/frame visualization (the Viewer thread analog).

TPU-native stand-in for the reference's Pangolin GL viewer (reference:
src/Viewer.cc:Run GL loop; src/MapDrawer.cc — map points, keyframe frusta,
covisibility graph; src/FrameDrawer.cc — tracked keypoints over the current
image). Headless deployments render the same content to PNG frames with a
small numpy rasterizer — no GL, no display, suitable for CI artifacts and
offline inspection; the per-frame state mirrors FrameDrawer::Update.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..slam_map import map_state as ms

# sRGB colors matching the reference viewer's palette
_BG = np.array([255, 255, 255], np.uint8)
_MP = np.array([0, 0, 0], np.uint8)          # map points: black
_MP_LOCAL = np.array([255, 0, 0], np.uint8)  # recent landmarks: red
_KF = np.array([0, 0, 255], np.uint8)        # keyframes: blue
_GRAPH = np.array([0, 200, 0], np.uint8)     # covisibility: green
_CUR = np.array([0, 180, 0], np.uint8)       # current camera: green
_FEAT = np.array([0, 255, 0], np.uint8)      # tracked keypoints


def _scatter(canvas, xy, color, size=1):
    H, W, _ = canvas.shape
    x = np.round(xy[:, 0]).astype(np.int64)
    y = np.round(xy[:, 1]).astype(np.int64)
    for dy in range(-size + 1, size):
        for dx in range(-size + 1, size):
            xi = np.clip(x + dx, 0, W - 1)
            yi = np.clip(y + dy, 0, H - 1)
            ok = (x + dx >= 0) & (x + dx < W) & (y + dy >= 0) & (y + dy < H)
            canvas[yi[ok], xi[ok]] = color
    return canvas


def _lines(canvas, p0, p1, color, n_samples=48):
    """Draw line segments by dense sampling (vectorized over segments)."""
    if len(p0) == 0:
        return canvas
    ts = np.linspace(0.0, 1.0, n_samples)[None, :, None]
    pts = p0[:, None, :] * (1 - ts) + p1[:, None, :] * ts
    return _scatter(canvas, pts.reshape(-1, 2), color)


@dataclass
class MapView:
    """Top-down (x-z by default) orthographic view of the map."""
    width: int = 800
    height: int = 800
    axes: tuple = (0, 2)      # world axes mapped to (right, down)
    margin: float = 0.1

    def _fit(self, pts):
        a, b = self.axes
        xy = np.stack([pts[:, a], pts[:, b]], axis=-1)
        lo = xy.min(axis=0)
        hi = xy.max(axis=0)
        span = np.maximum(hi - lo, 1e-6)
        pad = self.margin * span
        lo, hi = lo - pad, hi + pad
        scale = min((self.width - 1) / (hi[0] - lo[0]),
                    (self.height - 1) / (hi[1] - lo[1]))
        return lo, scale

    def _to_px(self, pts, lo, scale):
        a, b = self.axes
        xy = np.stack([pts[:, a], pts[:, b]], axis=-1)
        return (xy - lo) * scale


def draw_map(m: ms.MapState, view: MapView = MapView(),
             covis_threshold: int = 30, trajectory=None,
             recent_kf: int | None = None) -> np.ndarray:
    """Render the map to an RGB image (MapDrawer::DrawMapPoints +
    DrawKeyFrames + covisibility graph, reference: src/MapDrawer.cc).

    Args:
      trajectory: optional [T, 3] world positions drawn as a polyline.
      recent_kf: landmarks first seen at/after this KF drawn in red
        (the reference's 'reference map points' coloring).
    Returns [H, W, 3] uint8.
    """
    canvas = np.full((view.height, view.width, 3), _BG, np.uint8)
    mp_valid = np.asarray(m.mp_valid)
    kf_valid = np.asarray(m.kf_valid)
    pts = np.asarray(m.mp_pos)[mp_valid]
    kfs = np.asarray(m.kf_t)[kf_valid]
    anchors = [p for p in (pts, kfs) if len(p)]
    if trajectory is not None and len(trajectory):
        anchors.append(np.asarray(trajectory))
    if not anchors:
        return canvas
    lo, scale = view._fit(np.concatenate(anchors, axis=0))

    if len(pts):
        if recent_kf is not None:
            first = np.asarray(m.mp_first_kf)[mp_valid]
            old = first < recent_kf
            canvas = _scatter(canvas, view._to_px(pts[old], lo, scale), _MP)
            canvas = _scatter(canvas, view._to_px(pts[~old], lo, scale),
                              _MP_LOCAL)
        else:
            canvas = _scatter(canvas, view._to_px(pts, lo, scale), _MP)

    # covisibility graph edges (green) between keyframe centers
    if len(kfs) >= 2:
        cov = np.asarray(ms.covisibility_matrix(m))
        ids = np.nonzero(kf_valid)[0]
        sub = cov[np.ix_(ids, ids)]
        ii, jj = np.nonzero(np.triu(sub, 1) >= covis_threshold)
        if len(ii):
            p_all = np.asarray(m.kf_t)[ids]
            canvas = _lines(canvas, view._to_px(p_all[ii], lo, scale),
                            view._to_px(p_all[jj], lo, scale), _GRAPH)

    if trajectory is not None and len(trajectory) >= 2:
        tr = np.asarray(trajectory)
        canvas = _lines(canvas, view._to_px(tr[:-1], lo, scale),
                        view._to_px(tr[1:], lo, scale), _CUR)

    if len(kfs):
        canvas = _scatter(canvas, view._to_px(kfs, lo, scale), _KF, size=2)
    return canvas


def draw_frame(img: np.ndarray, xy: np.ndarray, tracked: np.ndarray,
               state_text: str = "") -> np.ndarray:
    """Overlay tracked keypoints on a grayscale frame
    (FrameDrawer::DrawFrame, reference: src/FrameDrawer.cc — tracked
    points as green squares). Returns [H, W, 3] uint8."""
    g = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    canvas = np.stack([g, g, g], axis=-1)
    sel = np.asarray(tracked)
    pts = np.asarray(xy)[sel]
    if len(pts):
        canvas = _scatter(canvas, pts, _FEAT, size=2)
    return canvas


def save_png(path: str, arr: np.ndarray):
    from PIL import Image
    Image.fromarray(arr).save(path)


class Viewer:
    """Offline viewer: renders map + frame PNGs per update.

    The reference's Viewer thread polls shared state at ~30 Hz
    (src/Viewer.cc:Run); here every `every` keyframes one snapshot is
    rendered to `out_dir` — a pull becomes a push, no thread."""

    def __init__(self, out_dir: str, every: int = 1,
                 view: MapView = MapView()):
        self.out_dir = out_dir
        self.every = every
        self.view = view
        self.n_updates = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self, m: ms.MapState, img=None, xy=None, tracked=None,
               trajectory=None):
        i = self.n_updates
        self.n_updates += 1
        if i % self.every:
            return
        save_png(os.path.join(self.out_dir, f"map_{i:06d}.png"),
                 draw_map(m, self.view, trajectory=trajectory))
        if img is not None and xy is not None:
            save_png(os.path.join(self.out_dir, f"frame_{i:06d}.png"),
                     draw_frame(img, xy, tracked))
