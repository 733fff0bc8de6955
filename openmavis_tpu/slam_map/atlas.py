"""Atlas: the multi-map container with map spawning and merging.

TPU-native replacement for the reference's Atlas (reference: src/Atlas.cc —
set of Maps + current map; CreateNewMap on tracking loss Atlas.h:57;
abandoned maps re-joined by merge detection LoopClosing::MergeLocal/
MergeLocal2 src/LoopClosing.cc:1381/1956).

Maps are fixed-capacity MapState slabs; merging transforms the younger map
through a verified Sim3 and appends its keyframes/landmarks into the older
map's free slots with re-indexed observation ids — one batched scatter, no
pointer surgery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lie
from . import map_state as ms


@dataclass
class Atlas:
    maps: list = field(default_factory=list)   # list[ms.MapState]
    current: int = -1

    def create_map(self, max_kf, max_feat, max_mp) -> int:
        """CreateNewMap equivalent: returns the new map's index."""
        self.maps.append(ms.allocate(max_kf, max_feat, max_mp))
        self.current = len(self.maps) - 1
        return self.current

    @property
    def current_map(self) -> ms.MapState:
        return self.maps[self.current]

    @current_map.setter
    def current_map(self, m):
        self.maps[self.current] = m

    def n_maps(self):
        return len(self.maps)


def transform_map(m: ms.MapState, s, R, t) -> ms.MapState:
    """Apply a world-frame Sim3 (x -> s R x + t) to every pose/landmark."""
    Rn = lie.normalize_rotation(
        jnp.einsum("ij,kjl->kil", R, m.kf_R))
    tn = s * jnp.einsum("ij,kj->ki", R, m.kf_t) + t
    vn = s * jnp.einsum("ij,kj->ki", R, m.kf_v)
    pn = s * jnp.einsum("ij,mj->mi", R, m.mp_pos) + t
    return m._replace(kf_R=Rn, kf_t=tn, kf_v=vn, mp_pos=pn)


def merge_maps(dst: ms.MapState, src: ms.MapState, s, R, t):
    """Weld `src` into `dst`: src is moved by the Sim3 (dst <- s R src + t)
    and its keyframes/landmarks appended into dst's free capacity.

    (reference: LoopClosing::MergeLocal migrates KFs/MPs between maps,
    src/LoopClosing.cc:1381; here it is one re-indexed concatenation.)
    Returns (merged MapState, ok) — ok False if capacity is insufficient.
    """
    src_t = transform_map(src, s, R, t)
    K, F = dst.kf_obs.shape
    M = dst.mp_pos.shape[0]
    n_kf_d = int(dst.n_kf)
    n_kf_s = int(src.n_kf)
    n_mp_d = int(dst.n_mp)
    n_mp_s = int(src.n_mp)
    if n_kf_d + n_kf_s > K or n_mp_d + n_mp_s > M:
        return dst, False

    kf_off = n_kf_d
    mp_off = n_mp_d
    ks = jnp.arange(n_kf_s)
    md = jnp.arange(n_mp_s)

    # re-index src observations into dst landmark ids
    src_obs = src_t.kf_obs[:n_kf_s]
    src_obs = jnp.where(src_obs >= 0, src_obs + mp_off, -1)

    out = dst._replace(
        kf_R=dst.kf_R.at[kf_off:kf_off + n_kf_s].set(src_t.kf_R[:n_kf_s]),
        kf_t=dst.kf_t.at[kf_off:kf_off + n_kf_s].set(src_t.kf_t[:n_kf_s]),
        kf_v=dst.kf_v.at[kf_off:kf_off + n_kf_s].set(src_t.kf_v[:n_kf_s]),
        kf_bg=dst.kf_bg.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_bg[:n_kf_s]),
        kf_ba=dst.kf_ba.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_ba[:n_kf_s]),
        kf_time=dst.kf_time.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_time[:n_kf_s]),
        kf_valid=dst.kf_valid.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_valid[:n_kf_s]),
        kf_xy=dst.kf_xy.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_xy[:n_kf_s]),
        kf_desc=dst.kf_desc.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_desc[:n_kf_s]),
        kf_level=dst.kf_level.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_level[:n_kf_s]),
        kf_sigma2=dst.kf_sigma2.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_sigma2[:n_kf_s]),
        kf_cam=dst.kf_cam.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_cam[:n_kf_s]),
        kf_feat_valid=dst.kf_feat_valid.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_feat_valid[:n_kf_s]),
        kf_obs=dst.kf_obs.at[kf_off:kf_off + n_kf_s].set(src_obs),
        kf_bow=dst.kf_bow.at[kf_off:kf_off + n_kf_s].set(
            src_t.kf_bow[:n_kf_s]),
        mp_pos=dst.mp_pos.at[mp_off:mp_off + n_mp_s].set(
            src_t.mp_pos[:n_mp_s]),
        mp_desc=dst.mp_desc.at[mp_off:mp_off + n_mp_s].set(
            src_t.mp_desc[:n_mp_s]),
        mp_normal=dst.mp_normal.at[mp_off:mp_off + n_mp_s].set(
            src_t.mp_normal[:n_mp_s]),
        mp_dmin=dst.mp_dmin.at[mp_off:mp_off + n_mp_s].set(
            s * src_t.mp_dmin[:n_mp_s]),
        mp_dmax=dst.mp_dmax.at[mp_off:mp_off + n_mp_s].set(
            s * src_t.mp_dmax[:n_mp_s]),
        mp_valid=dst.mp_valid.at[mp_off:mp_off + n_mp_s].set(
            src_t.mp_valid[:n_mp_s]),
        mp_first_kf=dst.mp_first_kf.at[mp_off:mp_off + n_mp_s].set(
            src_t.mp_first_kf[:n_mp_s] + kf_off),
        mp_last_kf=dst.mp_last_kf.at[mp_off:mp_off + n_mp_s].set(
            src_t.mp_last_kf[:n_mp_s] + kf_off),
        n_kf=jnp.asarray(n_kf_d + n_kf_s, jnp.int32),
        n_mp=jnp.asarray(n_mp_d + n_mp_s, jnp.int32),
    )
    # carry src's persistent loop edges across (slots shift by kf_off),
    # then record the weld itself as a permanent merge edge (reference:
    # mspMergeEdges, KeyFrame.h:216-243)
    for li, lj, lv in zip(np.asarray(src.loop_i), np.asarray(src.loop_j),
                          np.asarray(src.loop_valid)):
        if lv and li >= 0 and lj >= 0:
            out = ms.add_loop_edge(out, int(li) + kf_off,
                                   int(lj) + kf_off)
    return out, True
