"""Distributed bundle adjustment over a device mesh.

The reference has no distributed anything (SURVEY.md §2.3: 3 threads +
mutexes); this is the new capability the TPU build adds per BASELINE.json's
north star: map optimization sharded over a `jax.sharding.Mesh` with XLA
collectives over ICI.

Scheme (data-parallel BA): observations are sharded across the mesh axis,
keyframe/landmark state is replicated; each device assembles the normal-
equation contributions of its observation shard; one `psum` reduces the
Schur system; the (small, dense) reduced camera solve is computed
redundantly on every device. This parallelizes the dominant cost —
residual/Jacobian evaluation and Hessian assembly — with a single collective
per LM iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..optim import ba


def make_mesh(devices=None, axis: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pad_obs(obs: ba.BAObservations, n_dev: int):
    o = obs.kf.shape[0]
    pad = (-o) % n_dev
    if pad == 0:
        return obs
    def padd(x, val=0):
        w = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w, constant_values=val)
    return ba.BAObservations(
        kf=padd(obs.kf), mp=padd(obs.mp), cam=padd(obs.cam),
        uv=padd(obs.uv), sigma2=padd(obs.sigma2, 1),
        valid=padd(obs.valid, False))


def distributed_bundle_adjust(mesh: Mesh, state: ba.BAState,
                              obs: ba.BAObservations, rig,
                              pose_fixed, point_fixed=None,
                              edges=None, prior=None, prior_idx: int = 0,
                              stages=(5, 10), axis: str = "obs"):
    """Run window BA with observations sharded across `mesh`.

    Returns (state, obs_inlier (original length), chi).
    """
    n_dev = mesh.devices.size
    o_orig = obs.kf.shape[0]
    obs_p = _pad_obs(obs, n_dev)

    obs_spec = ba.BAObservations(
        kf=P(axis), mp=P(axis), cam=P(axis), uv=P(axis),
        sigma2=P(axis), valid=P(axis))

    rep = P()

    def run(state, obs_shard, pose_fixed, point_fixed, edges, prior):
        st, inl, chi = ba.bundle_adjust(
            state, obs_shard, rig, pose_fixed, point_fixed=point_fixed,
            edges=edges, prior=prior, prior_idx=prior_idx,
            stages=stages, psum_axis=axis)
        return st, inl, chi

    state_spec = jax.tree.map(lambda _: rep, state)
    edges_spec = None if edges is None else jax.tree.map(lambda _: rep,
                                                         edges)
    prior_spec = None if prior is None else jax.tree.map(lambda _: rep,
                                                         prior)
    fn = shard_map(
        run, mesh=mesh,
        in_specs=(state_spec, obs_spec, rep,
                  rep if point_fixed is not None else None,
                  edges_spec, prior_spec),
        out_specs=(state_spec, P(axis), rep))
    st, inl, chi = fn(state, obs_p, pose_fixed, point_fixed, edges, prior)
    return st, inl[:o_orig], chi


def distributed_global_ba(mesh: Mesh, state: ba.BAState,
                          obs: ba.BAObservations, rig,
                          pose_fixed, point_fixed=None,
                          edges=None, prior=None, prior_idx: int = 0,
                          stages=(5, 10), cg_iters: int = 24,
                          axis: str = "obs"):
    """Atlas-scale global BA sharded over the mesh (the BASELINE.json
    north-star workload: distributed Schur reduction over ICI).

    Observations are sharded; keyframe/landmark state is replicated. Each
    device evaluates residual/Jacobian terms and gather/scatter matvec
    passes for its observation shard; one psum per CG matvec reduces a
    [K, D] vector over ICI (see optim/global_ba.py). The reduced solve
    itself (PCG iterations) is replicated arithmetic on identical psummed
    operands, so all devices walk the same trajectory deterministically.

    Returns (state, obs_inlier (original length), chi).
    """
    from ..optim import global_ba

    n_dev = mesh.devices.size
    o_orig = obs.kf.shape[0]
    obs_p = _pad_obs(obs, n_dev)

    obs_spec = ba.BAObservations(
        kf=P(axis), mp=P(axis), cam=P(axis), uv=P(axis),
        sigma2=P(axis), valid=P(axis))
    rep = P()

    def run(state, obs_shard, pose_fixed, point_fixed, edges, prior):
        return global_ba.global_bundle_adjust(
            state, obs_shard, rig, pose_fixed, point_fixed=point_fixed,
            edges=edges, prior=prior, prior_idx=prior_idx,
            stages=stages, cg_iters=cg_iters, psum_axis=axis)

    state_spec = jax.tree.map(lambda _: rep, state)
    edges_spec = None if edges is None else jax.tree.map(lambda _: rep,
                                                         edges)
    prior_spec = None if prior is None else jax.tree.map(lambda _: rep,
                                                         prior)
    fn = shard_map(
        run, mesh=mesh,
        in_specs=(state_spec, obs_spec, rep,
                  rep if point_fixed is not None else None,
                  edges_spec, prior_spec),
        out_specs=(state_spec, P(axis), rep))
    st, inl, chi = fn(state, obs_p, pose_fixed, point_fixed, edges, prior)
    return st, inl[:o_orig], chi
