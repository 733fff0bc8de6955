"""Generic dense Levenberg-Marquardt driver under `lax.while_loop`.

TPU-native replacement for g2o's OptimizationAlgorithmLevenberg
(reference: Thirdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp,
used by every Optimizer::* entry point, src/Optimizer.cc). The solver state
is a pytree `x`; problems provide
  * assemble(x)  -> (H [D, D], g [D], chi2 scalar)  — normal equations,
  * retract(x, dx [D]) -> x                         — manifold update,
  * chi2(x) -> scalar                               — cost at a candidate,
and the driver runs damped steps with accept/reject lambda control, fully
jit-compatible (fixed iteration budget, no recompiles).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def damped_solve(H: jnp.ndarray, g: jnp.ndarray, lam: jnp.ndarray,
                 eps: float = 1e-10) -> jnp.ndarray:
    """Solve (H + lam * diag(H)) dx = -g (Marquardt scaling).

    Uses Cholesky; falls back to adding absolute jitter when diagonals
    vanish (unobserved parameters), which pins those coordinates near 0.
    """
    d = jnp.diagonal(H)
    damp = lam * jnp.maximum(d, eps) + eps
    Hd = H + jnp.diag(damp)
    L = jnp.linalg.cholesky(Hd)
    dx = jax.scipy.linalg.cho_solve((L, True), -g)
    # if the factorization failed (non-PSD after damping), take no step
    ok = jnp.all(jnp.isfinite(dx))
    return jnp.where(ok, dx, jnp.zeros_like(dx))


def lm_optimize(assemble: Callable, retract: Callable, chi2_fn: Callable,
                x0, max_iters: int = 10, lambda0: float = 1e-2,
                lambda_up: float = 4.0, lambda_down: float = 0.5,
                min_lambda: float = 1e-9, max_lambda: float = 1e6):
    """Run LM; returns (x, final_chi2, n_accepted).

    All callables must be jit-traceable with static shapes.
    """
    chi0 = chi2_fn(x0)

    def body(state):
        x, lam, chi, it, n_acc = state
        H, g, _ = assemble(x)
        dx = damped_solve(H, g, lam)
        x_new = retract(x, dx)
        chi_new = chi2_fn(x_new)
        accept = chi_new < chi
        x = jax.tree.map(
            lambda a, b: jnp.where(accept, b, a), x, x_new)
        chi = jnp.where(accept, chi_new, chi)
        lam = jnp.clip(jnp.where(accept, lam * lambda_down, lam * lambda_up),
                       min_lambda, max_lambda)
        return x, lam, chi, it + 1, n_acc + accept.astype(jnp.int32)

    def cond(state):
        _, _, _, it, _ = state
        return it < max_iters

    x, _, chi, _, n_acc = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(lambda0, jnp.float32), chi0,
                     jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
    return x, chi, n_acc
