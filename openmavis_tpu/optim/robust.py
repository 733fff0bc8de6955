"""Robust kernels (Huber) and chi-square thresholds.

(reference: g2o RobustKernelHuber usage throughout src/Optimizer.cc;
thresholds 5.991 / 7.815 for 2/3-dof reprojection edges.)
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_2D = 5.991
CHI2_3D = 7.815


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight of the Huber loss as a function of squared error.

    rho(s) = s                     for s <= delta^2
           = 2 delta sqrt(s) - delta^2   otherwise
    weight = rho'(s) = min(1, delta / sqrt(s)).
    """
    s = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta2 / s))
