"""openmavis_tpu — a TPU-native multi-camera visual-inertial SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of OpenMAVIS
(ORB-SLAM3 + 4-camera rig + SE2(3) exact IMU pre-integration; see SURVEY.md).
Not a port: the pointer-graph + mutex architecture of the C++ reference is
replaced by device-resident structure-of-arrays map slabs, jit-compiled
kernels for every compute-heavy component, and `jax.sharding` for scale-out.

Subpackages
-----------
geometry   Lie groups (SO3/SE3/Sim3), camera models, triangulation.
imu        SE2(3) IMU pre-integration (`lax.scan` over samples).
frontend   Image pyramid, FAST + oriented-BRIEF extraction, Hamming matching.
solvers    Batched RANSAC solvers: two-view H/F, Sim3 Horn, PnP.
optim      Batched Levenberg-Marquardt, Schur-complement BA, pose graphs.
slam_map   Fixed-capacity map slabs, Atlas, keyframe database, vocabulary.
pipeline   Tracking / local mapping / loop closing orchestration + System facade.
parallel   Device meshes, sharded BA reductions, distributed place recognition.
io         Dataset loaders, yaml settings, trajectory writers, checkpoints.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry and BA math everywhere in this package assumes true float32
# accumulation. TPUs default f32 matmuls to bf16 passes; that is catastrophic
# for 3x3 pose algebra and normal-equation assembly. Hot kernels that are
# happy in bf16 (descriptor-distance matmuls) opt back in explicitly with
# precision/preferred_element_type at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

import os as _os_plat

# Explicit platform override (e.g. OPENMAVIS_PLATFORM=cpu for subprocess
# tests): environments whose sitecustomize force-registers an accelerator
# backend override JAX_PLATFORMS via jax.config, so an env var honored
# AFTER import is the only reliable escape hatch.
_plat_override = _os_plat.environ.get("OPENMAVIS_PLATFORM")
if _plat_override:
    _jax.config.update("jax_platforms", _plat_override)

# Persistent compilation cache: the full pipeline is many large jitted
# programs; first compile on TPU takes minutes, cached reloads are seconds.
# CPU is excluded: jaxlib 0.9.0's XLA:CPU executable deserialization
# SIGSEGV/SIGABRTs when reading back its own cache entries (observed on the
# 8-device test mesh), so the cache must never be active for CPU-only runs
# such as the test suite.
import os as _os


def _cpu_only() -> bool:
    plat = (_jax.config.jax_platforms
            or _os.environ.get("JAX_PLATFORMS") or "")
    first = plat.split(",")[0].strip().lower()
    return first == "cpu"


_cache_dir = _os.environ.get(
    "OPENMAVIS_JAX_CACHE", _os.path.expanduser("~/.cache/openmavis_jax"))
if not _cpu_only():
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        pass

