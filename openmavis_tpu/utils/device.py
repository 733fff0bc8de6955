"""Host/device placement policy for high-latency remote TPU transports.

The axon TPU backend in this environment is a *tunneled* device: every
device->host read is a multi-second (measured: 60-370 s) round trip through
a byte relay, and even trace-time work is remote — any `jnp.*` op executed
eagerly while tracing a `jit` function dispatches a tiny program to the TPU
and, worse, the MLIR lowering then fetches every captured device-array
constant back to host to embed it as a literal. Tracing a large program
that way takes tens of minutes and fails flakily (the round-2 bench crash:
FAILED_PRECONDITION surfacing in `_array_mlir_constant_handler`).

Policy implemented here (used by the streaming trackers, bench, examples):

1. `host_trace()` — a context manager under which eager ops (and therefore
   all trace-time constants) run on the local CPU backend. Tracing becomes
   pure host work; constants are embedded from host memory with zero d2h.
   The jit-compiled program still runs on the TPU because its array inputs
   are *committed* there (see `commit`).
2. `commit(tree)` — `device_put` a pytree onto the compute device so jit
   dispatch follows it regardless of the ambient default device.
3. `Packer` — fetch many result arrays in ONE device->host transfer: a
   cached jit program concatenates everything into a single f32 vector on
   device; the host does a single `np.asarray` and splits.

On a normal local backend (CPU tests, real local TPUs) all of this is a
no-op passthrough.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cpu_device", "compute_device", "is_remote", "host_trace",
           "commit", "Packer"]


@functools.cache
def cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


@functools.cache
def compute_device():
    return jax.devices()[0]


@functools.cache
def is_remote() -> bool:
    """True when the default backend is a (possibly tunneled) accelerator
    and a separate host CPU backend exists to trace against."""
    return jax.default_backend() != "cpu" and cpu_device() is not None


def host_trace():
    """Context manager: run eager ops (trace-time constants) on host CPU.

    Wrap the *call* of a jit function whose first invocation will trace:
        with device.host_trace():
            out = jitted_step(committed_args...)
    """
    if not is_remote():
        return contextlib.nullcontext()
    return jax.default_device(cpu_device())


def commit(tree):
    """Commit a pytree of arrays to the compute device (fast h2d path)."""
    if not is_remote():
        return tree
    return jax.device_put(tree, compute_device())


@functools.cache
def _pack_fn(n_leaves: int):
    """Jitted concatenate-and-cast program, cached by leaf count (shapes
    participate in the jit cache as usual)."""

    def pack(leaves):
        return jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for l in leaves])

    return jax.jit(pack)


class Packer:
    """Fetch a pytree of numeric arrays in a single d2h transfer.

    Values must be exactly representable in f32 (ints < 2^24, bools,
    f32/bf16 data) — true for trajectory rings, keyframe poses, counters.
    """

    def fetch(self, tree):
        leaves, treedef = jax.tree.flatten(tree)
        shapes = [l.shape for l in leaves]
        dtypes = [l.dtype for l in leaves]
        sizes = [int(np.prod(s)) for s in shapes]
        with host_trace():
            packed = _pack_fn(len(leaves))(leaves)
        flat = np.asarray(packed)          # THE single d2h transfer
        out, off = [], 0
        for shape, dtype, size in zip(shapes, dtypes, sizes):
            chunk = flat[off:off + size].reshape(shape)
            if np.issubdtype(dtype, np.integer):
                chunk = chunk.astype(dtype)
            elif dtype == np.bool_:
                chunk = chunk > 0.5
            out.append(chunk)
            off += size
        return jax.tree.unflatten(treedef, out)
