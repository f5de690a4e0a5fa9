"""Device-mesh helpers for multi-chip scaling.

The reference's parallelism is shared-memory OpenMP (SURVEY.md §5.8); the
TPU-native replacement is SPMD over a `jax.sharding.Mesh` with two natural
axes:

* ``batch`` — embarrassingly parallel scenarios (MPC instances); sharded
  data-parallel, no collectives in the solve itself.
* ``time`` — the horizon, for parallel-in-time Riccati legs (the condensed
  interface system is small and is resolved with collectives).

``batched_solve`` is the one-call entry point: build a mesh over all local
(or provided) devices, shard a batch of initial states, and run a jitted
vmapped solver.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, axis_names=("batch",), shape=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=axis_names)


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Place a pytree with a leading batch axis onto the mesh, sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def make_hybrid_mesh(
    n_slices: Optional[int] = None,
    axis_names=("dcn", "batch"),
) -> Mesh:
    """Two-level mesh for multi-slice TPU pods: the outer axis spans slices
    (connected over DCN — data-center network), the inner axis the chips of
    a slice (connected over ICI).

    Layout rule (the scaling-book recipe): shard ONLY embarrassingly
    parallel work — the MPC scenario batch — over the ``dcn`` axis (zero
    collectives cross-slice), and keep every collective-bearing axis
    (parallel-in-time legs, condensed-system reductions) inside a slice so
    it rides ICI. ``batched_solve(axis_name=('dcn', 'batch'))`` shards the
    scenario batch over both axes at once.

    Uses ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` when
    slice topology is discoverable; falls back to a flat reshape (e.g. on
    the CPU-virtual test mesh, where DCN is simulated).
    """
    devices = jax.devices()
    n = len(devices)
    if n_slices is None:
        # group by slice if the platform exposes it; else one "slice"
        slice_ids = {getattr(d, "slice_index", 0) for d in devices}
        n_slices = max(len(slice_ids), 1)
    per_slice = n // n_slices
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (per_slice,), (n_slices,), devices=devices
        ).reshape(n_slices, per_slice)
    except Exception:
        arr = np.array(devices).reshape(n_slices, per_slice)
    return Mesh(arr, axis_names=axis_names)


def batched_solve(
    solve_one: Callable,
    batch_args,
    mesh: Optional[Mesh] = None,
    axis_name="batch",
):
    """Shard ``batch_args`` (leading batch axis) over the mesh and run
    ``vmap(solve_one)`` under jit with explicit shardings.

    Returns the (sharded) results pytree. The per-device work is identical,
    so scaling across chips is linear in the absence of host bottlenecks.
    """
    if mesh is None:
        mesh = make_mesh()
    sharding = NamedSharding(mesh, P(axis_name))
    batch_args = jax.device_put(batch_args, sharding)
    fn = jax.jit(jax.vmap(solve_one), in_shardings=(sharding,), out_shardings=sharding)
    return fn(batch_args)
