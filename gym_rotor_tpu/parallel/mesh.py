"""Device mesh + sharding helpers (SURVEY.md §2 rows 30-32 capability gaps).

The parallelism story for this workload is data parallelism over the env
batch: env state / rollouts / replay shard along one ``env`` mesh axis that
spans all chips (ICI within a slice, DCN across hosts); learner parameters
are replicated and gradients are reduced with XLA collectives inside the
jitted update — no NCCL/MPI layer, just shardings (the reference has no
distribution at all: single env, single device, main.py:27-34).

Multi-host bring-up: call ``initialize_distributed`` before any jax op; on a
single host, ``make_mesh`` over the local devices is all that is needed —
the same code path the tests exercise on a virtual
``--xla_force_host_platform_device_count`` CPU mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (jax.distributed).  No-op when
    single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Leading-axis sharding for anything batched over envs."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "env"):
    """Place a pytree of (B, ...) arrays with B sharded over the mesh."""
    return jax.device_put(tree, env_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
