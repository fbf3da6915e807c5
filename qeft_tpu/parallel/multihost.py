"""Multi-host (DCN) scaffolding: distributed runtime init, global mesh
construction, and host-local data feeding.

The reference has NO distributed layer (SURVEY §2.3: its only multi-device
code is the blocking `model_multigpu` pipeline, utils/modelutils.py:21-57).
This module is the new capability the TPU build adds: a pod slice runs one
process per host; `init_distributed` wires them into one JAX runtime,
`global_mesh` lays a (dp, tp) mesh with **dp as the outer axis across hosts
(DCN)** and **tp inner within a host (ICI)** so tensor-parallel collectives
never cross the slow fabric, and `host_local_batch` assembles a global
dp-sharded batch from per-host shards without any host ever materializing
the full batch.

Single-process (1 host, or the CPU test mesh) degrades gracefully: init is a
no-op, the mesh covers the local devices, and host_local_batch is a plain
device_put.

Verified by `scripts/multihost_dryrun.py`: 2 real processes x 4 virtual CPU
devices each, one global (dp=2, tp=4) mesh, WCT train steps with per-host
batch shards — run by tests/test_multihost.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-process JAX runtime.  Returns True if distributed mode
    was initialized.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID), so launchers can configure purely via
    environment; on Cloud TPU pods `jax.distributed.initialize()` also
    auto-detects everything, which passing no arguments preserves.  A single
    process with no configuration is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(tp: Optional[int] = None, axis_names=("dp", "tp")) -> Mesh:
    """(dp, tp) mesh over ALL devices of ALL processes.

    ``tp`` defaults to the local device count, which puts every
    tensor-parallel group entirely inside one host: its all-gathers/psums ride
    ICI, and only the dp gradient/batch collectives cross DCN (the
    scaling-book layout for bandwidth-bound decode).
    """
    devices = jax.devices()
    tp = tp or jax.local_device_count()
    assert len(devices) % tp == 0, (len(devices), tp)
    dp = len(devices) // tp
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names)


def host_local_batch(local_batch: np.ndarray, mesh: Mesh, axis: str = "dp"):
    """Assemble the GLOBAL batch array from this host's local shard.

    Each process passes only its own ``local_batch`` (global_batch /
    num_processes rows); the result is one jax.Array sharded over ``axis``
    whose addressable shards are exactly the local rows — no host ever holds
    the full batch, no cross-host copy happens at feed time.
    """
    sharding = NamedSharding(mesh, P(axis, *([None] * (local_batch.ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_batch), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch)
    )


def process_slice(n_global: int) -> slice:
    """Row range of a length-``n_global`` batch this process should feed
    (contiguous block partitioning, matching host_local_batch's dp layout).

    ``n_global`` must divide evenly — host_local_batch assembles equal-size
    per-process shards, so a remainder would silently drop the trailing rows
    of every batch; fail loudly instead."""
    n_proc = jax.process_count()
    if n_global % n_proc != 0:
        raise ValueError(
            f"global batch {n_global} must be divisible by process_count "
            f"{n_proc} (pad or trim the batch explicitly)"
        )
    per = n_global // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)


def all_hosts_agree(value: float, tol: float = 0.0) -> bool:
    """Cross-host agreement check on a scalar (e.g. the loss) — a cheap
    correctness probe for the collective wiring."""
    from jax.experimental import multihost_utils

    arr = np.asarray([value], np.float32)
    gathered = multihost_utils.process_allgather(arr)
    return bool(np.all(np.abs(gathered - gathered[0]) <= tol))
