"""Device-mesh and multi-host initialization helpers.

The communication layer the reference lacks (SURVEY.md §2.3/§5): JAX
collectives over ICI within a pod slice and DCN across slices.  This module
owns process bootstrap (``jax.distributed.initialize``) and mesh construction;
collective use lives in :mod:`mgn_tpu.parallel.spmd` / ``halo``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["initialize_multihost", "mesh_shape_for", "data_graph_mesh",
           "compiler_options_for"]


def compiler_options_for(mesh) -> Optional[dict]:
    """XLA compiler options for jitted SPMD programs over ``mesh``.

    On TPU the per-round sharded fused path slices the 15-round weight stack
    inside a ``lax.scan``; XLA stages those operand fusions in *scoped* VMEM,
    which obeys the global ``--xla_tpu_scoped_vmem_limit_kib`` default (16 MB)
    rather than the kernel's own raised ``vmem_limit_bytes`` — measured OOM:
    27.25 MB of staging vs the 16 MB cap (benchmarks/results/SPMD_r03.json,
    first recording).  Raise the program-wide cap to the kernels' limit so the
    staging fits.  Returns None off-TPU (the flag is TPU-only)."""
    if next(iter(mesh.devices.flat)).platform != "tpu":
        return None
    from mgn_tpu.ops import fused as _F

    return {"xla_tpu_scoped_vmem_limit_kib": int(_F._VMEM_LIMIT) >> 10}


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize JAX multi-process (multi-host) execution.

    No-op for single-process runs.  Arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env contract.
    """
    import jax

    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def mesh_shape_for(n_devices: int, prefer_graph: int = 0) -> Tuple[int, int]:
    """(data, graph) mesh shape: graph axis gets the largest power of two that
    divides the device count (or ``prefer_graph`` if given and feasible)."""
    if prefer_graph and n_devices % prefer_graph == 0:
        return n_devices // prefer_graph, prefer_graph
    graph = 1
    while graph * 2 <= n_devices and n_devices % (graph * 2) == 0:
        graph *= 2
    return n_devices // graph, graph


def data_graph_mesh(prefer_graph: int = 0):
    """Build the standard ("data", "graph") Mesh over all devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    data, graph = mesh_shape_for(len(devs), prefer_graph)
    return Mesh(np.asarray(devs).reshape(data, graph), ("data", "graph"))
