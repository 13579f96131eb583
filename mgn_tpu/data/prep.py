"""Host -> device trajectory preparation: padding, templates, stacking.

The TPU-side replacement for the reference's ``prepare_trajectory!`` +
``create_base_graph`` pair (/root/reference/src/dataset.jl:645-665,
/root/reference/src/graph.jl:25-55): builds the static GraphTemplate and pads
every dynamic field to bucketed shapes so repeated trajectories share one
compiled executable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mgn_tpu.core.graph import GraphTemplate, bucket_size, build_template, pad_to
from mgn_tpu.data.meta import node_type_range
from mgn_tpu.data.pipeline import Trajectory
from mgn_tpu.train.common import FieldSpec

__all__ = ["PreparedTrajectory", "prepare_trajectory", "common_buckets"]


class PreparedTrajectory:
    """Device-ready trajectory: template + padded field stacks + times."""

    def __init__(self, template: GraphTemplate, fields: Dict[str, jax.Array],
                 times: jax.Array, num_nodes: int, num_steps: int):
        self.template = template
        self.fields = fields  # each (T, N_pad, dim) float32
        self.times = times  # (T,)
        self.num_nodes = num_nodes
        self.num_steps = num_steps


def common_buckets(
    trajs, meta: Dict[str, Any], node_multiple: int = 128, edge_multiple: int = 128
) -> Tuple[int, int]:
    """Shared (node_bucket, edge_bucket) across trajectories to avoid
    per-trajectory recompiles (SURVEY.md §7.3 hard part 1)."""
    from mgn_tpu.core.graph import cells_to_edges, parse_edges

    max_n, max_e = 0, 0
    for t in trajs:
        max_n = max(max_n, t.num_nodes)
        if t.cells is not None:
            s, _ = cells_to_edges(t.cells)
        elif t.edges is not None:
            s, _ = parse_edges(t.edges)
        else:
            raise ValueError("trajectory without cells or edges")
        max_e = max(max_e, len(s))
    return bucket_size(max_n + 1, node_multiple), bucket_size(max_e, edge_multiple)


def prepare_trajectory(
    traj: Trajectory,
    meta: Dict[str, Any],
    spec: FieldSpec,
    node_bucket: Optional[int] = None,
    edge_bucket: Optional[int] = None,
) -> PreparedTrajectory:
    tmin, tmax = node_type_range(meta)
    template = build_template(
        traj.mesh_pos, traj.node_type,
        cells=traj.cells, edges=traj.edges,
        type_min=tmin, type_max=tmax,
        node_bucket=node_bucket, edge_bucket=edge_bucket,
    )
    # validate the banded-aggregation window capacity (TPU default backend)
    from mgn_tpu.ops.banded import required_band

    need = required_band(np.asarray(template.row_offsets), template.num_nodes)
    if need > 2048:
        raise ValueError(
            f"graph has a 128-node block spanning {need} edges (> banded "
            "aggregation capacity 2048); use aggregation_backend='xla' or "
            "'pallas' for this mesh")
    n_pad = template.num_nodes
    fields = {}
    for f in spec.fields:
        arr = traj.fields[f]  # (T, N, dim)
        padded = np.zeros((arr.shape[0], n_pad, arr.shape[2]), np.float32)
        padded[:, : arr.shape[1]] = arr
        fields[f] = jnp.asarray(padded)
    return PreparedTrajectory(
        template=template,
        fields=fields,
        times=jnp.asarray(traj.times, jnp.float32),
        num_nodes=traj.num_nodes,
        num_steps=traj.num_steps,
    )
