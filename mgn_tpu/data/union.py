"""Disjoint-union batching: B graphs -> one big graph.

The TPU-idiomatic way to batch ragged graphs (standard GNN trick): concatenate
node/edge arrays with index offsets.  Every per-graph op (gather, banded
scatter-add, MLPs) becomes one big static-shape op — far better MXU/HBM
utilization than vmapping over per-graph arrays, and it composes with the
existing single-graph trainers unchanged.

Supports the implemented ``batchsize`` (reference documents it as
unimplemented, /root/reference/src/MeshGraphNets.jl:224).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mgn_tpu.core.graph import GraphTemplate
from mgn_tpu.data.prep import PreparedTrajectory

__all__ = ["union_prepared", "UnionInfo"]


class UnionInfo:
    """Bookkeeping for a union of B identical-bucket graphs."""

    def __init__(self, batch: int, nodes_per_graph: int, edges_per_graph: int):
        self.batch = batch
        self.nodes_per_graph = nodes_per_graph
        self.edges_per_graph = edges_per_graph

    def node_graph_ids(self) -> np.ndarray:
        return np.repeat(np.arange(self.batch), self.nodes_per_graph)


def union_prepared(preps: Sequence[PreparedTrajectory]) -> tuple:
    """Concatenate B prepared trajectories (equal buckets, equal T) into one.

    Returns (template, fields, times, info):
    - template: GraphTemplate over B*N_pad nodes / B*E_pad edges (offsets
      applied; CSR offsets concatenated);
    - fields: {f: (T, B*N_pad, dim)};
    - times: (T,) — all trajectories in a batch share the time grid;
    - info: UnionInfo.
    """
    b = len(preps)
    t0 = preps[0].template
    n, e = t0.num_nodes, t0.num_edges
    tl = preps[0].times.shape[0]
    for p in preps:
        if p.template.num_nodes != n or p.template.num_edges != e:
            raise ValueError("union requires equal graph buckets")
        if p.times.shape[0] != tl:
            raise ValueError("union requires equal trajectory lengths")

    def cat(get):
        return jnp.concatenate([get(p.template) for p in preps], axis=0)

    senders = jnp.concatenate(
        [p.template.senders + i * n for i, p in enumerate(preps)])
    receivers = jnp.concatenate(
        [p.template.receivers + i * n for i, p in enumerate(preps)])
    row_offsets = jnp.concatenate(
        [preps[0].template.row_offsets[:1]]
        + [p.template.row_offsets[1:] + i * e for i, p in enumerate(preps)])

    # fused-kernel banding plan for the union graph: per-graph edge buckets
    # are 512-multiples, so chunks never straddle subgraph seams and the
    # union's bands equal the single-graph bands
    from mgn_tpu.ops.fused import build_fused_plan

    fused_plan = build_fused_plan(np.asarray(senders), np.asarray(receivers),
                                  b * n)

    template = GraphTemplate(
        node_type_onehot=cat(lambda t: t.node_type_onehot),
        mesh_edge_features=cat(lambda t: t.mesh_edge_features),
        senders=senders,
        receivers=receivers,
        row_offsets=row_offsets,
        node_mask=cat(lambda t: t.node_mask),
        edge_mask=cat(lambda t: t.edge_mask),
        node_type=cat(lambda t: t.node_type),
        fused_plan=fused_plan,
    )
    fields = {
        f: jnp.concatenate([p.fields[f] for p in preps], axis=1)
        for f in preps[0].fields
    }
    return template, fields, preps[0].times, UnionInfo(b, n, e)
