"""Shared training/rollout machinery: state pytrees, masks, feature assembly.

Functional equivalents of the reference's per-trajectory setup inside
``train_mgn!`` (/root/reference/src/MeshGraphNets.jl:348-362: update/loss
masks, base graph) and ``build_graph`` (/root/reference/src/graph.jl:75-97:
normalized node/edge feature assembly).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mgn_tpu.core.graph import GraphTemplate, MeshGraph
from mgn_tpu.core import normalizers as N

__all__ = ["NormState", "TrainState", "FieldSpec", "type_mask", "assemble_graph",
           "pack_fields", "unpack_fields", "masked_mse"]


class NormState(struct.PyTreeNode):
    """All normalizer state: edge + per-feature node + per-target output."""

    edge: N.Normalizer
    node: Dict[str, N.Normalizer]
    output: Dict[str, N.Normalizer]


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    norm: NormState
    step: jax.Array  # () int32


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of the dynamic node fields (order matters: node
    features are concatenated in ``feature_names`` order, then one-hot type —
    /root/reference/src/graph.jl:80-86)."""

    fields: Tuple[str, ...]  # dynamic input fields (feature_names minus mesh_pos/cells/node_type)
    target_fields: Tuple[str, ...]
    field_dims: Tuple[int, ...]  # dims of `fields`
    target_dims: Tuple[int, ...]  # dims of `target_fields`
    # per-target output semantics: 'delta' (finite-difference derivative, the
    # reference's only mode) or 'absolute' (network predicts the value itself —
    # e.g. the DeformingPlate stress head; new capability)
    output_modes: Tuple[str, ...] = ()

    @classmethod
    def from_meta(cls, meta: Dict[str, Any]) -> "FieldSpec":
        fields = tuple(f for f in meta["feature_names"]
                       if f not in ("mesh_pos", "node_type", "cells"))
        targets = tuple(meta["target_features"])
        return cls(
            fields=fields,
            target_fields=targets,
            field_dims=tuple(int(meta["features"][f]["dim"]) for f in fields),
            target_dims=tuple(int(meta["features"][f]["dim"]) for f in targets),
            output_modes=tuple(
                meta["features"][f].get("output_mode", "delta") for f in targets),
        )

    def mode(self, i: int) -> str:
        return self.output_modes[i] if self.output_modes else "delta"

    @property
    def output_dim(self) -> int:
        return sum(self.target_dims)

    def target_slices(self) -> List[slice]:
        out, off = [], 0
        for d in self.target_dims:
            out.append(slice(off, off + d))
            off += d
        return out


def type_mask(node_type: jax.Array, types: Sequence[int]) -> jax.Array:
    """True where node_type ∈ types. (Padded nodes have type -1 → False.)"""
    types_arr = jnp.asarray(list(types), jnp.int32)
    return jnp.any(node_type[..., None] == types_arr, axis=-1)


def pack_fields(values: Dict[str, jax.Array], spec: FieldSpec) -> jax.Array:
    """Stack target-field arrays into one (N, output_dim) slab (the ``vcat`` of
    /root/reference/src/solve.jl:48)."""
    return jnp.concatenate([values[f] for f in spec.target_fields], axis=-1)


def unpack_fields(slab: jax.Array, spec: FieldSpec) -> Dict[str, jax.Array]:
    return {f: slab[..., sl] for f, sl in zip(spec.target_fields, spec.target_slices())}


def assemble_graph(
    norm: NormState,
    template: GraphTemplate,
    field_values: Dict[str, jax.Array],
    spec: FieldSpec,
) -> MeshGraph:
    """Normalized feature assembly into a MeshGraph (eval-mode normalizers —
    accumulation is a separate, explicit step in the train step)."""
    parts = [norm.node[f](field_values[f]) for f in spec.fields]
    parts.append(norm.node["node_type"](template.node_type_onehot))
    nf = jnp.concatenate(parts, axis=-1) * template.node_mask[:, None]
    ef = norm.edge(template.mesh_edge_features) * template.edge_mask[:, None]
    return MeshGraph(
        node_features=nf,
        edge_features=ef,
        senders=template.senders,
        receivers=template.receivers,
        node_mask=template.node_mask,
        edge_mask=template.edge_mask,
    )


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Sum of squared channel errors per node, averaged over masked nodes
    (GraphNetCore ``mse_reduce`` role, /root/reference/src/strategies.jl:421)."""
    per_node = jnp.sum((pred - target) ** 2, axis=-1)
    m = mask.astype(pred.dtype)
    return jnp.sum(per_node * m) / jnp.maximum(jnp.sum(m), 1.0)
