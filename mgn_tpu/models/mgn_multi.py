"""Encode-Process-Decode with multiple edge sets (mesh edges + world edges).

New model family vs the reference (which is mesh-edge-only): cloth/contact
models (FlagSimple in BASELINE.json) use a second, dynamically constructed
"world edge" set connecting nodes that are close in world space.  Following
the MeshGraphNets paper (arXiv 2010.03409 §3: separate edge encoders and
per-edge-set update MLPs, node update consumes every edge set's aggregate):

- one encoder MLP per edge set,
- each processor block: per-set edge update f_k(e_k, v_s, v_r) -> scatter-add
  per set -> node update g(v, agg_1..agg_K), residuals everywhere,
- world edges are rebuilt each step on device (core.graph.build_world_edges)
  into a fixed-capacity buffer, so shapes stay static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mgn_tpu.models.mlp import apply_mlp, init_mlp
from mgn_tpu.ops.segment import gather, segment_sum

__all__ = ["EdgeSet", "MultiGraph", "MultiMGNConfig", "init_mgn_multi",
           "apply_mgn_multi"]


class EdgeSet(struct.PyTreeNode):
    features: jax.Array  # (E_k, F_k)
    senders: jax.Array  # (E_k,) int32
    receivers: jax.Array  # (E_k,) int32
    mask: jax.Array  # (E_k,) bool
    row_offsets: Optional[jax.Array] = None  # CSR if receiver-sorted


class MultiGraph(struct.PyTreeNode):
    node_features: jax.Array  # (N, F_n)
    edge_sets: Tuple[EdgeSet, ...]
    node_mask: jax.Array  # (N,) bool


@dataclasses.dataclass(frozen=True)
class MultiMGNConfig:
    node_input_dim: int
    edge_input_dims: Tuple[int, ...]  # one per edge set
    output_dim: int
    latent_size: int = 128
    hidden_layers: int = 2
    message_passing_steps: int = 15
    compute_dtype: Any = jnp.float32
    aggregation_backend: Optional[str] = None

    @property
    def num_edge_sets(self) -> int:
        return len(self.edge_input_dims)


def init_mgn_multi(key: jax.Array, cfg: MultiMGNConfig) -> Dict[str, Any]:
    k_ne, k_dec, k_enc, k_proc = jax.random.split(key, 4)
    L, H = cfg.latent_size, cfg.hidden_layers
    K = cfg.num_edge_sets
    params: Dict[str, Any] = {
        "node_encoder": init_mlp(k_ne, cfg.node_input_dim, L, H, L, layer_norm=True),
        "decoder": init_mlp(k_dec, L, L, H, cfg.output_dim, layer_norm=False),
        "edge_encoders": [
            init_mlp(k, d, L, H, L, layer_norm=True)
            for k, d in zip(jax.random.split(k_enc, K), cfg.edge_input_dims)
        ],
    }

    def init_block(k):
        ks = jax.random.split(k, K + 1)
        return {
            "edge_mlps": [init_mlp(ks[i], 3 * L, L, H, L, layer_norm=True)
                          for i in range(K)],
            "node_mlp": init_mlp(ks[K], (K + 1) * L, L, H, L, layer_norm=True),
        }

    blocks = [init_block(k)
              for k in jax.random.split(k_proc, cfg.message_passing_steps)]
    params["processor"] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    return params


def apply_mgn_multi(
    params: Dict[str, Any], graph: MultiGraph, cfg: MultiMGNConfig
) -> jax.Array:
    """Forward pass -> (N, output_dim) float32."""
    dt = cfg.compute_dtype
    n = graph.node_features.shape[0]
    K = cfg.num_edge_sets
    assert len(graph.edge_sets) == K

    v = apply_mlp(params["node_encoder"], graph.node_features, dt)
    es = [
        apply_mlp(params["edge_encoders"][k], graph.edge_sets[k].features, dt)
        * graph.edge_sets[k].mask.astype(dt)[:, None]
        for k in range(K)
    ]

    def block(carry, block_params):
        v, es = carry
        new_es = []
        aggs = []
        for k in range(K):
            s = graph.edge_sets[k]
            vs = gather(v, s.senders)
            vr = gather(v, s.receivers)
            msg = apply_mlp(block_params["edge_mlps"][k],
                            jnp.concatenate([es[k], vs, vr], -1), dt)
            msg = msg * s.mask.astype(dt)[:, None]
            aggs.append(segment_sum(
                msg, s.receivers, n, row_offsets=s.row_offsets,
                backend=cfg.aggregation_backend).astype(dt))
            new_es.append(es[k] + msg)
        upd = apply_mlp(block_params["node_mlp"],
                        jnp.concatenate([v] + aggs, -1), dt)
        return (v + upd, tuple(new_es)), None

    (v, es), _ = jax.lax.scan(block, (v, tuple(es)), params["processor"])
    out = apply_mlp(params["decoder"], v, dt)
    return out.astype(jnp.float32)
