"""Graph-parallel (sharded) Encode-Process-Decode forward pass.

The distributed message-passing layer the reference lacks (SURVEY.md §2.3).
Scheme (v1, sequence-parallel style): node and edge shards live on the
``graph`` mesh axis; each processor round

  1. all-gathers the (small, latent-sized) node activations over the graph
     axis — XLA lowers this to ICI collectives,
  2. gathers sender features from the gathered copy and computes edge
     messages locally (edges are receiver-local by construction, see
     :mod:`mgn_tpu.parallel.partition`),
  3. segment-sums messages into the local node shard (no communication).

Only activations move — never edge features or messages — so bytes on the
wire per round are ``P * N_p * latent``.  A boundary-only ``ppermute`` halo
exchange is the planned refinement (SURVEY.md §2.3 overlap engine).

These functions are meant to run inside ``shard_map`` over a
``jax.sharding.Mesh`` axis; see :mod:`mgn_tpu.parallel.spmd` for the wiring.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mgn_tpu.models.mlp import apply_mlp
from mgn_tpu.models.mgn import MGNConfig
from mgn_tpu.ops.segment import segment_sum

__all__ = ["apply_mgn_sharded"]


def apply_mgn_sharded(
    params: Dict[str, Any],
    node_features: jax.Array,  # (N_p, F_n) local shard
    edge_features: jax.Array,  # (E_p, F_e) local shard
    senders_global: jax.Array,  # (E_p,) global reordered node ids
    receivers_local: jax.Array,  # (E_p,) part-local ids
    node_mask: jax.Array,  # (N_p,)
    edge_mask: jax.Array,  # (E_p,)
    cfg: MGNConfig,
    axis_name: str,
    row_offsets: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-shard forward pass; call inside shard_map over ``axis_name``.

    Returns the local shard of decoded outputs (N_p, output_dim) float32.
    """
    dt = cfg.compute_dtype
    n_p = node_features.shape[0]
    edge_valid = edge_mask.astype(dt)[:, None]

    v = apply_mlp(params["node_encoder"], node_features, dt)
    e = apply_mlp(params["edge_encoder"], edge_features, dt) * edge_valid

    def block(carry, block_params):
        v, e = carry
        # activation all-gather over the graph axis: (P*N_p, L)
        v_full = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
        vs = jnp.take(v_full, senders_global, axis=0)
        vr = jnp.take(v, receivers_local, axis=0)
        msg = apply_mlp(block_params["edge_mlp"], jnp.concatenate([e, vs, vr], -1), dt)
        msg = msg * edge_valid
        agg = segment_sum(
            msg, receivers_local, n_p, row_offsets=row_offsets,
            backend=cfg.aggregation_backend,
        ).astype(dt)
        upd = apply_mlp(block_params["node_mlp"], jnp.concatenate([v, agg], -1), dt)
        return (v + upd, e + msg), None

    (v, e), _ = jax.lax.scan(block, (v, e), params["processor"])
    out = apply_mlp(params["decoder"], v, dt)
    return out.astype(jnp.float32)
