"""Encode-Process-Decode MeshGraphNets core (functional, TPU-first).

Covers the architecture of the external GraphNetCore.jl ``GraphNetwork`` /
``build_model`` (API documented at /root/reference/docs/src/graph_net_core.md,
sizing wired at /root/reference/src/MeshGraphNets.jl:282-285; semantics per the
MeshGraphNets paper the reference implements, arXiv 2010.03409):

- node encoder MLP, edge encoder MLP into a shared latent size,
- ``message_passing_steps`` processor blocks: edge update
  ``f(e, v_sender, v_receiver)``, scatter-add of updated edge messages into
  receivers, node update ``g(v, aggregate)``, residual connections on both,
- decoder MLP (no LayerNorm) emitting the stacked target-feature channels.

TPU-first choices: node-major (N, F) layout, processor parameters stacked on a
leading axis and driven by ``lax.scan`` (one compiled block instead of 15
unrolled ones), bf16-able matmuls, and receiver-sorted CSR aggregation that
dispatches to the Pallas kernel on TPU (see :mod:`mgn_tpu.ops`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mgn_tpu.core.graph import MeshGraph
from mgn_tpu.models.mlp import apply_mlp, apply_mlp_parts, init_mlp
from mgn_tpu.ops.segment import gather, segment_sum

__all__ = ["MGNConfig", "init_mgn", "apply_mgn"]


@dataclasses.dataclass(frozen=True)
class MGNConfig:
    """Static model hyperparameters (the model-shaped subset of ``Args``,
    /root/reference/src/MeshGraphNets.jl:35-57)."""

    node_input_dim: int  # `quantities` from the normalizer factory
    edge_input_dim: int  # mesh dims + 1
    output_dim: int  # sum of target feature dims
    latent_size: int = 128  # `layer_size`
    hidden_layers: int = 2
    message_passing_steps: int = 15  # `mps`
    compute_dtype: Any = jnp.float32
    aggregation_backend: Optional[str] = None  # None='auto'|'xla'|'pallas'|'banded'
    # unroll the processor rounds instead of lax.scan: ~12% faster on TPU
    # (cross-round pipelining) at the cost of longer compiles / larger HLO
    unroll: bool = False
    # 'take' (XLA gather) or 'banded' (MXU one-hot matmuls; requires spatially
    # ordered nodes — data.prep spatial_reorder — and valid band capacities)
    gather_backend: str = "take"
    sender_band: int = 512
    receiver_band: int = 256
    # run the processor rounds through the fused VMEM-resident Pallas kernel
    # (ops/fused.py) when the graph carries a banding plan; the biggest
    # single-chip perf lever (docs/performance.md "Round-2 kernel plan")
    fused: bool = False
    # use the native reverse-round backward kernel (forward saves per-round
    # residuals); otherwise backward recomputes the rounds with plain XLA ops
    fused_backward: bool = False


def init_mgn(key: jax.Array, cfg: MGNConfig) -> Dict[str, Any]:
    """Initialize all model parameters as a nested dict pytree."""
    k_ne, k_ee, k_dec, k_proc = jax.random.split(key, 4)
    L, H = cfg.latent_size, cfg.hidden_layers
    params = {
        "node_encoder": init_mlp(k_ne, cfg.node_input_dim, L, H, L, layer_norm=True),
        "edge_encoder": init_mlp(k_ee, cfg.edge_input_dim, L, H, L, layer_norm=True),
        "decoder": init_mlp(k_dec, L, L, H, cfg.output_dim, layer_norm=False),
    }

    def init_block(k):
        k_e, k_n = jax.random.split(k)
        return {
            "edge_mlp": init_mlp(k_e, 3 * L, L, H, L, layer_norm=True),
            "node_mlp": init_mlp(k_n, 2 * L, L, H, L, layer_norm=True),
        }

    blocks = [init_block(k) for k in jax.random.split(k_proc, cfg.message_passing_steps)]
    # Stack the per-block pytrees on a leading axis so the processor runs as a
    # single scanned block.
    params["processor"] = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    return params


def _fused_fits_vmem(n: int, e: int, latent: int, dtype,
                     kernel_bwd: bool, hidden_layers: int = 2) -> bool:
    """Can the fused kernels (resident or HBM-streaming variants) run this
    mesh?  Over-budget graphs silently take the unfused path instead of
    dying in a Mosaic scoped-vmem OOM.  Delegates to
    :func:`mgn_tpu.ops.fused.fused_fits`, which knows each variant's
    resident footprint (edge latents stream from HBM on 10k-node-class
    meshes; only the O(N·L) node-side state bounds the mesh size)."""
    from mgn_tpu.ops.fused import fused_fits

    return fused_fits(n, e, latent, dtype, kernel_bwd=kernel_bwd,
                      n_layers_e=hidden_layers + 1,
                      n_layers_n=hidden_layers + 1)


def apply_mgn(
    params: Dict[str, Any],
    graph: MeshGraph,
    cfg: MGNConfig,
    row_offsets: Optional[jax.Array] = None,
    fused_plan: Optional[Any] = None,
) -> jax.Array:
    """Forward pass. Returns per-node outputs ``(N_pad, output_dim)`` float32.

    ``row_offsets`` (CSR offsets from the graph template) routes aggregation
    through the banded/Pallas TPU kernels; ``fused_plan`` (a
    :class:`mgn_tpu.ops.fused.FusedPlan` from the template) together with
    ``cfg.fused`` routes the whole processor through the VMEM-resident fused
    round kernel.
    """
    dt = cfg.compute_dtype
    n_pad = graph.node_features.shape[0]
    edge_valid = graph.edge_mask.astype(dt)[:, None]

    v = apply_mlp(params["node_encoder"], graph.node_features, dt)  # (N, L)
    e = apply_mlp(params["edge_encoder"], graph.edge_features, dt)  # (E, L)
    e = e * edge_valid

    if cfg.fused and fused_plan is not None and _fused_fits_vmem(
            n_pad, graph.edge_features.shape[0], cfg.latent_size, dt,
            bool(cfg.fused_backward), cfg.hidden_layers):
        from mgn_tpu.ops.fused import fused_process

        interpret = jax.default_backend() != "tpu"
        v = fused_process(params["processor"], v, e, fused_plan,
                          graph.senders, graph.receivers, edge_valid,
                          cfg.message_passing_steps, interpret=interpret,
                          kernel_bwd=cfg.fused_backward)
        return apply_mlp(params["decoder"], v, dt).astype(jnp.float32)

    if cfg.gather_backend == "banded":
        from mgn_tpu.ops.banded import banded_gather

        do_gather = lambda v, idx, band: banded_gather(v, idx, band)
    else:
        do_gather = lambda v, idx, band: gather(v, idx)

    def block(carry, block_params):
        v, e = carry
        vs = do_gather(v, graph.senders, cfg.sender_band)
        vr = do_gather(v, graph.receivers, cfg.receiver_band)
        # apply_mlp_parts: no (E, 3L) concat materialization — the first-layer
        # weights are sliced per input part
        msg = apply_mlp_parts(block_params["edge_mlp"], (e, vs, vr), dt)
        msg = msg * edge_valid  # dead (padded) edges contribute nothing
        agg = segment_sum(
            msg,
            graph.receivers,
            n_pad,
            row_offsets=row_offsets,
            backend=cfg.aggregation_backend,
        ).astype(dt)
        upd = apply_mlp_parts(block_params["node_mlp"], (v, agg), dt)
        return (v + upd, e + msg), None

    if cfg.unroll:
        carry = (v, e)
        for i in range(cfg.message_passing_steps):
            bp = jax.tree.map(lambda x: x[i], params["processor"])
            carry, _ = block(carry, bp)
        v, e = carry
    else:
        (v, e), _ = jax.lax.scan(block, (v, e), params["processor"])
    out = apply_mlp(params["decoder"], v, dt)
    return out.astype(jnp.float32)
