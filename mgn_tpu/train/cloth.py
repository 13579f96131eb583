"""Cloth / world-space dynamics family (FlagSimple-class models).

A model family the reference does not cover (BASELINE.json config 3): 3-D
world-space dynamics on a 2-D reference mesh, with **dynamically built world
edges** (radius query in world space each step) alongside mesh edges, and
second-order (acceleration) targets integrated semi-implicitly:

    vel_in   = (x_t - x_{t-1}) / dt
    acc_pred = MGN(vel_in, onehot; mesh edges [u_ij, |u_ij|, x_ij, |x_ij|],
                   world edges [x_ij, |x_ij|])
    x_{t+1}  = 2 x_t - x_{t-1} + acc_pred * dt^2

(the MeshGraphNets-paper cloth formulation).  Training target is the
finite-difference acceleration of the ground truth with input noise applied to
x_t, online-normalized like every other quantity.  Handle nodes (types outside
``types_updated``) are kinematically forced from ground truth during rollout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mgn_tpu.core import normalizers as N
from mgn_tpu.core.graph import GraphTemplate, build_world_edges
from mgn_tpu.models.mgn_multi import (EdgeSet, MultiGraph, MultiMGNConfig,
                                      apply_mgn_multi, init_mgn_multi)
from mgn_tpu.train.common import NormState, TrainState, masked_mse, type_mask

__all__ = ["ClothConfig", "make_cloth_norm_state", "make_cloth_trainer",
           "make_cloth_rollout", "cloth_model_config", "build_cloth_graph",
           "cloth_compiler_options", "jit_cloth_trainer",
           "jit_cloth_rollout"]


@dataclasses.dataclass(frozen=True)
class ClothConfig:
    model: MultiMGNConfig
    world_radius: float = 0.05
    world_capacity: int = 512  # fixed world-edge buffer size
    noise_stddev: float = 0.003
    types_updated: Tuple[int, ...] = (0,)
    types_noisy: Tuple[int, ...] = (0,)
    norm_steps: int = 1000
    world_dim: int = 3


def cloth_model_config(meta: Dict[str, Any], latent: int = 128,
                       hidden_layers: int = 2, mps: int = 15,
                       **kw) -> MultiMGNConfig:
    wd = int(meta.get("world_dim", 3))
    md = 2  # reference mesh space
    t_depth = (int(meta["features"]["node_type"]["data_max"])
               - int(meta["features"]["node_type"]["data_min"]) + 1)
    return MultiMGNConfig(
        node_input_dim=wd + t_depth,
        edge_input_dims=(md + 1 + wd + 1, wd + 1),
        output_dim=wd,
        latent_size=latent, hidden_layers=hidden_layers,
        message_passing_steps=mps, **kw)


def make_cloth_norm_state(cfg: ClothConfig, max_acc: float = 1e7) -> NormState:
    md = 2
    wd = cfg.world_dim
    return NormState(
        edge={"mesh": N.Online.create(md + 1 + wd + 1, max_acc),
              "world": N.Online.create(wd + 1, max_acc)},
        node={"velocity": N.Online.create(wd, max_acc),
              "node_type": N.OfflineMinMax.create(0.0, 1.0)},
        output={"acceleration": N.Online.create(wd, max_acc)},
    )


def build_cloth_graph(norm: NormState, template: GraphTemplate,
                      world_pos: jax.Array, vel: jax.Array,
                      cfg: ClothConfig, world_edges=None) -> MultiGraph:
    """Assemble the two-edge-set graph at one state (normalized).

    ``world_edges``: optional precomputed ``(senders, receivers, mask)`` —
    the trainer builds them once per step for normalizer accumulation and
    passes them here (the radius query costs ~5 ms at flag scale even after
    the top_k rewrite; XLA's CSE merged the duplicate before, but only by
    luck of identical call shapes)."""
    node_mask = template.node_mask
    nf = jnp.concatenate(
        [norm.node["velocity"](vel),
         norm.node["node_type"](template.node_type_onehot)], -1)
    nf = nf * node_mask[:, None]

    rel_w = world_pos[template.senders] - world_pos[template.receivers]
    mesh_feat = jnp.concatenate(
        [template.mesh_edge_features, rel_w,
         jnp.linalg.norm(rel_w, axis=-1, keepdims=True)], -1)
    mesh_feat = norm.edge["mesh"](mesh_feat) * template.edge_mask[:, None]

    if world_edges is None:
        world_edges = build_world_edges(
            world_pos, node_mask, cfg.world_radius, cfg.world_capacity,
            exclude_senders=template.senders,
            exclude_receivers=template.receivers)
    ws, wr, wm = world_edges
    rel_ww = (world_pos[ws] - world_pos[wr]) * wm[:, None]
    world_feat = jnp.concatenate(
        [rel_ww, jnp.linalg.norm(rel_ww, axis=-1, keepdims=True)], -1)
    world_feat = norm.edge["world"](world_feat) * wm[:, None]

    return MultiGraph(
        node_features=nf,
        edge_sets=(
            EdgeSet(features=mesh_feat, senders=template.senders,
                    receivers=template.receivers, mask=template.edge_mask,
                    row_offsets=template.row_offsets),
            EdgeSet(features=world_feat, senders=ws, receivers=wr, mask=wm),
        ),
        node_mask=node_mask,
    )


def _raw_edge_feats(template, world_pos):
    rel_w = world_pos[template.senders] - world_pos[template.receivers]
    return jnp.concatenate(
        [template.mesh_edge_features, rel_w,
         jnp.linalg.norm(rel_w, axis=-1, keepdims=True)], -1)


def make_cloth_trainer(cfg: ClothConfig,
                       optimizer: optax.GradientTransformation) -> Callable:
    """Build ``train_window(state, template, world_pos (T,N,3), times, perm,
    key) -> (state, losses)`` — jitted scan over sampled frames t ∈ [1, T-1)."""

    def one_step(template, world_pos, times, state: TrainState, t, key):
        node_mask = template.node_mask
        update_mask = type_mask(template.node_type, cfg.types_updated) & node_mask
        noisy_mask = type_mask(template.node_type, cfg.types_noisy) & node_mask
        dt = times[t] - times[t - 1]

        prev = jax.lax.dynamic_index_in_dim(world_pos, t - 1, 0, keepdims=False)
        cur = jax.lax.dynamic_index_in_dim(world_pos, t, 0, keepdims=False)
        nxt = jax.lax.dynamic_index_in_dim(world_pos, t + 1, 0, keepdims=False)
        noise = cfg.noise_stddev * jax.random.normal(key, cur.shape)
        cur = cur + noise * noisy_mask[:, None]

        vel = (cur - prev) / dt
        acc = (nxt - 2 * cur + prev) / (dt * dt)

        # normalizer accumulation
        node_norms = dict(state.norm.node)
        node_norms["velocity"] = N.accumulate(node_norms["velocity"], vel,
                                              node_mask)
        out_norms = dict(state.norm.output)
        out_norms["acceleration"] = N.accumulate(out_norms["acceleration"], acc,
                                                 node_mask)
        edge_norms = dict(state.norm.edge)
        edge_norms["mesh"] = N.accumulate(
            edge_norms["mesh"], _raw_edge_feats(template, cur),
            template.edge_mask)
        # world-edge stats accumulate inside build via current buffer
        ws, wr, wm = build_world_edges(
            cur, node_mask, cfg.world_radius, cfg.world_capacity,
            exclude_senders=template.senders,
            exclude_receivers=template.receivers)
        rel_ww = (cur[ws] - cur[wr]) * wm[:, None]
        edge_norms["world"] = N.accumulate(
            edge_norms["world"],
            jnp.concatenate(
                [rel_ww, jnp.linalg.norm(rel_ww, axis=-1, keepdims=True)], -1),
            wm)
        norm = NormState(edge=edge_norms, node=node_norms, output=out_norms)

        target = norm.output["acceleration"](acc)

        def loss_fn(params):
            graph = build_cloth_graph(norm, template, cur, vel, cfg,
                                      world_edges=(ws, wr, wm))
            out = apply_mgn_multi(params, graph, cfg.model,
                                  fused_plan=template.fused_plan)
            return masked_mse(out, target, update_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        do_update = state.step >= cfg.norm_steps
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(do_update, x, y), a, b)
        return TrainState(params=sel(new_params, state.params),
                          opt_state=sel(new_opt, state.opt_state),
                          norm=norm, step=state.step + 1), loss

    def train_window(state, template, world_pos, times, perm, key):
        def body(st, t):
            k = jax.random.fold_in(key, st.step)
            return one_step(template, world_pos, times, st, t, k)

        return jax.lax.scan(body, state, perm)

    return train_window


def make_cloth_rollout(cfg: ClothConfig) -> Callable:
    """Build ``rollout(params, norm, template, world_pos_gt (T,N,3), times) ->
    pred (T,N,3)``: semi-implicit second-order integration with handle nodes
    forced from ground truth."""

    def rollout(params, norm: NormState, template, world_pos_gt, times):
        node_mask = template.node_mask
        update_mask = (type_mask(template.node_type, cfg.types_updated)
                       & node_mask)[:, None]

        def step(carry, t):
            prev, cur = carry
            dt = times[t] - times[t - 1]
            vel = (cur - prev) / dt
            graph = build_cloth_graph(norm, template, cur, vel, cfg)
            acc = norm.output["acceleration"].inverse(
                apply_mgn_multi(params, graph, cfg.model,
                                fused_plan=template.fused_plan))
            nxt = 2 * cur - prev + acc * dt * dt
            gt_next = jax.lax.dynamic_index_in_dim(world_pos_gt, t + 1, 0,
                                                   keepdims=False)
            nxt = jnp.where(update_mask, nxt, gt_next)
            return (cur, nxt), nxt

        t_idx = jnp.arange(1, world_pos_gt.shape[0] - 1)
        (_, _), preds = jax.lax.scan(step, (world_pos_gt[0], world_pos_gt[1]),
                                     t_idx)
        return jnp.concatenate([world_pos_gt[:2], preds], axis=0)

    return rollout


def cloth_compiler_options():
    """XLA options the fused cloth trainer needs on TPU.

    The native backward kernel's residual-stack operand fusions stage in
    SCOPED vmem above the global 16 MB default — the same operand-fusion OOM
    ``parallel/mesh.compiler_options_for`` fixes for SPMD programs.  The
    remote compile helper obscures the OOM as an opaque exit-1, which is why
    flag-scale native-backward training "failed to compile" until the
    round-4 bisect (CLOTH_COMPILE4_probe.json: raised-cap compile OK,
    default-cap control fails, same session).  Returns None off-TPU."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    from mgn_tpu.ops import fused as _F

    return {"xla_tpu_scoped_vmem_limit_kib": int(_F._VMEM_LIMIT) >> 10}


def jit_cloth_trainer(cfg: ClothConfig, optimizer):
    """``jax.jit(make_cloth_trainer(...))`` with the required compiler
    options (see :func:`cloth_compiler_options`) — use this instead of
    jitting by hand; a plain ``jax.jit`` loses the scoped-vmem cap and the
    native backward fails to compile at flag scale."""
    import jax

    return jax.jit(make_cloth_trainer(cfg, optimizer),
                   compiler_options=cloth_compiler_options())


def jit_cloth_rollout(cfg: ClothConfig):
    import jax

    return jax.jit(make_cloth_rollout(cfg),
                   compiler_options=cloth_compiler_options())
