"""Derivative (1-step finite-difference) training — the default strategy.

Covers the reference's DerivativeTraining path
(/root/reference/src/strategies.jl:389-447 and the inner loop of ``train_mgn!``,
/root/reference/src/MeshGraphNets.jl:364-394): per sampled frame t,

    target = o_norm((u[t+1] - (u[t] + noise)) / dt)
    loss   = masked MSE(model(graph(u[t] + noise)), target)

with Gaussian noise only on node types in ``types_noisy``
(/root/reference/src/dataset.jl:496-509), online-normalizer accumulation, and
optimizer updates gated off during the first ``norm_steps`` warmup steps
(/root/reference/src/MeshGraphNets.jl:374-394).

TPU-first restructuring: the reference dispatches one Julia call per frame;
here the whole per-trajectory window (``delta`` frames, shuffled) is ONE jitted
``lax.scan``, so the hot loop never leaves the device.  Frame shuffling is done
by scanning a permutation of frame indices — equivalent in distribution to the
reference's host-side time-axis shuffle (/root/reference/src/dataset.jl:511-524).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mgn_tpu.core import normalizers as N
from mgn_tpu.core.graph import GraphTemplate
from mgn_tpu.models.mgn import MGNConfig, apply_mgn
from mgn_tpu.train.common import (FieldSpec, NormState, TrainState,
                                  assemble_graph, masked_mse, type_mask)

__all__ = ["DerivativeTrainerConfig", "make_derivative_trainer",
           "make_batched_derivative_trainer", "make_union_derivative_trainer"]


@dataclasses.dataclass(frozen=True)
class DerivativeTrainerConfig:
    model: MGNConfig
    spec: FieldSpec
    noise_stddevs: Tuple[float, ...]  # one per target field (or broadcast len 1)
    types_updated: Tuple[int, ...] = (0, 5)
    types_noisy: Tuple[int, ...] = (0,)
    norm_steps: int = 1000
    sync_axis: Optional[str] = None  # psum grads/norm stats across this mesh axis

    def sigma(self, i: int) -> float:
        return self.noise_stddevs[i if len(self.noise_stddevs) > 1 else 0]


def make_derivative_trainer(
    cfg: DerivativeTrainerConfig, optimizer: optax.GradientTransformation
) -> Callable:
    """Build ``train_window(state, template, fields, times, perm, key)``.

    - ``fields``: dict of dynamic node fields, each (T, N_pad, dim), padded.
    - ``perm``: (delta,) int32 frame indices in [0, T-1) — shuffled or ordered.
    - returns ``(state, losses (delta,))``.

    Jit this (or wrap in pjit/shard_map); everything inside is a single scan.
    """
    spec = cfg.spec

    def one_step(template: GraphTemplate, fields, times, state: TrainState,
                 t: jax.Array, key: jax.Array):
        node_mask_f = template.node_mask
        update_mask = type_mask(template.node_type, cfg.types_updated) & node_mask_f
        noisy_mask = type_mask(template.node_type, cfg.types_noisy) & node_mask_f

        dt = times[t + 1] - times[t]
        u: Dict[str, jax.Array] = {}
        targets_raw: Dict[str, jax.Array] = {}
        keys = jax.random.split(key, max(len(spec.target_fields), 1))
        for i, f in enumerate(spec.fields):
            frame = jax.lax.dynamic_index_in_dim(fields[f], t, 0, keepdims=False)
            if f in spec.target_fields:
                ti = spec.target_fields.index(f)
                nxt = jax.lax.dynamic_index_in_dim(fields[f], t + 1, 0, keepdims=False)
                noise = cfg.sigma(ti) * jax.random.normal(keys[ti], frame.shape,
                                                          frame.dtype)
                frame = frame + noise * noisy_mask[:, None]
                if spec.mode(ti) == "absolute":
                    # value head (e.g. stress): predict the next value itself
                    targets_raw[f] = nxt
                else:
                    targets_raw[f] = (nxt - frame) / dt
            u[f] = frame

        # normalizer accumulation (the trainmode side effect of the reference's
        # normalizer calls in build_graph / o_norm); under sync_axis only the
        # per-step deltas cross the mesh (repeat-safe — see
        # normalizers.cross_replica_sync)
        node_norms = dict(state.norm.node)
        for f in spec.fields:
            node_norms[f] = N.accumulate_synced(node_norms[f], u[f],
                                                node_mask_f, cfg.sync_axis)
        out_norms = dict(state.norm.output)
        for f in spec.target_fields:
            out_norms[f] = N.accumulate_synced(out_norms[f], targets_raw[f],
                                               node_mask_f, cfg.sync_axis)
        edge_norm = N.accumulate_synced(state.norm.edge,
                                        template.mesh_edge_features,
                                        template.edge_mask, cfg.sync_axis)
        norm = NormState(edge=edge_norm, node=node_norms, output=out_norms)

        target = jnp.concatenate(
            [norm.output[f](targets_raw[f]) for f in spec.target_fields], axis=-1
        )

        def loss_fn(params):
            graph = assemble_graph(norm, template, u, spec)
            out = apply_mgn(params, graph, cfg.model,
                            row_offsets=template.row_offsets,
                            fused_plan=template.fused_plan)
            return masked_mse(out, target, update_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if cfg.sync_axis is not None:
            grads = jax.lax.pmean(grads, cfg.sync_axis)
            loss = jax.lax.pmean(loss, cfg.sync_axis)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        do_update = state.step >= cfg.norm_steps
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(do_update, x, y), a, b)
        return TrainState(
            params=sel(new_params, state.params),
            opt_state=sel(new_opt, state.opt_state),
            norm=norm,
            step=state.step + 1,
        ), loss

    def train_window(state: TrainState, template: GraphTemplate,
                     fields: Dict[str, jax.Array], times: jax.Array,
                     perm: jax.Array, key: jax.Array):
        def body(carry, t):
            st = carry
            k = jax.random.fold_in(key, st.step)
            st, loss = one_step(template, fields, times, st, t, k)
            return st, loss

        return jax.lax.scan(body, state, perm)

    return train_window


def make_batched_derivative_trainer(
    cfg: DerivativeTrainerConfig, optimizer: optax.GradientTransformation
) -> Callable:
    """Batched variant: B trajectories per optimizer step (single-host data
    parallelism via vmap — the implemented ``batchsize`` the reference only
    documents, /root/reference/src/MeshGraphNets.jl:224).

    ``train_window(state, templates, fields, times, perms, key)`` where every
    GraphTemplate leaf and field array has a leading batch axis B,
    ``perms`` is (delta, B) frame indices, and each scanned step consumes one
    frame from every trajectory (loss averaged, one update).
    """
    spec = cfg.spec

    def prepare(template: GraphTemplate, fields, times, t, key):
        node_mask = template.node_mask
        update_mask = type_mask(template.node_type, cfg.types_updated) & node_mask
        noisy_mask = type_mask(template.node_type, cfg.types_noisy) & node_mask
        dt = times[t + 1] - times[t]
        u, targets_raw = {}, {}
        keys = jax.random.split(key, max(len(spec.target_fields), 1))
        for f in spec.fields:
            frame = jax.lax.dynamic_index_in_dim(fields[f], t, 0, keepdims=False)
            if f in spec.target_fields:
                ti = spec.target_fields.index(f)
                nxt = jax.lax.dynamic_index_in_dim(fields[f], t + 1, 0,
                                                   keepdims=False)
                noise = cfg.sigma(ti) * jax.random.normal(keys[ti], frame.shape)
                frame = frame + noise * noisy_mask[:, None]
                if spec.mode(ti) == "absolute":
                    targets_raw[f] = nxt
                else:
                    targets_raw[f] = (nxt - frame) / dt
            u[f] = frame
        return u, targets_raw, update_mask

    def one_batch_step(templates: GraphTemplate, fields, times,
                       state: TrainState, ts: jax.Array, key: jax.Array):
        b = ts.shape[0]
        keys = jax.random.split(key, b)
        u_b, targets_b, update_mask_b = jax.vmap(
            prepare, in_axes=(0, 0, 0, 0, 0))(templates, fields, times, ts, keys)

        def flat(x):  # (B, N, d) -> (B*N, d)
            return x.reshape(-1, x.shape[-1])

        node_mask_b = templates.node_mask  # (B, N)
        node_norms = dict(state.norm.node)
        for f in spec.fields:
            node_norms[f] = N.accumulate(node_norms[f], flat(u_b[f]),
                                         node_mask_b.reshape(-1))
        out_norms = dict(state.norm.output)
        for f in spec.target_fields:
            out_norms[f] = N.accumulate(out_norms[f], flat(targets_b[f]),
                                        node_mask_b.reshape(-1))
        edge_norm = N.accumulate(
            state.norm.edge, flat(templates.mesh_edge_features),
            templates.edge_mask.reshape(-1))
        norm = NormState(edge=edge_norm, node=node_norms, output=out_norms)

        target_b = jnp.concatenate(
            [jax.vmap(norm.output[f])(targets_b[f]) for f in spec.target_fields],
            axis=-1)

        def loss_fn(params):
            def per_traj(template, u, target, update_mask):
                graph = assemble_graph(norm, template, u, spec)
                # fused_plan=None: a vmapped fused kernel batches its
                # HBM-space operands, which the Pallas TPU lowering rejects
                # (same structural limit fixed in train/solver.py's window
                # loop).  Union batching (make_union_derivative_trainer) is
                # the fused batched path; this vmap variant stays unfused.
                out = apply_mgn(params, graph, cfg.model,
                                row_offsets=template.row_offsets,
                                fused_plan=None)
                m = update_mask.astype(jnp.float32)
                sq = jnp.sum(jnp.sum((out - target) ** 2, -1) * m)
                return sq, jnp.sum(m)

            sqs, cnts = jax.vmap(per_traj)(templates, u_b, target_b,
                                           update_mask_b)
            return jnp.sum(sqs) / jnp.maximum(jnp.sum(cnts), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        do_update = state.step >= cfg.norm_steps
        sel = lambda a, c: jax.tree.map(
            lambda x, y: jnp.where(do_update, x, y), a, c)
        return TrainState(params=sel(new_params, state.params),
                          opt_state=sel(new_opt, state.opt_state),
                          norm=norm, step=state.step + 1), loss

    def train_window(state, templates, fields, times, perms, key):
        def body(st, ts):
            k = jax.random.fold_in(key, st.step)
            return one_batch_step(templates, fields, times, st, ts, k)

        return jax.lax.scan(body, state, perms)

    return train_window


def make_union_derivative_trainer(
    cfg: DerivativeTrainerConfig, optimizer: optax.GradientTransformation,
    node_graph_ids,
) -> Callable:
    """Disjoint-union batching: B graphs concatenated into one (see
    mgn_tpu.data.union) train as a single big graph — one forward/backward
    per step over B frames (one per sub-graph).

    ``node_graph_ids``: (B*N_pad,) int32 mapping node -> sub-graph index.
    ``train_window(state, template, fields, times, perms, key)`` with
    ``perms`` of shape (delta, B).
    """
    spec = cfg.spec
    gids = jnp.asarray(node_graph_ids, jnp.int32)

    def one_step(template: GraphTemplate, fields, times, state: TrainState,
                 ts: jax.Array, key: jax.Array):
        node_mask = template.node_mask
        update_mask = type_mask(template.node_type, cfg.types_updated) & node_mask
        noisy_mask = type_mask(template.node_type, cfg.types_noisy) & node_mask

        tn = jnp.take(ts, gids)  # (B*N,) per-node frame index
        dt = (jnp.take(times, tn + 1) - jnp.take(times, tn))[:, None]

        u, targets_raw = {}, {}
        keys = jax.random.split(key, max(len(spec.target_fields), 1))
        for f in spec.fields:
            arr = fields[f]  # (T, B*N, d)
            frame = jnp.take_along_axis(arr, tn[None, :, None], axis=0)[0]
            if f in spec.target_fields:
                ti = spec.target_fields.index(f)
                nxt = jnp.take_along_axis(arr, (tn + 1)[None, :, None], axis=0)[0]
                noise = cfg.sigma(ti) * jax.random.normal(keys[ti], frame.shape)
                frame = frame + noise * noisy_mask[:, None]
                if spec.mode(ti) == "absolute":
                    targets_raw[f] = nxt
                else:
                    targets_raw[f] = (nxt - frame) / dt
            u[f] = frame

        # per-step deltas psum'd under sync_axis (repeat-safe — see
        # normalizers.cross_replica_sync)
        node_norms = dict(state.norm.node)
        for f in spec.fields:
            node_norms[f] = N.accumulate_synced(node_norms[f], u[f],
                                                node_mask, cfg.sync_axis)
        out_norms = dict(state.norm.output)
        for f in spec.target_fields:
            out_norms[f] = N.accumulate_synced(out_norms[f], targets_raw[f],
                                               node_mask, cfg.sync_axis)
        edge_norm = N.accumulate_synced(state.norm.edge,
                                        template.mesh_edge_features,
                                        template.edge_mask, cfg.sync_axis)
        norm = NormState(edge=edge_norm, node=node_norms, output=out_norms)

        target = jnp.concatenate(
            [norm.output[f](targets_raw[f]) for f in spec.target_fields], -1)

        def loss_fn(params):
            graph = assemble_graph(norm, template, u, spec)
            out = apply_mgn(params, graph, cfg.model,
                            row_offsets=template.row_offsets,
                            fused_plan=template.fused_plan)
            return masked_mse(out, target, update_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if cfg.sync_axis is not None:
            grads = jax.lax.pmean(grads, cfg.sync_axis)
            loss = jax.lax.pmean(loss, cfg.sync_axis)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        do_update = state.step >= cfg.norm_steps
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(do_update, x, y), a, b)
        return TrainState(params=sel(new_params, state.params),
                          opt_state=sel(new_opt, state.opt_state),
                          norm=norm, step=state.step + 1), loss

    def train_window(state, template, fields, times, perms, key):
        def body(st, ts):
            k = jax.random.fold_in(key, st.step)
            return one_step(template, fields, times, st, ts, k)

        return jax.lax.scan(body, state, perms)

    return train_window
