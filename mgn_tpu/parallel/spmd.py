"""SPMD training step: data parallelism × graph (spatial) parallelism.

The multi-chip capability the reference lacks entirely (SURVEY.md §2.3): a
``jax.sharding.Mesh`` with axes ``("data", "graph")``; trajectories shard over
``data``, each trajectory's mesh partitions shard over ``graph``
(:mod:`mgn_tpu.parallel.partition`).  One jitted ``shard_map`` train step:

- local feature assembly + noise on each (trajectory, part) shard,
- sharded Encode-Process-Decode forward (activation all-gather over ``graph``
  per processor round, :mod:`mgn_tpu.parallel.halo`),
- loss/gradient ``psum`` over both axes, identical optimizer update on every
  device, online-normalizer accumulators ``psum``-synced (exact equality of
  statistics across shards).

This also implements the reference's documented-but-unimplemented
``batchsize`` (/root/reference/src/MeshGraphNets.jl:224).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mgn_tpu.core import normalizers as N
from mgn_tpu.models.mgn import MGNConfig
from mgn_tpu.parallel.halo import apply_mgn_sharded
from mgn_tpu.parallel.partition import PartitionedTemplate
from mgn_tpu.train.common import FieldSpec, NormState, TrainState, type_mask

__all__ = ["SpmdBatch", "make_spmd_derivative_step", "make_device_mesh",
           "batch_from_partitioned"]


def make_device_mesh(data: int, graph: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data * graph > len(devices):
        raise ValueError(f"mesh {data}x{graph} needs {data*graph} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: data * graph]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))


@dataclasses.dataclass
class SpmdBatch:
    """One SPMD step's worth of data.  Leading axes: (B, P, ...)."""

    node_type_onehot: Any  # (B, P, N_p, T)
    mesh_edge_features: Any  # (B, P, E_p, D+1)
    senders_global: Any  # (B, P, E_p)
    receivers_local: Any  # (B, P, E_p)
    node_mask: Any  # (B, P, N_p)
    edge_mask: Any  # (B, P, E_p)
    node_type: Any  # (B, P, N_p)
    fields: Dict[str, Any]  # each (B, P, T, N_p, dim)
    times: Any  # (B, T)
    frame: Any  # (B,) int32 — frame sampled per trajectory

    def tree(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return d


def batch_from_partitioned(
    ptemplates: list[PartitionedTemplate],
    fields_list: list[Dict[str, np.ndarray]],  # per traj: {f: (T, N, dim)} UNpartitioned
    times_list: list[np.ndarray],
    frames: np.ndarray,
) -> SpmdBatch:
    """Stack partitioned trajectories into an SpmdBatch (host-side)."""

    def stack(attr):
        return np.stack([getattr(p, attr) for p in ptemplates])

    fields = {}
    for f in fields_list[0]:
        per_traj = []
        for p, fl in zip(ptemplates, fields_list):
            arr = fl[f]  # (T, N, dim)
            t_, n_, d_ = arr.shape
            out = np.zeros((p.num_parts, t_, p.part_nodes, d_), np.float32)
            flat = np.zeros((p.num_parts * p.part_nodes, t_, d_), np.float32)
            # scatter real nodes into their padded slots
            part_ids = np.arange(n_)
            gid = _global_ids(p, n_)
            flat[gid] = arr.transpose(1, 0, 2)
            out = flat.reshape(p.num_parts, p.part_nodes, t_, d_).transpose(0, 2, 1, 3)
            per_traj.append(out)
        fields[f] = np.stack(per_traj)  # (B, P, T, N_p, dim)

    return SpmdBatch(
        node_type_onehot=stack("node_type_onehot"),
        mesh_edge_features=stack("mesh_edge_features"),
        senders_global=stack("senders_global"),
        receivers_local=stack("receivers_local"),
        node_mask=stack("node_mask"),
        edge_mask=stack("edge_mask"),
        node_type=stack("node_type"),
        fields=fields,
        times=np.stack(times_list).astype(np.float32),
        frame=np.asarray(frames, np.int32),
    )


def _global_ids(p: PartitionedTemplate, n: int) -> np.ndarray:
    """original node id -> padded global id (part * N_p + local slot)."""
    # perm maps original -> position in the part-contiguous order; convert to
    # padded ids by locating each position inside its part
    counts = p.node_mask.sum(1)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    pos = p.perm[:n]
    part = np.searchsorted(offsets, pos, side="right") - 1
    local = pos - offsets[part]
    return part * p.part_nodes + local


def make_spmd_derivative_step(
    mesh: Mesh,
    model_cfg: MGNConfig,
    spec: FieldSpec,
    optimizer: optax.GradientTransformation,
    noise_stddevs: Tuple[float, ...] = (0.0,),
    types_updated: Tuple[int, ...] = (0, 5),
    types_noisy: Tuple[int, ...] = (0,),
    norm_steps: int = 0,
) -> Callable:
    """Build the jitted SPMD derivative-training step.

    Returns ``step(state, batch_tree, key) -> (state, loss)``; ``batch_tree``
    is ``SpmdBatch.tree()`` with arrays placed according to the mesh.
    """
    axes = ("data", "graph")

    def sigma(i):
        return noise_stddevs[i if len(noise_stddevs) > 1 else 0]

    def local_step(state: TrainState, batch: Dict[str, Any], key: jax.Array):
        # shapes here are the per-device shards: (Bl, 1, ...)
        fields = batch["fields"]
        bl = batch["node_type"].shape[0]

        def per_traj(b):
            sq = lambda x: x[b, 0]
            t = batch["frame"][b]
            node_mask = sq(batch["node_mask"])
            node_type = sq(batch["node_type"])
            update_mask = type_mask(node_type, types_updated) & node_mask
            noisy_mask = type_mask(node_type, types_noisy) & node_mask
            times = batch["times"][b]
            dtv = times[t + 1] - times[t]

            u, targets_raw = {}, {}
            keys = jax.random.split(jax.random.fold_in(key, b),
                                    max(len(spec.target_fields), 1))
            for f in spec.fields:
                arr = fields[f][b, 0]  # (T, N_p, dim)
                frame = jax.lax.dynamic_index_in_dim(arr, t, 0, keepdims=False)
                if f in spec.target_fields:
                    ti = spec.target_fields.index(f)
                    nxt = jax.lax.dynamic_index_in_dim(arr, t + 1, 0,
                                                       keepdims=False)
                    noise = sigma(ti) * jax.random.normal(keys[ti], frame.shape)
                    frame = frame + noise * noisy_mask[:, None]
                    targets_raw[f] = (nxt - frame) / dtv
                u[f] = frame
            return u, targets_raw, update_mask, node_mask, sq(batch["edge_mask"]), b

        # --- normalizer accumulation (summed over local batch, then psum) ----
        node_norms = dict(state.norm.node)
        out_norms = dict(state.norm.output)
        edge_norm = state.norm.edge
        locals_ = [per_traj(b) for b in range(bl)]
        for u, targets_raw, _, node_mask, _, b in locals_:
            for f in spec.fields:
                node_norms[f] = N.accumulate(node_norms[f], u[f], node_mask)
            for f in spec.target_fields:
                out_norms[f] = N.accumulate(out_norms[f], targets_raw[f], node_mask)
            edge_norm = N.accumulate(
                edge_norm, batch["mesh_edge_features"][b, 0],
                batch["edge_mask"][b, 0])
        edge_norm = N.cross_replica_sync(edge_norm, axes)
        node_norms = {k: N.cross_replica_sync(v, axes) for k, v in node_norms.items()}
        out_norms = {k: N.cross_replica_sync(v, axes) for k, v in out_norms.items()}
        norm = NormState(edge=edge_norm, node=node_norms, output=out_norms)

        # --- loss over the local shard ---------------------------------------
        def local_loss(params):
            total_sq = 0.0
            total_cnt = 0.0
            for u, targets_raw, update_mask, node_mask, edge_mask, b in locals_:
                parts = [norm.node[f](u[f]) for f in spec.fields]
                parts.append(norm.node["node_type"](
                    batch["node_type_onehot"][b, 0]))
                nf = jnp.concatenate(parts, -1) * node_mask[:, None]
                ef = norm.edge(batch["mesh_edge_features"][b, 0]) \
                    * edge_mask[:, None]
                out = apply_mgn_sharded(
                    params, nf, ef,
                    batch["senders_global"][b, 0], batch["receivers_local"][b, 0],
                    node_mask, edge_mask, model_cfg, axis_name="graph",
                )
                target = jnp.concatenate(
                    [norm.output[f](targets_raw[f]) for f in spec.target_fields],
                    -1)
                m = update_mask.astype(jnp.float32)
                total_sq += jnp.sum(jnp.sum((out - target) ** 2, -1) * m)
                total_cnt += jnp.sum(m)
            global_cnt = jax.lax.psum(total_cnt, axes)
            return total_sq / jnp.maximum(global_cnt, 1.0)

        loss_local, grads = jax.value_and_grad(local_loss)(state.params)
        grads = jax.lax.psum(grads, axes)
        loss = jax.lax.psum(loss_local, axes)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        do_update = state.step >= norm_steps
        sel = lambda a, c: jax.tree.map(
            lambda x, y: jnp.where(do_update, x, y), a, c)
        new_state = TrainState(
            params=sel(new_params, state.params),
            opt_state=sel(new_opt, state.opt_state),
            norm=norm,
            step=state.step + 1,
        )
        return new_state, loss

    batch_specs = {
        "node_type_onehot": P(*axes),
        "mesh_edge_features": P(*axes),
        "senders_global": P(*axes),
        "receivers_local": P(*axes),
        "node_mask": P(*axes),
        "edge_mask": P(*axes),
        "node_type": P(*axes),
        "fields": None,  # filled below
        "times": P("data"),
        "frame": P("data"),
    }

    def step(state, batch_tree, key):
        specs = dict(batch_specs)
        specs["fields"] = {f: P(*axes) for f in batch_tree["fields"]}
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, batch_tree, key)

    return jax.jit(step)
