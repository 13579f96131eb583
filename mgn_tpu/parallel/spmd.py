"""SPMD training step: data parallelism × graph (spatial) parallelism.

The multi-chip capability the reference lacks entirely (SURVEY.md §2.3): a
``jax.sharding.Mesh`` with axes ``("data", "graph")``; trajectories shard over
``data``, each trajectory's mesh partitions shard over ``graph``
(:mod:`mgn_tpu.parallel.partition`).  One jitted ``shard_map`` train step:

- frames are sampled **host-side** (the batch carries only the ``t`` and
  ``t+1`` frames, not full time stacks),
- per-shard noise + feature assembly, vmapped over the local batch,
- sharded Encode-Process-Decode forward with the boundary-halo exchange and
  interior/boundary overlap split when the plan provides them
  (:mod:`mgn_tpu.parallel.halo`), falling back to activation all-gather,
- loss/gradient ``psum`` over both axes, identical optimizer update on every
  device, online-normalizer accumulators ``psum``-synced (exact equality of
  statistics across shards).

This also implements the reference's documented-but-unimplemented
``batchsize`` (/root/reference/src/MeshGraphNets.jl:224).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
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
    """One SPMD step's worth of data.  Leading axes: (B, P, ...).

    Frames are pre-sampled on the host: ``fields_t``/``fields_tp1`` hold the
    input frame and its successor only (no (T, ...) stacks shipped to
    devices — round-1 weak item 9).
    """

    node_type_onehot: Any  # (B, P, N_p, T)
    mesh_edge_features: Any  # (B, P, E_p, D+1)
    senders_global: Any  # (B, P, E_p)
    receivers_local: Any  # (B, P, E_p)
    node_mask: Any  # (B, P, N_p)
    edge_mask: Any  # (B, P, E_p)
    node_type: Any  # (B, P, N_p)
    fields_t: Dict[str, Any]  # each (B, P, N_p, dim) — frame t
    fields_tp1: Dict[str, Any]  # each (B, P, N_p, dim) — frame t+1
    dtv: Any  # (B,) f32 — times[t+1] - times[t] per trajectory
    # halo exchange plan (optional; all-gather fallback when absent)
    halo_serve: Any = None  # (B, P, P, H)
    senders_halo: Any = None  # (B, P, E_p)
    row_offsets_int: Any = None  # (B, P, N_p+1)
    row_offsets_bnd: Any = None  # (B, P, N_p+1)
    # fused-kernel banding plans (optional; banded/XLA fallback when absent)
    fused_rel_s: Any = None  # (B, P, C, chunk)
    fused_rel_r: Any = None  # (B, P, C, chunk)
    fused_starts_s: Any = None  # (B, P, C)
    fused_starts_r: Any = None  # (B, P, C)

    def tree(self) -> Dict[str, Any]:
        return {k: v for k, v in dataclasses.asdict(self).items()
                if v is not None}


def batch_from_partitioned(
    ptemplates: list[PartitionedTemplate],
    fields_list: list[Dict[str, np.ndarray]],  # per traj: {f: (T, N, dim)} UNpartitioned
    times_list: list[np.ndarray],
    frames: np.ndarray,
) -> Tuple[SpmdBatch, Optional[int], Optional[Tuple[int, int, int, int]]]:
    """Stack partitioned trajectories into an SpmdBatch (host-side).

    Returns ``(batch, boundary_start, fused_static)``: the static
    interior/boundary split index shared by all trajectories' plans (None
    when any lacks it), and the shared fused-plan statics
    ``(band_s, band_r, chunk, ext_nodes)`` (None unless every trajectory
    carries identical ones — force them via ``add_fused_plans``).
    """

    def stack(attr):
        return np.stack([getattr(p, attr) for p in ptemplates])

    frames = np.asarray(frames, np.int64)
    f_t: Dict[str, list] = {}
    f_tp1: Dict[str, list] = {}
    for fname in fields_list[0]:
        f_t[fname], f_tp1[fname] = [], []
        for p, fl, t in zip(ptemplates, fields_list, frames):
            arr = fl[fname]  # (T, N, dim)
            f_t[fname].append(_partition_frame(p, arr[t]))
            f_tp1[fname].append(_partition_frame(p, arr[t + 1]))
    dtv = np.asarray([times[t + 1] - times[t]
                      for times, t in zip(times_list, frames)], np.float32)

    has_halo = all(p.halo_serve is not None for p in ptemplates)
    has_split = has_halo and all(p.boundary_start is not None
                                 for p in ptemplates)
    bs = ptemplates[0].boundary_start if has_split else None
    if has_split and any(p.boundary_start != bs for p in ptemplates):
        raise ValueError("all trajectories must share one boundary_start "
                         "(use shared part buckets)")

    has_fused = has_halo and all(p.fused_rel_s is not None
                                 for p in ptemplates)
    fused_static = None
    if has_fused:
        fused_static = (ptemplates[0].fused_band_s,
                        ptemplates[0].fused_band_r,
                        ptemplates[0].fused_chunk, ptemplates[0].ext_nodes)
        if any((p.fused_band_s, p.fused_band_r, p.fused_chunk,
                p.ext_nodes) != fused_static for p in ptemplates):
            raise ValueError("all trajectories must share fused-plan bands "
                             "(use add_fused_plans force_band_s/force_band_r)")

    return SpmdBatch(
        node_type_onehot=stack("node_type_onehot"),
        mesh_edge_features=stack("mesh_edge_features"),
        senders_global=stack("senders_global"),
        receivers_local=stack("receivers_local"),
        node_mask=stack("node_mask"),
        edge_mask=stack("edge_mask"),
        node_type=stack("node_type"),
        fields_t={k: np.stack(v) for k, v in f_t.items()},
        fields_tp1={k: np.stack(v) for k, v in f_tp1.items()},
        dtv=dtv,
        halo_serve=stack("halo_serve") if has_halo else None,
        senders_halo=stack("senders_halo") if has_halo else None,
        row_offsets_int=stack("row_offsets_int") if has_split else None,
        row_offsets_bnd=stack("row_offsets_bnd") if has_split else None,
        fused_rel_s=stack("fused_rel_s") if has_fused else None,
        fused_rel_r=stack("fused_rel_r") if has_fused else None,
        fused_starts_s=stack("fused_starts_s") if has_fused else None,
        fused_starts_r=stack("fused_starts_r") if has_fused else None,
    ), bs, fused_static


def _partition_frame(p: PartitionedTemplate, frame: np.ndarray) -> np.ndarray:
    """(N, dim) original-order frame -> (P, N_p, dim) padded part layout."""
    n, d = frame.shape
    flat = np.zeros((p.num_parts * p.part_nodes, d), np.float32)
    flat[_global_ids(p, n)] = frame
    return flat.reshape(p.num_parts, p.part_nodes, d)


def _global_ids(p: PartitionedTemplate, n: int) -> np.ndarray:
    """original node id -> padded global id (part * N_p + local slot)."""
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
    boundary_start: Optional[int] = None,
    fused_static: Optional[Tuple[int, int, int, int]] = None,
) -> Callable:
    """Build the jitted SPMD derivative-training step.

    Returns ``step(state, batch_tree, key) -> (state, loss)``; ``batch_tree``
    is ``SpmdBatch.tree()`` with arrays placed according to the mesh.
    ``boundary_start`` is the static interior/boundary split shared by every
    trajectory's halo plan (from ``batch_from_partitioned``);
    ``fused_static = (band_s, band_r, chunk, ext_nodes)`` (same source)
    routes each round through the fused Pallas kernel when the batch carries
    banding plans and ``model_cfg.fused``.
    """
    axes = ("data", "graph")

    def sigma(i):
        return noise_stddevs[i if len(noise_stddevs) > 1 else 0]

    def local_step(state: TrainState, batch: Dict[str, Any], key: jax.Array):
        # shapes here are the per-device shards: (Bl, 1, ...)
        bl = batch["node_type"].shape[0]
        sq = lambda x: x[:, 0]  # (Bl, 1, ...) -> (Bl, ...)
        node_mask = sq(batch["node_mask"])  # (Bl, N_p)
        node_type = sq(batch["node_type"])
        edge_mask = sq(batch["edge_mask"])
        update_mask = type_mask(node_type, types_updated) & node_mask
        noisy_mask = type_mask(node_type, types_noisy) & node_mask
        dtv = batch["dtv"]  # (Bl,)

        u, targets_raw = {}, {}
        keys = jax.random.split(key, max(len(spec.target_fields), 1))
        for f in spec.fields:
            frame = sq(batch["fields_t"][f])  # (Bl, N_p, dim)
            if f in spec.target_fields:
                ti = spec.target_fields.index(f)
                nxt = sq(batch["fields_tp1"][f])
                noise = sigma(ti) * jax.random.normal(keys[ti], frame.shape)
                frame = frame + noise * noisy_mask[..., None]
                targets_raw[f] = (nxt - frame) / dtv[:, None, None]
            u[f] = frame

        # --- normalizer accumulation (whole local batch in one call, psum'd)
        def acc_batched(norm, data, mask):
            return N.accumulate(norm, data.reshape(-1, data.shape[-1]),
                                mask.reshape(-1))

        node_norms = dict(state.norm.node)
        out_norms = dict(state.norm.output)
        for f in spec.fields:
            node_norms[f] = acc_batched(node_norms[f], u[f], node_mask)
        for f in spec.target_fields:
            out_norms[f] = acc_batched(out_norms[f], targets_raw[f], node_mask)
        edge_norm = acc_batched(state.norm.edge,
                                sq(batch["mesh_edge_features"]), edge_mask)
        edge_norm = N.cross_replica_sync(edge_norm, axes)
        node_norms = {k: N.cross_replica_sync(v, axes)
                      for k, v in node_norms.items()}
        out_norms = {k: N.cross_replica_sync(v, axes)
                     for k, v in out_norms.items()}
        norm = NormState(edge=edge_norm, node=node_norms, output=out_norms)

        use_halo = "halo_serve" in batch
        use_split = use_halo and "row_offsets_int" in batch \
            and boundary_start is not None
        use_fused = (use_halo and "fused_rel_s" in batch
                     and fused_static is not None and model_cfg.fused)

        # --- loss over the local shard: vmap over the local batch ------------
        def per_traj_loss(params, args):
            (u_b, tgt_b, upd_m, n_m, e_m, mef, sg, rl, nto,
             hs, sh, roi, rob, frs, frr, fss, fsr) = args
            plan, ext = None, 0
            if use_fused:
                from mgn_tpu.ops.fused import FusedPlan

                band_s, band_r, chunk, ext = fused_static
                plan = FusedPlan(rel_s=frs, rel_r=frr, starts_s=fss,
                                 starts_r=fsr, band_s=band_s, band_r=band_r,
                                 chunk=chunk)
            parts = [norm.node[f](u_b[f]) for f in spec.fields]
            parts.append(norm.node["node_type"](nto))
            nf = jnp.concatenate(parts, -1) * n_m[:, None]
            ef = norm.edge(mef) * e_m[:, None]
            out = apply_mgn_sharded(
                params, nf, ef, sg, rl, n_m, e_m, model_cfg,
                axis_name="graph",
                halo_serve=hs if use_halo else None,
                senders_halo=sh if use_halo else None,
                boundary_start=boundary_start if use_split else None,
                row_offsets_int=roi if use_split else None,
                row_offsets_bnd=rob if use_split else None,
                fused_plan=plan,
                ext_nodes=ext,
            )
            target = jnp.concatenate(
                [norm.output[f](tgt_b[f]) for f in spec.target_fields], -1)
            m = upd_m.astype(jnp.float32)
            return (jnp.sum(jnp.sum((out - target) ** 2, -1) * m),
                    jnp.sum(m))

        vm_args = (
            u, targets_raw, update_mask, node_mask, edge_mask,
            sq(batch["mesh_edge_features"]), sq(batch["senders_global"]),
            sq(batch["receivers_local"]), sq(batch["node_type_onehot"]),
            sq(batch["halo_serve"]) if use_halo else jnp.zeros((bl,)),
            sq(batch["senders_halo"]) if use_halo else jnp.zeros((bl,)),
            sq(batch["row_offsets_int"]) if use_split else jnp.zeros((bl,)),
            sq(batch["row_offsets_bnd"]) if use_split else jnp.zeros((bl,)),
            sq(batch["fused_rel_s"]) if use_fused else jnp.zeros((bl,)),
            sq(batch["fused_rel_r"]) if use_fused else jnp.zeros((bl,)),
            sq(batch["fused_starts_s"]) if use_fused else jnp.zeros((bl,)),
            sq(batch["fused_starts_r"]) if use_fused else jnp.zeros((bl,)),
        )

        def loss_fn(params):
            # lax.map keeps ONE copy of the forward in the HLO regardless of
            # the local batch size (round-1 weak item 2: the Python loop
            # unrolled it linearly in B); collectives inside are legal under
            # shard_map and execute once per element on every shard in step
            sq_sum, cnt = jax.lax.map(
                lambda a: per_traj_loss(params, a), vm_args)
            total_sq, total_cnt = jnp.sum(sq_sum), jnp.sum(cnt)
            global_cnt = jax.lax.psum(total_cnt, axes)
            return total_sq / jnp.maximum(global_cnt, 1.0)

        loss_local, grads = jax.value_and_grad(loss_fn)(state.params)
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

    batch_axes = {
        "node_type_onehot": P(*axes),
        "mesh_edge_features": P(*axes),
        "senders_global": P(*axes),
        "receivers_local": P(*axes),
        "node_mask": P(*axes),
        "edge_mask": P(*axes),
        "node_type": P(*axes),
        "dtv": P("data"),
        "halo_serve": P(*axes),
        "senders_halo": P(*axes),
        "row_offsets_int": P(*axes),
        "row_offsets_bnd": P(*axes),
        "fused_rel_s": P(*axes),
        "fused_rel_r": P(*axes),
        "fused_starts_s": P(*axes),
        "fused_starts_r": P(*axes),
    }

    def step(state, batch_tree, key):
        specs = {k: batch_axes[k] for k in batch_tree if k in batch_axes}
        specs["fields_t"] = {f: P(*axes) for f in batch_tree["fields_t"]}
        specs["fields_tp1"] = {f: P(*axes) for f in batch_tree["fields_tp1"]}
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, batch_tree, key)

    return jax.jit(step)
