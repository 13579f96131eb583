"""Graph-parallel (sharded) multi-edge-set family: cloth / world-edge models.

Removes the round-4 "known limit" (docs/parity.md §2.3): world edges are
rebuilt per frame in WORLD space and cross parts arbitrarily, so they cannot
use the static mesh-edge halo plans.  The TPU-native answer is an
all-gather schedule specialised to the family's actual sizes:

- cloth meshes are small (FlagSimple ~1.6k nodes), so a per-round
  ``all_gather`` of node latents is ``P * N_p * L`` bf16 bytes (~0.4 MB at
  flag scale) — ICI noise next to the edge/node MLP matmuls; both edge sets
  index senders out of the gathered table and keep receivers local,
- world edges are built PER SHARD each frame from an all-gathered position
  table: one (N_tot, N_p) Gram-matmul distance block per shard (the MXU
  rewrite of ``core.graph.build_world_edges``, round-4
  ``WORLDEDGES_probe.json``), thresholded and compacted with one ``top_k``
  into a fixed per-shard capacity — every shard owns the world edges whose
  RECEIVER is local, senders stay global indices,
- normalizer accumulation crosses the mesh with
  ``normalizers.accumulate_synced`` and losses/grads are ``psum``'d, exactly
  like the mesh-only SPMD trainer (``parallel.spmd``).

The reference has no world edges and no parallelism to match (SURVEY.md
§2.3); the single-device fast path (``models/mgn_multi`` fused kernel +
``train/cloth``) remains the speed king at flag scale — this module is the
scale-out path for cloth meshes that outgrow one chip.

Host-side entry points: :func:`partition_cloth`, :func:`cloth_static_batch`,
:func:`partition_field_stack` / :func:`unpermute_field_stack`,
:func:`make_sharded_cloth_trainer`, :func:`make_sharded_cloth_rollout`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mgn_tpu.core import normalizers as N
from mgn_tpu.models.mlp import apply_mlp, apply_mlp_parts
from mgn_tpu.models.mgn_multi import MultiMGNConfig
from mgn_tpu.ops.segment import segment_sum
from mgn_tpu.parallel.mesh import compiler_options_for
from mgn_tpu.parallel.partition import PartitionedTemplate, partition_template
from mgn_tpu.train.cloth import ClothConfig
from mgn_tpu.train.common import NormState, TrainState, type_mask

__all__ = [
    "partition_cloth", "cloth_static_batch", "partition_field_stack",
    "unpermute_field_stack", "build_world_edges_sharded",
    "apply_cloth_sharded", "make_sharded_cloth_trainer",
    "make_sharded_cloth_rollout",
]


# --------------------------------------------------------------------------
# host-side partitioning
# --------------------------------------------------------------------------

def partition_cloth(mesh_pos: np.ndarray, node_type: np.ndarray,
                    senders: np.ndarray, receivers: np.ndarray,
                    num_parts: int, type_min: int = 0, type_max: int = 6,
                    **kw) -> PartitionedTemplate:
    """Partition the STATIC mesh-edge structure (coordinate bisection over
    the 2-D reference mesh, receiver-owned edges) — world edges are dynamic
    and built on device per frame, so they need no host plan."""
    return partition_template(mesh_pos, node_type, senders, receivers,
                              num_parts, type_min=type_min, type_max=type_max,
                              **kw)


def _gids(pt: PartitionedTemplate, n: int) -> np.ndarray:
    from mgn_tpu.parallel.spmd import _global_ids

    return _global_ids(pt, n)


def partition_field_stack(pt: PartitionedTemplate, arr: np.ndarray
                          ) -> np.ndarray:
    """(T, N, d) original node order -> (T, P, N_p, d) padded shards."""
    arr = np.asarray(arr)
    t, n = arr.shape[0], arr.shape[1]
    out = np.zeros((t, pt.num_parts * pt.part_nodes) + arr.shape[2:],
                   arr.dtype)
    out[:, _gids(pt, n)] = arr
    return out.reshape((t, pt.num_parts, pt.part_nodes) + arr.shape[2:])


def unpermute_field_stack(pt: PartitionedTemplate, arr: np.ndarray, n: int
                          ) -> np.ndarray:
    """(T, P, N_p, d) shards -> (T, N, d) original node order."""
    arr = np.asarray(arr)
    flat = arr.reshape((arr.shape[0], pt.num_parts * pt.part_nodes)
                       + arr.shape[3:])
    return flat[:, _gids(pt, n)]


def cloth_static_batch(pt: PartitionedTemplate) -> Dict[str, jax.Array]:
    """Per-part static structure as a device-ready tree (leading axis P)."""
    return {
        "onehot": jnp.asarray(pt.node_type_onehot),
        "mef": jnp.asarray(pt.mesh_edge_features),
        "sg": jnp.asarray(pt.senders_global),
        "rl": jnp.asarray(pt.receivers_local),
        "rows": jnp.asarray(pt.row_offsets),
        "node_mask": jnp.asarray(pt.node_mask),
        "edge_mask": jnp.asarray(pt.edge_mask),
        "node_type": jnp.asarray(pt.node_type),
    }


_BATCH_SPECS = {k: P("graph") for k in (
    "onehot", "mef", "sg", "rl", "rows", "node_mask", "edge_mask",
    "node_type")}


# --------------------------------------------------------------------------
# device-side pieces (call inside shard_map over ``axis_name``)
# --------------------------------------------------------------------------

def build_world_edges_sharded(
    wp_local: jax.Array,      # (N_p, 3) this shard's world positions
    mask_local: jax.Array,    # (N_p,) bool
    radius: float,
    capacity: int,            # PER-SHARD world-edge capacity
    axis_name: str,
    exclude_senders: Optional[jax.Array] = None,  # (E_p,) global padded ids
    exclude_receivers: Optional[jax.Array] = None,  # (E_p,) local ids
    wp_full: Optional[jax.Array] = None,   # optional pre-gathered (N_tot, 3)
    mask_full: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-shard world-edge construction: same semantics as the single-chip
    ``core.graph.build_world_edges`` (centered Gram distances on the MXU,
    radius threshold, mesh-edge + self exclusion, ``top_k`` compaction) but
    each shard scans the (N_tot, N_p) block whose RECEIVERS it owns.

    Returns ``(senders_global, receivers_local, mask)`` each ``(capacity,)``;
    senders index the gathered ``[part 0 ; part 1 ; ...]`` node table.  The
    union over shards equals the single-chip edge set whenever neither side
    overflows its capacity (equality-tested on the virtual mesh).
    """
    n_p = wp_local.shape[0]
    p_idx = jax.lax.axis_index(axis_name)
    if wp_full is None:
        wp_full = jax.lax.all_gather(wp_local, axis_name, axis=0, tiled=True)
    if mask_full is None:
        mask_full = jax.lax.all_gather(mask_local, axis_name, axis=0,
                                       tiled=True)
    n_tot = wp_full.shape[0]

    # identical centering to the single-chip builder: masked mean over the
    # FULL node set (guards the |a|^2+|b|^2-2ab f32 cancellation)
    wf = wp_full.astype(jnp.float32)
    denom = jnp.maximum(jnp.mean(mask_full.astype(jnp.float32)), 1e-9)
    center = (jnp.mean(jnp.where(mask_full[:, None], wf, 0.0), axis=0,
                       keepdims=True) / denom)
    wf = wf - center
    wl = jnp.take(wf, p_idx * n_p + jnp.arange(n_p), axis=0)

    sqf = jnp.sum(wf * wf, axis=-1)
    sql = jnp.sum(wl * wl, axis=-1)
    d2 = sqf[:, None] + sql[None, :] - 2.0 * (wf @ wl.T)  # (N_tot, N_p) MXU
    valid = mask_full[:, None] & mask_local[None, :]
    gcol = p_idx * n_p + jnp.arange(n_p)
    self_ex = jnp.arange(n_tot)[:, None] == gcol[None, :]
    hit = (d2 < radius * radius) & valid & ~self_ex
    if exclude_senders is not None:
        # padded edge slots point at a padded (masked) local receiver, so
        # blanking them is a no-op — same argument as the single-chip path
        hit = hit.at[exclude_senders, exclude_receivers].set(False)

    # the int32 ranking key wraps (and collides with the sentinel) once
    # n_tot * n_p reaches 2^31 — shapes are static, so guard host-side
    # (round-4 advisor finding 4; same bound as the single-chip builder)
    assert n_tot * n_p < 2 ** 31, (
        f"world-edge top_k ranking key overflows int32: n_tot*n_p = "
        f"{n_tot}*{n_p} >= 2^31; shard the mesh further or tile the query")
    flat = hit.reshape(-1)
    key = jnp.where(flat, -jnp.arange(n_tot * n_p, dtype=jnp.int32),
                    jnp.iinfo(jnp.int32).min)
    k = min(capacity, n_tot * n_p)
    _, idx = jax.lax.top_k(key, k)
    if k < capacity:
        idx = jnp.concatenate([idx, jnp.zeros((capacity - k,), idx.dtype)])
    senders = (idx // n_p).astype(jnp.int32)
    receivers = (idx % n_p).astype(jnp.int32)
    count = jnp.minimum(jnp.sum(flat), capacity)
    mask = jnp.arange(capacity) < count
    return (jnp.where(mask, senders, 0), jnp.where(mask, receivers, 0), mask)


def apply_cloth_sharded(
    params: Dict[str, Any],
    node_features: jax.Array,   # (N_p, F_n) local, normalized
    mesh_ef: jax.Array,         # (E_p, F_m) local, normalized
    world_ef: jax.Array,        # (W_p, F_w) local, normalized
    sg: jax.Array,              # (E_p,) mesh senders, global padded ids
    rl: jax.Array,              # (E_p,) mesh receivers, local
    edge_mask: jax.Array,       # (E_p,)
    row_offsets: jax.Array,     # (N_p+1,) CSR over mesh edges
    ws: jax.Array,              # (W_p,) world senders, global padded ids
    wr: jax.Array,              # (W_p,) world receivers, local
    wmask: jax.Array,           # (W_p,)
    cfg: MultiMGNConfig,
    axis_name: str,
) -> jax.Array:
    """Sharded two-edge-set Encode-Process-Decode forward; the distributed
    twin of ``models.mgn_multi.apply_mgn_multi``'s XLA block (same math:
    per-set edge update -> scatter-add -> node update on ``[v, agg_mesh,
    agg_world]``, residuals everywhere).  One latent ``all_gather`` per
    round serves both edge sets' sender gathers."""
    dt = cfg.compute_dtype
    n_p = node_features.shape[0]
    emaskf = edge_mask.astype(dt)[:, None]
    wmaskf = wmask.astype(dt)[:, None]

    v = apply_mlp(params["node_encoder"], node_features, dt)
    e_m = apply_mlp(params["edge_encoders"][0], mesh_ef, dt) * emaskf
    e_w = apply_mlp(params["edge_encoders"][1], world_ef, dt) * wmaskf

    def block(carry, bp):
        v, e_m, e_w = carry
        v_full = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
        vs_m = jnp.take(v_full, sg, axis=0)
        vr_m = jnp.take(v, rl, axis=0)
        msg_m = apply_mlp_parts(bp["edge_mlps"][0], (e_m, vs_m, vr_m),
                                dt) * emaskf
        agg_m = segment_sum(msg_m, rl, n_p, row_offsets=row_offsets,
                            backend=cfg.aggregation_backend).astype(dt)
        vs_w = jnp.take(v_full, ws, axis=0)
        vr_w = jnp.take(v, wr, axis=0)
        msg_w = apply_mlp_parts(bp["edge_mlps"][1], (e_w, vs_w, vr_w),
                                dt) * wmaskf
        agg_w = segment_sum(msg_w, wr, n_p,
                            backend=cfg.aggregation_backend).astype(dt)
        upd = apply_mlp_parts(bp["node_mlp"], (v, agg_m, agg_w), dt)
        return (v + upd, e_m + msg_m, e_w + msg_w), None

    (v, _, _), _ = jax.lax.scan(block, (v, e_m, e_w), params["processor"])
    out = apply_mlp(params["decoder"], v, dt)
    return out.astype(jnp.float32)


# --------------------------------------------------------------------------
# sharded trainer / rollout (train/cloth twins)
# --------------------------------------------------------------------------

def _frame_features(batch, cur, sg, rl, axis_name):
    """Per-frame raw (un-normalized) mesh-edge features + gathered table."""
    wp_full = jax.lax.all_gather(cur, axis_name, axis=0, tiled=True)
    rel_w = jnp.take(wp_full, sg, axis=0) - jnp.take(cur, rl, axis=0)
    mesh_raw = jnp.concatenate(
        [batch["mef"], rel_w, jnp.linalg.norm(rel_w, axis=-1, keepdims=True)],
        -1)
    return wp_full, mesh_raw


def _world_features(wp_full, cur, ws, wr, wm):
    rel = (jnp.take(wp_full, ws, axis=0) - jnp.take(cur, wr, axis=0)
           ) * wm[:, None]
    return jnp.concatenate(
        [rel, jnp.linalg.norm(rel, axis=-1, keepdims=True)], -1)


def make_sharded_cloth_trainer(
    mesh: Mesh, cfg: ClothConfig, optimizer: optax.GradientTransformation,
    world_capacity_part: int,
) -> Callable:
    """Jitted sharded cloth training window over a graph-axis mesh.

    ``step(state, batch, wp_stack, times, perm, key) -> (state, losses)``:
    ``batch`` from :func:`cloth_static_batch`, ``wp_stack`` a
    ``(T, P, N_p, 3)`` partitioned world-position stack
    (:func:`partition_field_stack`), ``perm`` host-sampled frame indices in
    ``[1, T-1)``.  Mirrors ``train/cloth.make_cloth_trainer`` exactly —
    second-order targets, per-frame world edges, masked input noise, synced
    online normalizers, norm-warmup gating — with losses/grads ``psum``'d
    over the graph axis."""
    axis = "graph"

    def local_window(state: TrainState, batch, wp_stack, times, perm, key):
        # shard_map keeps the sharded axis as size 1 inside the block
        batch = {k: v[0] for k, v in batch.items()}
        wp_stack = wp_stack[:, 0]
        node_mask = batch["node_mask"]
        update_mask = type_mask(batch["node_type"],
                                cfg.types_updated) & node_mask
        noisy_mask = type_mask(batch["node_type"],
                               cfg.types_noisy) & node_mask
        sg, rl = batch["sg"], batch["rl"]

        def one_step(st: TrainState, t):
            dt_t = times[t] - times[t - 1]
            idx = lambda off: jax.lax.dynamic_index_in_dim(
                wp_stack, t + off, 0, keepdims=False)
            prev, cur, nxt = idx(-1), idx(0), idx(1)
            # same key schedule as the single-device trainer — fold_in by
            # GLOBAL step (train/cloth.py train_window), then by the axis
            # index to decorrelate noise across graph shards (round-4
            # advisor finding 3: split-by-window-position diverged from the
            # single-device noise stream)
            k = jax.random.fold_in(key, st.step)
            k_sh = jax.random.fold_in(k, jax.lax.axis_index(axis))
            noise = cfg.noise_stddev * jax.random.normal(k_sh, cur.shape)
            cur = cur + noise * noisy_mask[:, None]

            vel = (cur - prev) / dt_t
            acc = (nxt - 2 * cur + prev) / (dt_t * dt_t)

            node_norms = dict(st.norm.node)
            node_norms["velocity"] = N.accumulate_synced(
                node_norms["velocity"], vel, node_mask, axis)
            out_norms = dict(st.norm.output)
            out_norms["acceleration"] = N.accumulate_synced(
                out_norms["acceleration"], acc, node_mask, axis)

            wp_full, mesh_raw = _frame_features(batch, cur, sg, rl, axis)
            edge_norms = dict(st.norm.edge)
            edge_norms["mesh"] = N.accumulate_synced(
                edge_norms["mesh"], mesh_raw, batch["edge_mask"], axis)
            ws, wr, wm = build_world_edges_sharded(
                cur, node_mask, cfg.world_radius, world_capacity_part, axis,
                exclude_senders=sg, exclude_receivers=rl, wp_full=wp_full)
            world_raw = _world_features(wp_full, cur, ws, wr, wm)
            edge_norms["world"] = N.accumulate_synced(
                edge_norms["world"], world_raw, wm, axis)
            norm = NormState(edge=edge_norms, node=node_norms,
                             output=out_norms)

            target = norm.output["acceleration"](acc)

            def loss_fn(params):
                nf = jnp.concatenate(
                    [norm.node["velocity"](vel),
                     norm.node["node_type"](batch["onehot"])], -1)
                nf = nf * node_mask[:, None]
                mesh_ef = (norm.edge["mesh"](mesh_raw)
                           * batch["edge_mask"][:, None])
                world_ef = norm.edge["world"](world_raw) * wm[:, None]
                out = apply_cloth_sharded(
                    params, nf, mesh_ef, world_ef, sg, rl,
                    batch["edge_mask"], batch["rows"], ws, wr, wm,
                    cfg.model, axis)
                m = update_mask.astype(jnp.float32)
                sq = jnp.sum(jnp.sum((out - target) ** 2, -1) * m)
                cnt = jax.lax.psum(jnp.sum(m), axis)
                return sq / jnp.maximum(cnt, 1.0)

            loss_l, grads = jax.value_and_grad(loss_fn)(st.params)
            grads = jax.lax.psum(grads, axis)
            loss = jax.lax.psum(loss_l, axis)
            updates, new_opt = optimizer.update(grads, st.opt_state,
                                               st.params)
            new_params = optax.apply_updates(st.params, updates)
            do_update = st.step >= cfg.norm_steps
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(do_update, x, y), a, b)
            return TrainState(params=sel(new_params, st.params),
                              opt_state=sel(new_opt, st.opt_state),
                              norm=norm, step=st.step + 1), loss

        return jax.lax.scan(one_step, state, perm)

    fn = shard_map(
        local_window, mesh=mesh,
        in_specs=(P(), _BATCH_SPECS, P(None, "graph"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, compiler_options=compiler_options_for(mesh))


def make_sharded_cloth_rollout(mesh: Mesh, cfg: ClothConfig,
                               world_capacity_part: int) -> Callable:
    """Jitted sharded cloth rollout: ``rollout(params, norm, batch,
    wp_gt (T, P, N_p, 3), times) -> pred (T, P, N_p, 3)`` — semi-implicit
    second-order integration with handle nodes forced from ground truth,
    world edges rebuilt per step from the gathered position table; the
    distributed twin of ``train/cloth.make_cloth_rollout``.  Un-permute the
    result with :func:`unpermute_field_stack`."""
    axis = "graph"

    def local_rollout(params, norm: NormState, batch, wp_gt, times):
        batch = {k: v[0] for k, v in batch.items()}
        wp_gt = wp_gt[:, 0]
        node_mask = batch["node_mask"]
        update_mask = (type_mask(batch["node_type"], cfg.types_updated)
                       & node_mask)[:, None]
        sg, rl = batch["sg"], batch["rl"]

        def step(carry, t):
            prev, cur = carry
            dt_t = times[t] - times[t - 1]
            vel = (cur - prev) / dt_t
            wp_full, mesh_raw = _frame_features(batch, cur, sg, rl, axis)
            ws, wr, wm = build_world_edges_sharded(
                cur, node_mask, cfg.world_radius, world_capacity_part, axis,
                exclude_senders=sg, exclude_receivers=rl, wp_full=wp_full)
            world_raw = _world_features(wp_full, cur, ws, wr, wm)
            nf = jnp.concatenate(
                [norm.node["velocity"](vel),
                 norm.node["node_type"](batch["onehot"])], -1)
            nf = nf * node_mask[:, None]
            mesh_ef = norm.edge["mesh"](mesh_raw) * batch["edge_mask"][:, None]
            world_ef = norm.edge["world"](world_raw) * wm[:, None]
            acc = norm.output["acceleration"].inverse(apply_cloth_sharded(
                params, nf, mesh_ef, world_ef, sg, rl, batch["edge_mask"],
                batch["rows"], ws, wr, wm, cfg.model, axis))
            nxt = 2 * cur - prev + acc * dt_t * dt_t
            gt_next = jax.lax.dynamic_index_in_dim(wp_gt, t + 1, 0,
                                                   keepdims=False)
            nxt = jnp.where(update_mask, nxt, gt_next)
            return (cur, nxt), nxt

        t_idx = jnp.arange(1, wp_gt.shape[0] - 1)
        (_, _), preds = jax.lax.scan(step, (wp_gt[0], wp_gt[1]), t_idx)
        out = jnp.concatenate([wp_gt[:2], preds], axis=0)
        return out[:, None]  # restore the sharded parts axis for out_specs

    fn = shard_map(
        local_rollout, mesh=mesh,
        in_specs=(P(), P(), _BATCH_SPECS, P(None, "graph"), P()),
        out_specs=P(None, "graph"),
        check_vma=False,
    )
    return jax.jit(fn, compiler_options=compiler_options_for(mesh))
