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

from mgn_tpu.models.mlp import apply_mlp, apply_mlp_parts
from mgn_tpu.models.mgn import MGNConfig
from mgn_tpu.ops.segment import segment_sum

__all__ = ["apply_mgn_sharded", "apply_mgn_sharded_deep"]


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
    halo_serve: Optional[jax.Array] = None,  # (P, H) this part's serve slots
    senders_halo: Optional[jax.Array] = None,  # (E_p,) extended-table indices
    boundary_start: Optional[int] = None,  # static: boundary edges at [bs:]
    row_offsets_int: Optional[jax.Array] = None,  # (N_p+1,) CSR over [0:bs)
    row_offsets_bnd: Optional[jax.Array] = None,  # (N_p+1,) CSR over [bs:)
    fused_plan: Optional[Any] = None,  # FusedPlan over the extended table
    ext_nodes: int = 0,  # static extended-table rows (partition.ext_nodes)
) -> jax.Array:
    """Per-shard forward pass; call inside shard_map over ``axis_name``.

    Exchange modes per processor round:

    - **all-gather** (default): gather every part's latents, index globally.
    - **halo** (``halo_serve``/``senders_halo`` given, see
      ``partition.add_halo_plan``): exchange only the boundary latents each
      neighbor actually references via one ``all_to_all`` — bytes on the wire
      drop from ``P*N_p*L`` to ``P*H*L`` per round.
    - **halo + overlap** (``boundary_start`` also given): edges are
      pre-split so the tail ``[boundary_start:]`` holds all remote-sender
      edges; the interior edge-MLP + scatter-add has no data dependency on
      the ``all_to_all``, so XLA's async-collective scheduler runs the
      exchange and the interior compute concurrently (SURVEY.md §2.3
      overlap engine) — boundary messages are added when the halo lands.
    - **halo + fused kernel** (``fused_plan``/``ext_nodes`` given and
      ``cfg.fused``): each round exchanges the halo, builds the extended
      ``[own ; halo ; pad]`` latent table, and runs the entire round (banded
      gathers, edge MLP, scatter-add, node MLP) as ONE per-round call of the
      fused VMEM-resident Pallas kernel (``ops.fused``, ``return_edges``) —
      no per-round HBM intermediates.  Takes precedence over the
      interior/boundary overlap split (the kernel needs the full table
      before its edge stage; measured single-chip the fused round is ~2x
      the banded one, which outweighs hiding the small ``all_to_all``).

    Returns the local shard of decoded outputs (N_p, output_dim) float32.
    """
    dt = cfg.compute_dtype
    n_p = node_features.shape[0]
    edge_valid = edge_mask.astype(dt)[:, None]
    use_halo = halo_serve is not None and senders_halo is not None
    use_fused = (use_halo and fused_plan is not None and ext_nodes > 0
                 and cfg.fused)
    use_split = use_halo and boundary_start is not None and not use_fused

    v = apply_mlp(params["node_encoder"], node_features, dt)
    e = apply_mlp(params["edge_encoder"], edge_features, dt) * edge_valid

    def halo_recv(v):
        send = jnp.take(v, halo_serve.reshape(-1), axis=0)  # (P*H, L)
        p = halo_serve.shape[0]
        send = send.reshape(p, halo_serve.shape[1], -1)
        recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
        # recv[q] = latents this part requested from part q
        return recv.reshape(-1, v.shape[1])

    def exchange(v):
        if use_halo:
            ext = jnp.concatenate([v, halo_recv(v)], axis=0)
            return jnp.take(ext, senders_halo, axis=0)
        v_full = jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
        return jnp.take(v_full, senders_global, axis=0)

    if use_fused:
        from mgn_tpu.ops.fused import fused_process

        interpret = jax.default_backend() != "tpu"
        pad = ext_nodes - n_p - halo_serve.shape[0] * halo_serve.shape[1]

        def fused_round(carry, block_params):
            v, e = carry
            recv = halo_recv(v)
            parts = [v, recv]
            if pad:
                parts.append(jnp.zeros((pad, v.shape[1]), v.dtype))
            ext = jnp.concatenate(parts, axis=0)
            bp1 = jax.tree.map(lambda x: x[None], block_params)
            vext, e = fused_process(
                bp1, ext, e, fused_plan, senders_halo, receivers_local,
                edge_valid, 1, interpret=interpret,
                kernel_bwd=cfg.fused_backward, return_edges=True)
            return (vext[:n_p], e), None

        (v, e), _ = jax.lax.scan(fused_round, (v, e), params["processor"])
        out = apply_mlp(params["decoder"], v, dt)
        return out.astype(jnp.float32)

    def block(carry, block_params):
        v, e = carry
        if use_split:
            bs = boundary_start
            # issue the exchange first; interior compute below does not
            # depend on it, so the collective flies while the MXU works
            recv = halo_recv(v)
            vs_i = jnp.take(v, senders_halo[:bs], axis=0)
            vr_i = jnp.take(v, receivers_local[:bs], axis=0)
            msg_i = apply_mlp_parts(block_params["edge_mlp"],
                                    (e[:bs], vs_i, vr_i), dt) * edge_valid[:bs]
            agg = segment_sum(msg_i, receivers_local[:bs], n_p,
                              row_offsets=row_offsets_int,
                              backend=cfg.aggregation_backend)
            vs_b = jnp.take(recv, senders_halo[bs:] - n_p, axis=0)
            vr_b = jnp.take(v, receivers_local[bs:], axis=0)
            msg_b = apply_mlp_parts(block_params["edge_mlp"],
                                    (e[bs:], vs_b, vr_b), dt) * edge_valid[bs:]
            agg = (agg + segment_sum(msg_b, receivers_local[bs:], n_p,
                                     row_offsets=row_offsets_bnd,
                                     backend=cfg.aggregation_backend)
                   ).astype(dt)
            msg = jnp.concatenate([msg_i, msg_b], axis=0)
        else:
            vs = exchange(v)
            vr = jnp.take(v, receivers_local, axis=0)
            msg = apply_mlp_parts(block_params["edge_mlp"], (e, vs, vr), dt)
            msg = msg * edge_valid
            agg = segment_sum(
                msg, receivers_local, n_p, row_offsets=row_offsets,
                backend=cfg.aggregation_backend,
            ).astype(dt)
        upd = apply_mlp_parts(block_params["node_mlp"], (v, agg), dt)
        return (v + upd, e + msg), None

    (v, e), _ = jax.lax.scan(block, (v, e), params["processor"])
    out = apply_mlp(params["decoder"], v, dt)
    return out.astype(jnp.float32)


def apply_mgn_sharded_deep(
    params: Dict[str, Any],
    node_features: jax.Array,  # (N_p, F_n) own-shard raw node features
    ext_edge_features: jax.Array,  # (E_ext, F_e) normalized deep-table features
    cfg: MGNConfig,
    axis_name: str,
    src: jax.Array,        # (N_ext,) -> concat([own; recv; zero-row])
    own_pos: jax.Array,    # (N_p,)
    serve: jax.Array,      # (P, H)
    senders: jax.Array,    # (E_ext,) ext-local
    receivers: jax.Array,  # (E_ext,) ext-local, receiver-sorted
    edge_mask: jax.Array,  # (E_ext,)
    rows: Optional[jax.Array],  # (N_ext+1,) CSR (XLA path)
    rounds: int,           # processor rounds per exchange (k)
    fused_plan: Optional[Any] = None,  # FusedPlan over the ext table
    stages: Optional[Any] = None,  # telescoped shrinking stages (see below)
    stage0_rounds: int = 0,
) -> jax.Array:
    """k-deep ghost-zone forward (see ``partition.DeepHaloPlan``): ONE halo
    exchange per ``rounds`` processor rounds, each segment running entirely
    locally over the extended node/edge tables — for ``rounds == mps`` this
    is literally the single-chip monolithic fused kernel per shard plus one
    exchange, versus the per-round path's ``mps`` exchanges + launches
    (round-3 verdict weak item 1: 2.5x step overhead at mesh (1,1)).

    Owned rows are exact by the ghost-zone argument (halo node at distance d
    stays exact for depth - d rounds; edge latents carry locally, hence
    depth = 2k-1 for multi-segment schedules).  Redundant halo compute is
    the price; comm rounds drop mps -> mps/rounds.

    ``stages``: telescoped shrinking tables (``partition.TelescopeStage``
    built by ``add_deep_halo_plan(telescope=...)``): after ``stage0_rounds``
    rounds on the main table, each stage gathers the still-relevant nested
    sub-table (``nremap``/``eremap``) and runs its rounds there — the
    redundant ghost compute averaged over rounds drops to ~half at zero
    extra communication.  Each element is a dict of per-shard arrays
    ``{nremap, eremap, own_pos, senders, receivers, edge_mask, rows, plan,
    rounds}`` (``plan`` a FusedPlan or None).
    """
    dt = cfg.compute_dtype
    n_p = node_features.shape[0]
    edge_valid = edge_mask.astype(dt)[:, None]

    v = apply_mlp(params["node_encoder"], node_features, dt)
    e = apply_mlp(params["edge_encoder"], ext_edge_features, dt) * edge_valid

    def halo_recv(v):
        send = jnp.take(v, serve.reshape(-1), axis=0)
        p = serve.shape[0]
        send = send.reshape(p, serve.shape[1], -1)
        recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
        return recv.reshape(-1, v.shape[1])

    proc = params["processor"]
    mps = jax.tree.leaves(proc)[0].shape[0]
    if mps % rounds != 0:
        raise ValueError(f"rounds {rounds} must divide mps {mps}")
    n_seg = mps // rounds
    seg_params = jax.tree.map(
        lambda x: x.reshape((n_seg, rounds) + x.shape[1:]), proc)

    n_ext = src.shape[0]
    interpret = jax.default_backend() != "tpu"

    def run_rounds(x, e2, bp_r, n_rounds, snd, rcv, ev, rws, plan):
        if plan is not None and cfg.fused:
            from mgn_tpu.ops.fused import fused_process

            return fused_process(
                bp_r, x, e2, plan, snd, rcv, ev, n_rounds,
                interpret=interpret, kernel_bwd=cfg.fused_backward,
                return_edges=True)

        def rnd(c, rp):
            x2, e3 = c
            vs = jnp.take(x2, snd, axis=0)
            vr = jnp.take(x2, rcv, axis=0)
            msg = apply_mlp_parts(rp["edge_mlp"], (e3, vs, vr), dt) * ev
            agg = segment_sum(msg, rcv, x2.shape[0], row_offsets=rws,
                              backend=cfg.aggregation_backend).astype(dt)
            upd = apply_mlp_parts(rp["node_mlp"], (x2, agg), dt)
            return (x2 + upd, e3 + msg), None

        (x, e2), _ = jax.lax.scan(rnd, (x, e2), bp_r)
        return x, e2

    def segment(carry, bp):
        v, e = carry
        recv = halo_recv(v)
        tbl = jnp.concatenate(
            [v, recv, jnp.zeros((1, v.shape[1]), v.dtype)], axis=0)
        ext = jnp.take(tbl, src, axis=0)
        if not stages:
            ext, e = run_rounds(ext, e, bp, rounds, senders, receivers,
                                edge_valid, rows, fused_plan)
            return (jnp.take(ext, own_pos, axis=0), e), None
        # telescoped: shrink to the still-relevant nested table after each
        # stage; edge latents live in the stage-0 buffer and are gathered /
        # scattered through ``eremap`` (pad slots target an out-of-range
        # index -> fill 0 on gather, dropped on scatter)
        sl = lambda x, a, r: x[a:a + r]
        ext, e = run_rounds(
            ext, e, jax.tree.map(lambda x: sl(x, 0, stage0_rounds), bp),
            stage0_rounds, senders, receivers, edge_valid, rows, fused_plan)
        a = stage0_rounds
        last_own = own_pos
        for st in stages:
            r_s = int(st["rounds"])
            bp_s = jax.tree.map(lambda x: sl(x, a, r_s), bp)
            ext = jnp.take(ext, st["nremap"], axis=0)
            e_sub = jnp.take(e, st["eremap"], axis=0, mode="fill",
                             fill_value=0)
            ev_s = st["edge_mask"].astype(dt)[:, None]
            ext, e_sub = run_rounds(ext, e_sub, bp_s, r_s, st["senders"],
                                    st["receivers"], ev_s, st["rows"],
                                    st.get("plan"))
            e = e.at[st["eremap"]].set(e_sub, mode="drop")
            a += r_s
            last_own = st["own_pos"]
        return (jnp.take(ext, last_own, axis=0), e), None

    (v, e), _ = jax.lax.scan(segment, (v, e), seg_params)
    out = apply_mlp(params["decoder"], v, dt)
    return out.astype(jnp.float32)
