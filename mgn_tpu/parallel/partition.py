"""Spatial graph partitioning for multi-chip message passing.

New capability vs the single-device reference (SURVEY.md §2.3): the mesh-GNN
analogue of tensor/sequence parallelism is partitioning the simulation mesh
across chips.  Host-side, once per trajectory:

- **recursive coordinate bisection** of the nodes (cut-minimizing for
  well-shaped meshes, deterministic, METIS-free),
- node reordering so each part is contiguous, every part padded to the same
  ``N_p`` (SPMD static shapes),
- each edge assigned to its **receiver's** part; senders are kept as global
  (reordered) indices so the device-side gather runs against all-gathered
  latents,
- per-part CSR row offsets over part-local receivers.

The result stacks all per-part arrays on a leading axis that `shard_map`
splits over the ``graph`` mesh axis (see :mod:`mgn_tpu.parallel.halo`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from mgn_tpu.core.graph import (bucket_size, csr_row_offsets,
                                relative_mesh_features)

__all__ = ["PartitionedTemplate", "DeepHaloPlan", "bisect_partition",
           "refine_partition", "partition_template", "add_halo_plan",
           "add_fused_plans", "add_deep_halo_plan", "deep_depth"]


@dataclasses.dataclass
class PartitionedTemplate:
    """Per-part stacked graph structure (leading axis = parts)."""

    node_type_onehot: np.ndarray  # (P, N_p, T)
    mesh_edge_features: np.ndarray  # (P, E_p, D+1)
    senders_global: np.ndarray  # (P, E_p) int32 — indices into reordered global nodes
    receivers_local: np.ndarray  # (P, E_p) int32 — part-local, receiver-sorted
    row_offsets: np.ndarray  # (P, N_p+1) int32
    node_mask: np.ndarray  # (P, N_p) bool
    edge_mask: np.ndarray  # (P, E_p) bool
    node_type: np.ndarray  # (P, N_p) int32 (padded -1)
    perm: np.ndarray  # (N,) original node id -> position in reordered order
    num_parts: int
    part_nodes: int  # N_p
    # --- boundary-halo exchange plan (None until add_halo_plan) -------------
    # halo_serve[p, q, H]: local slots part p sends to part q each round
    halo_serve: Optional[np.ndarray] = None  # (P, P, H) int32
    halo_serve_mask: Optional[np.ndarray] = None  # (P, P, H) bool
    # senders_halo[p, e]: index into [own (N_p) ; halo (P*H)] extended table
    senders_halo: Optional[np.ndarray] = None  # (P, E_p) int32
    halo_size: int = 0  # H
    # --- interior/boundary split (comm/compute overlap) ---------------------
    # when set, each part's edges are reordered so edges whose sender is
    # remote occupy the static tail [boundary_start:]; interior message
    # passing then has no data dependency on the halo all_to_all, and XLA's
    # async-collective scheduler overlaps the exchange with the interior
    # edge-MLP + scatter-add (SURVEY.md §2.3 overlap engine)
    boundary_start: Optional[int] = None
    row_offsets_int: Optional[np.ndarray] = None  # (P, N_p+1) CSR over [0:bs)
    row_offsets_bnd: Optional[np.ndarray] = None  # (P, N_p+1) CSR over [bs:)
    # --- per-part fused-kernel banding plans (None until add_fused_plans) ----
    # indices are into the extended [own (N_p) ; halo (P*H) ; pad] table of
    # ``ext_nodes`` rows; bands/chunk are uniform across parts (SPMD shapes)
    fused_rel_s: Optional[np.ndarray] = None  # (P, C, chunk) int32
    fused_rel_r: Optional[np.ndarray] = None  # (P, C, chunk) int32
    fused_starts_s: Optional[np.ndarray] = None  # (P, C) int32
    fused_starts_r: Optional[np.ndarray] = None  # (P, C) int32
    fused_band_s: int = 0
    fused_band_r: int = 0
    fused_chunk: int = 0
    ext_nodes: int = 0
    # --- k-deep ghost-zone plan (None until add_deep_halo_plan attaches) ----
    deep: Optional["DeepHaloPlan"] = None

    @property
    def num_nodes_padded(self) -> int:
        return self.num_parts * self.part_nodes


def bisect_partition(mesh_pos: np.ndarray, num_parts: int) -> np.ndarray:
    """Recursive coordinate bisection -> part id per node.

    ``num_parts`` must be a power of two.  Splits along the widest axis at the
    median, recursively; parts are balanced to within one node.
    """
    n = mesh_pos.shape[0]
    assert num_parts & (num_parts - 1) == 0, "num_parts must be a power of two"
    part = np.zeros(n, np.int32)

    def rec(idx: np.ndarray, base: int, k: int):
        if k == 1:
            part[idx] = base
            return
        pos = mesh_pos[idx]
        axis = int(np.argmax(pos.max(0) - pos.min(0)))
        order = idx[np.argsort(pos[:, axis], kind="stable")]
        half = len(order) // 2
        rec(order[:half], base, k // 2)
        rec(order[half:], base + k // 2, k // 2)

    rec(np.arange(n), 0, num_parts)
    return part


def refine_partition(part: np.ndarray, senders: np.ndarray,
                     receivers: np.ndarray, num_parts: int,
                     balance_slack: float = 0.03,
                     passes: int = 8) -> np.ndarray:
    """KL/FM-style boundary refinement of a node partition (round-5 verdict
    item 3a: plain coordinate bisection leaves a ragged, geometry-blind cut;
    the deep ghost zone's volume — its binding cost — grows with the cut).

    Greedy gain passes: a boundary node moves to the neighboring part holding
    most of its edges when that strictly reduces the edge cut, subject to a
    ``balance_slack`` cap on part sizes.  Within each pass moves apply in
    descending gain with a touched-neighborhood guard (two adjacent nodes
    never both move in one pass), so every applied move's gain is exact and
    the cut decreases monotonically — termination is guaranteed.  Vectorized
    gain computation; the sequential phase touches only candidate movers.

    ~100 ms per pass at 1M nodes / 6M edges; measured cut reduction on the
    channel meshes: 15-30% vs raw bisection (benchmarks/scaling.py records
    both).
    """
    part = np.asarray(part, np.int32).copy()
    s = np.asarray(senders, np.int64).reshape(-1)
    r = np.asarray(receivers, np.int64).reshape(-1)
    n = part.shape[0]
    cap = int(np.ceil(n / num_parts * (1.0 + balance_slack)))
    sizes = np.bincount(part, minlength=num_parts)
    # CSR adjacency over the (already bidirectional) edge list, receiver side
    order = np.argsort(r, kind="stable")
    adj = s[order]
    row = np.zeros(n + 1, np.int64)
    np.add.at(row, r + 1, 1)
    row = np.cumsum(row)

    for _ in range(passes):
        # cnt[v, q] = #neighbors of v in part q (one direction suffices:
        # the edge list holds both (u,v) and (v,u))
        cnt = np.zeros((n, num_parts), np.int32)
        np.add.at(cnt, (r, part[s]), 1)
        own = cnt[np.arange(n), part]
        best_q = np.argmax(cnt, axis=1).astype(np.int32)
        gain = cnt[np.arange(n), best_q] - own
        cand = np.nonzero((gain > 0) & (best_q != part))[0]
        if not len(cand):
            break
        cand = cand[np.argsort(-gain[cand], kind="stable")]
        touched = np.zeros(n, bool)
        moved = 0
        for v in cand:
            if touched[v]:
                continue
            q = best_q[v]
            if sizes[q] >= cap:
                continue
            sizes[part[v]] -= 1
            sizes[q] += 1
            part[v] = q
            moved += 1
            touched[v] = True
            touched[adj[row[v]:row[v + 1]]] = True
        if not moved:
            break
    return part


def partition_template(
    mesh_pos: np.ndarray,
    node_type: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    num_parts: int,
    type_min: int = 0,
    type_max: int = 6,
    part_node_bucket: Optional[int] = None,
    part_edge_bucket: Optional[int] = None,
    bucket_multiple: int = 128,
    spatial_order: bool = False,
    refine: bool = True,
) -> PartitionedTemplate:
    """Partition an edge list (0-based, any order) into P stacked shards.

    ``spatial_order``: order nodes *within* each part by a spatial sweep
    (widest-axis lexsort, the partition analogue of ``data.prep``'s
    ``spatial_reorder``) instead of original index — keeps the fused kernel's
    sender/receiver bands narrow (:func:`add_fused_plans`).

    ``refine``: FM boundary refinement of the bisection cut
    (:func:`refine_partition`) — smaller cut means smaller halos and, above
    all, a smaller k-deep ghost zone (round-5 verdict item 3a)."""
    mesh_pos = np.asarray(mesh_pos, np.float32)
    node_type = np.asarray(node_type).reshape(-1).astype(np.int32)
    n = mesh_pos.shape[0]
    part = bisect_partition(mesh_pos, num_parts)
    if refine and num_parts > 1:
        part = refine_partition(part, senders, receivers, num_parts)

    # reorder nodes: sort by (part, original index | spatial sweep rank)
    if spatial_order:
        extent = mesh_pos.max(0) - mesh_pos.min(0)
        axes_ = np.argsort(-extent)
        sweep = np.lexsort(tuple(mesh_pos[:, a] for a in reversed(axes_)))
        rank = np.empty(n, np.int64)
        rank[sweep] = np.arange(n)
        order = np.lexsort((rank, part))  # new position -> original id
    else:
        order = np.lexsort((np.arange(n), part))  # new position -> original id
    perm = np.empty(n, np.int64)
    perm[order] = np.arange(n)  # original id -> new position within global order

    counts = np.bincount(part, minlength=num_parts)
    n_p = part_node_bucket or bucket_size(int(counts.max()) + 1, bucket_multiple)
    if n_p <= counts.max():
        raise ValueError("part node bucket too small")

    # local slot of each node inside its part
    offsets = np.concatenate([[0], np.cumsum(counts)])
    local = perm - offsets[part[np.arange(n)]]
    # global padded id = part * n_p + local
    gid = part.astype(np.int64) * n_p + local

    edge_part = part[receivers]
    ecounts = np.bincount(edge_part, minlength=num_parts)
    e_p = part_edge_bucket or bucket_size(int(ecounts.max()), bucket_multiple)

    t_depth = type_max - type_min + 1
    onehot = np.zeros((num_parts, n_p, t_depth), np.float32)
    nt_out = np.full((num_parts, n_p), -1, np.int32)
    nmask = np.zeros((num_parts, n_p), bool)
    for p in range(num_parts):
        ids = np.nonzero(part == p)[0]
        loc = local[ids]
        onehot[p, loc, node_type[ids] - type_min] = 1.0
        nt_out[p, loc] = node_type[ids]
        nmask[p, loc] = True

    mef_all = relative_mesh_features(mesh_pos, senders, receivers)
    sg = np.full((num_parts, e_p), 0, np.int32)
    rl = np.full((num_parts, e_p), n_p - 1, np.int32)
    mef = np.zeros((num_parts, e_p, mef_all.shape[1]), np.float32)
    emask = np.zeros((num_parts, e_p), bool)
    rows = np.zeros((num_parts, n_p + 1), np.int32)
    for p in range(num_parts):
        eid = np.nonzero(edge_part == p)[0]
        rloc = local[receivers[eid]].astype(np.int32)
        o = np.argsort(rloc, kind="stable")
        eid = eid[o]
        rloc = rloc[o]
        k = len(eid)
        sg[p, :k] = gid[senders[eid]].astype(np.int32)
        rl[p, :k] = rloc
        mef[p, :k] = mef_all[eid]
        emask[p, :k] = True
        row = csr_row_offsets(rloc, n_p - 1)
        rows[p, : n_p] = row
        rows[p, n_p] = e_p  # dead edges land on the last padded slot

    return PartitionedTemplate(
        node_type_onehot=onehot,
        mesh_edge_features=mef,
        senders_global=sg,
        receivers_local=rl,
        row_offsets=rows,
        node_mask=nmask,
        edge_mask=emask,
        node_type=nt_out,
        perm=perm.astype(np.int64),
        num_parts=num_parts,
        part_nodes=n_p,
    )


def add_halo_plan(pt: PartitionedTemplate,
                  halo_multiple: int = 8,
                  split_boundary: bool = True,
                  force_halo_size: Optional[int] = None,
                  force_boundary_cap: Optional[int] = None,
                  boundary_multiple: int = 128) -> PartitionedTemplate:
    """Precompute the boundary-halo exchange plan (host-side, once).

    For each ordered part pair (p, q) the plan records which of p's local node
    slots part q's edges reference ("p serves q"); per round the devices
    exchange only those boundary latents via one ``all_to_all`` instead of
    all-gathering every node.  Sender indices are rewritten into the extended
    table ``[own nodes ; received halo]``.

    ``split_boundary``: additionally reorder each part's edges so
    remote-sender (boundary) edges occupy a shared static tail
    ``[boundary_start:]`` — interior messages then depend only on local
    latents, so the halo exchange overlaps with interior compute (SURVEY.md
    §2.3 overlap engine).  Each group stays receiver-sorted with its own CSR
    offsets.  Skipped (with the plan still built) if the edge bucket cannot
    hold ``max_interior + max_boundary``.

    ``boundary_multiple``: round the boundary-tail capacity up to this
    multiple; pass the fused kernel's chunk size (512) so no edge chunk
    straddles the interior/boundary groups (keeps :func:`add_fused_plans`
    bands narrow — a straddling chunk mixes local and halo sender indices).
    """
    P, n_p = pt.num_parts, pt.part_nodes
    # requests[p][q] = sorted unique local-slots-of-q referenced by p's edges
    requests = [[np.zeros(0, np.int64) for _ in range(P)] for _ in range(P)]
    for p in range(P):
        e = pt.edge_mask[p]
        sg = pt.senders_global[p][e].astype(np.int64)
        owner = sg // n_p
        local = sg % n_p
        for q in range(P):
            if q == p:
                continue
            requests[p][q] = np.unique(local[owner == q])
    h = max((len(requests[p][q]) for p in range(P) for q in range(P)),
            default=0)
    h = max(halo_multiple, int(-(-h // halo_multiple) * halo_multiple))
    if force_halo_size is not None:
        if force_halo_size < h:
            raise ValueError(f"forced halo size {force_halo_size} < required {h}")
        h = force_halo_size

    serve = np.zeros((P, P, h), np.int32)
    serve_mask = np.zeros((P, P, h), bool)
    for p in range(P):
        for q in range(P):
            req = requests[q][p]  # q requests these local slots OF p
            serve[p, q, : len(req)] = req
            serve_mask[p, q, : len(req)] = True

    # extended-table sender indices: own slot, or N_p + q*h + pos-in-request
    senders_halo = np.zeros_like(pt.senders_global)
    is_boundary = np.zeros_like(pt.edge_mask)
    for p in range(P):
        sg = pt.senders_global[p].astype(np.int64)
        owner = sg // n_p
        local = sg % n_p
        out = np.zeros_like(sg)
        own = owner == p
        out[own] = local[own]
        for q in range(P):
            if q == p:
                continue
            sel = owner == q
            if not sel.any():
                continue
            pos = np.searchsorted(requests[p][q], local[sel])
            out[sel] = n_p + q * h + pos
        # dead edges (sender at the global padded tail) point at own padded slot
        dead = ~pt.edge_mask[p]
        out[dead] = n_p - 1
        senders_halo[p] = out.astype(np.int32)
        is_boundary[p] = (~own) & pt.edge_mask[p]

    pt = dataclasses.replace(pt, halo_serve=serve, halo_serve_mask=serve_mask,
                             senders_halo=senders_halo, halo_size=h)
    if not split_boundary:
        return pt

    e_p = pt.senders_global.shape[1]
    n_bnd = is_boundary.sum(1)
    n_int = pt.edge_mask.sum(1) - n_bnd
    bm = boundary_multiple
    e_b = int(-(-int(n_bnd.max()) // bm) * bm) if n_bnd.max() else 0
    if force_boundary_cap is not None:
        if force_boundary_cap < e_b:
            raise ValueError(
                f"forced boundary cap {force_boundary_cap} < required {e_b}")
        e_b = force_boundary_cap
    bs = e_p - e_b  # boundary_start
    if int(n_int.max()) > bs:
        return pt  # bucket too tight for the split; halo still usable

    sg2 = np.zeros_like(pt.senders_global)
    sh2 = np.zeros_like(pt.senders_halo)
    rl2 = np.full_like(pt.receivers_local, n_p - 1)
    mef2 = np.zeros_like(pt.mesh_edge_features)
    em2 = np.zeros_like(pt.edge_mask)
    rows_i = np.zeros((P, n_p + 1), np.int32)
    rows_b = np.zeros((P, n_p + 1), np.int32)
    for p in range(P):
        for grp, (sel, off, rows) in enumerate((
                (~is_boundary[p] & pt.edge_mask[p], 0, rows_i),
                (is_boundary[p], bs, rows_b))):
            idx = np.nonzero(sel)[0]  # stable: stays receiver-sorted
            k = len(idx)
            sg2[p, off:off + k] = pt.senders_global[p, idx]
            sh2[p, off:off + k] = pt.senders_halo[p, idx]
            rl2[p, off:off + k] = pt.receivers_local[p, idx]
            mef2[p, off:off + k] = pt.mesh_edge_features[p, idx]
            em2[p, off:off + k] = True
            cap = bs if grp == 0 else e_b
            row = csr_row_offsets(pt.receivers_local[p, idx], n_p - 1)
            rows[p, :n_p] = row
            rows[p, n_p] = cap  # group's dead edges land on the padded slot
        # dead-edge senders: interior region -> own trash slot; boundary
        # region -> halo slot 0 (edge_mask already zeroes their messages)
        sg2[p, int(n_int[p]):bs] = p * n_p + (n_p - 1)
        sh2[p, int(n_int[p]):bs] = n_p - 1
        if e_b:
            k_b = int(n_bnd[p])
            sg2[p, bs + k_b:] = p * n_p + (n_p - 1)
            sh2[p, bs + k_b:] = n_p  # first halo slot; masked anyway

    return dataclasses.replace(
        pt, senders_global=sg2, senders_halo=sh2, receivers_local=rl2,
        mesh_edge_features=mef2, edge_mask=em2, boundary_start=bs,
        row_offsets_int=rows_i, row_offsets_bnd=rows_b,
        row_offsets=None)  # full-array CSR is invalidated by the reorder


def add_fused_plans(pt: PartitionedTemplate,
                    chunk: int = 512,
                    max_band_s: int = 2048,
                    max_band_r: int = 1024,
                    force_band_s: Optional[int] = None,
                    force_band_r: Optional[int] = None,
                    ) -> PartitionedTemplate:
    """Precompute per-part fused-kernel banding plans (host-side, once).

    The graph-parallel round then runs entirely inside the fused Pallas
    kernel (:mod:`mgn_tpu.ops.fused`) over the extended node table
    ``[own local latents (N_p) ; received halo latents (P*H) ; pad]`` of
    ``ext_nodes`` rows (128-multiple): sender indices are the halo plan's
    extended-table indices, receivers are part-local.  Bands and chunk are
    forced uniform across parts so every shard shares one static shape;
    ``force_band_s``/``force_band_r`` additionally pin them across
    trajectories (SPMD one-compile requirement — mirror of
    ``force_halo_size``).

    Requires :func:`add_halo_plan` to have run.  Returns ``pt`` unchanged
    (plans stay ``None``) when any part's chunk bands exceed the caps —
    callers fall back to the banded/XLA sharded path.  Partition with
    ``spatial_order=True`` and ``add_halo_plan(boundary_multiple=chunk)``
    for narrow bands.
    """
    if pt.senders_halo is None:
        raise ValueError("add_fused_plans requires add_halo_plan first")
    from mgn_tpu.ops.fused import build_fused_plan

    P, n_p = pt.num_parts, pt.part_nodes
    n_ext = -(-(n_p + P * pt.halo_size) // 128) * 128

    def build(p, bs=None, br=None):
        return build_fused_plan(pt.senders_halo[p], pt.receivers_local[p],
                                n_ext, max_band_s, max_band_r, chunk,
                                force_band_s=bs, force_band_r=br)

    plans = [build(p) for p in range(P)]
    if any(pl is None for pl in plans):
        return pt
    band_s = force_band_s or max(pl.band_s for pl in plans)
    band_r = force_band_r or max(pl.band_r for pl in plans)
    plans = [build(p, band_s, band_r) for p in range(P)]
    if any(pl is None for pl in plans):
        return pt  # forced band narrower than a part requires
    return dataclasses.replace(
        pt,
        fused_rel_s=np.stack([np.asarray(pl.rel_s) for pl in plans]),
        fused_rel_r=np.stack([np.asarray(pl.rel_r) for pl in plans]),
        fused_starts_s=np.stack([np.asarray(pl.starts_s) for pl in plans]),
        fused_starts_r=np.stack([np.asarray(pl.starts_r) for pl in plans]),
        fused_band_s=band_s, fused_band_r=band_r,
        fused_chunk=plans[0].chunk, ext_nodes=n_ext)


# --- k-deep halo (ghost zones): exchange once per k rounds -------------------

@dataclasses.dataclass
class TelescopeStage:
    """One shrinking stage of a telescoped deep segment (round-5 scaling
    item): after ``a`` rounds since the exchange, only nodes within distance
    ``depth - a`` (and edges with receivers within ``depth - a - 1``) can
    still influence the owned cone, so later rounds run on progressively
    SMALLER nested tables — the ghost compute averaged over rounds drops
    from the full-depth ring volume to roughly half of it, with no extra
    communication (the exactness argument of ``DeepHaloPlan`` applies per
    stage with the reduced depth).  Stage arrays are leading-axis-P stacked;
    ``nremap`` maps this stage's node rows into the PREVIOUS stage's table,
    ``eremap`` maps its edge rows into the STAGE-0 edge array (the encoded
    edge-latent buffer, scatter-backed after each stage)."""

    rounds: int
    depth: int
    nremap: np.ndarray    # (P, n_ext_s) int32 -> previous stage's rows
    eremap: np.ndarray    # (P, e_ext_s) int32 -> stage-0 edge slots
    own_pos: np.ndarray   # (P, N_p) int32
    senders: np.ndarray   # (P, e_ext_s) int32, table-local
    receivers: np.ndarray  # (P, e_ext_s) int32, table-local, receiver-sorted
    edge_mask: np.ndarray  # (P, e_ext_s) bool
    rows: np.ndarray      # (P, n_ext_s+1) int32 CSR
    n_ext: int
    frel_s: Optional[np.ndarray] = None
    frel_r: Optional[np.ndarray] = None
    fstarts_s: Optional[np.ndarray] = None
    fstarts_r: Optional[np.ndarray] = None
    band_s: int = 0
    band_r: int = 0
    chunk: int = 0


@dataclasses.dataclass
class DeepHaloPlan:
    """Per-part k-deep ghost-zone plan (leading axis = parts).

    The per-round halo exchange costs one ``all_to_all`` + extended-table
    glue + a separate kernel launch EVERY round — measured 2.5x the
    unsharded monolithic step at mesh (1,1) (benchmarks/results/SPMD_r03.json).
    This plan trades redundant halo compute for communication rounds: each
    part's node table is extended with every node within graph distance
    ``depth`` of its owned set, the edge table with every edge whose receiver
    is within ``depth - 1``, and ``rounds`` processor rounds run locally in
    ONE fused-kernel call between exchanges.  After a fresh exchange, a node
    at distance d stays exact for the first ``depth - d`` rounds, so owned
    nodes (d=0) are exact after ``rounds <= depth`` rounds.  Edge latents
    never travel: they are recomputed redundantly in the halo region, which
    is why a MULTI-segment schedule needs ``depth = 2*rounds - 1`` (an edge
    latent at receiver-distance d is exact after a segment only for
    d <= depth - rounds, and the next segment's owned cone needs
    d <= rounds - 1); a single segment covering all ``mps`` rounds starts
    from freshly encoded edge latents and needs only ``depth = rounds``.

    The extended table is sorted by the part-major spatial sweep order
    (``partition_template(spatial_order=True)``'s global ids), which keeps
    the fused kernel's sender/receiver bands as narrow as the single-chip
    case; ``src`` places ``[own latents ; received halo ; one zero row]``
    into that order after each exchange.
    """

    src: np.ndarray        # (P, N_ext) int32 -> concat([own(N_p); recv(P*H); 0-row])
    own_pos: np.ndarray    # (P, N_p) int32: own slot l lives at ext row own_pos[l]
    serve: np.ndarray      # (P, P, H) int32 own-local slots part p sends part q
    serve_mask: np.ndarray  # (P, P, H) bool
    senders: np.ndarray    # (P, E_ext) int32, ext-local
    receivers: np.ndarray  # (P, E_ext) int32, ext-local, receiver-sorted
    edge_mask: np.ndarray  # (P, E_ext) bool
    mef: np.ndarray        # (P, E_ext, D+1) mesh edge features
    rows: np.ndarray       # (P, N_ext+1) int32 CSR over ext receivers
    halo_size: int         # H
    n_ext: int             # static extended rows (128-multiple, >= real+1)
    depth: int             # ghost-zone depth D
    rounds: int            # processor rounds per exchange (k)
    # fused banding over the extended table (None => XLA fallback)
    frel_s: Optional[np.ndarray] = None   # (P, C, chunk)
    frel_r: Optional[np.ndarray] = None   # (P, C, chunk)
    fstarts_s: Optional[np.ndarray] = None  # (P, C)
    fstarts_r: Optional[np.ndarray] = None  # (P, C)
    band_s: int = 0
    band_r: int = 0
    chunk: int = 0
    # telescoped shrinking stages AFTER the first ``stages_rounds[0]`` rounds
    # (None = classic single-table segment); stage 0 runs on the main table
    stages: Optional[list] = None          # list[TelescopeStage], s >= 1
    stage0_rounds: int = 0                 # rounds run on the main table


def deep_depth(rounds: int, mps: int) -> int:
    """Ghost-zone depth sustaining exactness for ``rounds``-round segments."""
    return rounds if rounds >= mps else 2 * rounds - 1


def add_deep_halo_plan(
    pt: PartitionedTemplate,
    mesh_pos: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    rounds: int,
    mps: int,
    halo_multiple: int = 8,
    chunk: int = 512,
    max_band_s: int = 2048,
    max_band_r: int = 1024,
    force_halo_size: Optional[int] = None,
    force_edge_bucket: Optional[int] = None,
    force_n_ext: Optional[int] = None,
    force_band_s: Optional[int] = None,
    force_band_r: Optional[int] = None,
    build_fused: bool = True,
    telescope: Optional[tuple] = None,
    force_stages: Optional[tuple] = None,
) -> DeepHaloPlan:
    """Build the k-deep ghost-zone plan from the GLOBAL edge list.

    ``telescope``: optional per-stage round counts summing to ``rounds``
    (e.g. ``(5, 5, 5)`` for a 15-round segment) — rounds after the first
    stage run on nested shrinking tables (:class:`TelescopeStage`), cutting
    the redundant ghost compute roughly in half at zero extra communication
    (round-5 scaling item; equality-tested against the single-table
    schedule).

    ``pt`` fixes the part assignment / ordering (use
    ``partition_template(spatial_order=True)`` so the extended table is
    spatially banded); ``senders``/``receivers`` are the original 0-based
    global edge list and ``mesh_pos`` the original positions (the deep edge
    table includes halo-region edges that no per-part table holds).
    ``rounds`` must divide ``mps``.  The ``force_*`` knobs pin the static
    shapes across trajectories (SPMD one-compile); a forced capacity smaller
    than required raises ``ValueError`` (the planner catch-and-replan path).
    """
    if mps % rounds != 0:
        raise ValueError(f"rounds {rounds} must divide mps {mps}")
    depth = deep_depth(rounds, mps)
    P, n_p = pt.num_parts, pt.part_nodes
    mesh_pos = np.asarray(mesh_pos, np.float32)
    senders = np.asarray(senders, np.int64).reshape(-1)
    receivers = np.asarray(receivers, np.int64).reshape(-1)
    n = mesh_pos.shape[0]

    counts = pt.node_mask.sum(1)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    pos = pt.perm[:n]
    part_of = (np.searchsorted(offsets, pos, side="right") - 1).astype(np.int64)
    local_of = pos - offsets[part_of]
    gid = part_of * n_p + local_of  # original id -> padded global id

    # distance-to-owned-set per part, capped at ``depth``
    big = np.iinfo(np.int32).max // 2
    dist = np.full((P, n), big, np.int32)
    try:
        # multi-source BFS in C (scipy csgraph): ~two orders of magnitude
        # faster than the Bellman-Ford sweeps at 1M nodes / 6M edges (the
        # round-5 roofline-at-scale bottleneck); the edge list is
        # bidirectional so direction is immaterial
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import dijkstra

        adj = csr_matrix((np.ones(len(senders), np.int8),
                          (senders, receivers)), shape=(n, n))
        for p in range(P):
            d = dijkstra(adj, unweighted=True, min_only=True,
                         indices=np.nonzero(part_of == p)[0], limit=depth)
            dist[p] = np.where(np.isfinite(d), d, big).astype(np.int32)
    except ImportError:  # pragma: no cover - scipy is baked in
        dist[part_of, np.arange(n)] = 0
        for _ in range(depth):
            for p in range(P):
                np.minimum.at(dist[p], senders, dist[p][receivers] + 1)

    # halo requests / serve lists (exchange structure of add_halo_plan, but
    # for every remote node within distance ``depth``)
    requests = [[np.zeros(0, np.int64) for _ in range(P)] for _ in range(P)]
    for p in range(P):
        sel = (dist[p] <= depth) & (part_of != p)
        ids = np.nonzero(sel)[0]
        for q in range(P):
            if q == p:
                continue
            requests[p][q] = np.sort(local_of[ids[part_of[ids] == q]])
    h = max((len(requests[p][q]) for p in range(P) for q in range(P)),
            default=0)
    h = max(halo_multiple, int(-(-h // halo_multiple) * halo_multiple))
    if force_halo_size is not None:
        if force_halo_size < h:
            raise ValueError(
                f"forced deep halo size {force_halo_size} < required {h}")
        h = force_halo_size
    serve = np.zeros((P, P, h), np.int32)
    serve_mask = np.zeros((P, P, h), bool)
    for p in range(P):
        for q in range(P):
            req = requests[q][p]
            serve[p, q, : len(req)] = req
            serve_mask[p, q, : len(req)] = True

    # extended node tables: all own slots (pads included, so own_pos spans
    # N_p) + halo reals, sorted by gid = part-major spatial sweep order
    ext_gids, ext_edges = [], []
    mef_all = relative_mesh_features(mesh_pos, senders, receivers)
    for p in range(P):
        own = p * n_p + np.arange(n_p, dtype=np.int64)
        halo = gid[(dist[p] <= depth) & (part_of != p)]
        ext_gids.append(np.sort(np.concatenate([own, halo])))
        ext_edges.append(np.nonzero(dist[p][receivers] <= depth - 1)[0])
    n_ext = max(len(g) for g in ext_gids) + 1
    n_ext = int(-(-n_ext // 128) * 128)
    if force_n_ext is not None:
        if force_n_ext < n_ext:
            raise ValueError(f"forced n_ext {force_n_ext} < required {n_ext}")
        n_ext = force_n_ext
    e_ext = max(len(e) for e in ext_edges)
    e_ext = max(chunk, int(-(-e_ext // chunk) * chunk))
    if force_edge_bucket is not None:
        if force_edge_bucket < e_ext:
            raise ValueError(
                f"forced deep edge bucket {force_edge_bucket} < required {e_ext}")
        e_ext = force_edge_bucket

    src = np.full((P, n_ext), n_p + P * h, np.int32)  # pad rows -> zero row
    own_pos = np.zeros((P, n_p), np.int32)
    s_ext = np.full((P, e_ext), n_ext - 1, np.int32)
    r_ext = np.full((P, e_ext), n_ext - 1, np.int32)
    emask = np.zeros((P, e_ext), bool)
    mef = np.zeros((P, e_ext, mef_all.shape[1]), np.float32)
    rows = np.zeros((P, n_ext + 1), np.int32)
    sorted_eids = [None] * P  # receiver-sorted original eids (telescoping)
    for p in range(P):
        g = ext_gids[p]
        k = len(g)
        owner = g // n_p
        loc = g % n_p
        sidx = np.empty(k, np.int64)
        own = owner == p
        sidx[own] = loc[own]
        for q in range(P):
            if q == p:
                continue
            sel = owner == q
            if sel.any():
                sidx[sel] = n_p + q * h + np.searchsorted(requests[p][q],
                                                          loc[sel])
        src[p, :k] = sidx.astype(np.int32)
        own_pos[p] = np.searchsorted(g, p * n_p
                                     + np.arange(n_p)).astype(np.int32)

        eid = ext_edges[p]
        rl = np.searchsorted(g, gid[receivers[eid]])
        o = np.argsort(rl, kind="stable")
        eid, rl = eid[o], rl[o]
        sorted_eids[p] = eid
        m = len(eid)
        s_ext[p, :m] = np.searchsorted(g, gid[senders[eid]]).astype(np.int32)
        r_ext[p, :m] = rl.astype(np.int32)
        # dead (padded) edges point at the FIRST pad row (k = this part's
        # real ext count), not n_ext-1: the fused kernel does not mask dead
        # messages (it relies on them landing in a pad row), and k is
        # independent of the FORCED n_ext capacity — with n_ext-1 targets a
        # capacity regrow widened every trajectory's band windows and
        # forced-band planning could fail unrecoverably (round-4 review)
        s_ext[p, m:] = k
        r_ext[p, m:] = k
        emask[p, :m] = True
        mef[p, :m] = mef_all[eid]
        rows[p, : n_ext] = csr_row_offsets(rl, n_ext - 1)
        rows[p, n_ext] = e_ext  # dead edges land on the last padded row

    plan = DeepHaloPlan(
        src=src, own_pos=own_pos, serve=serve, serve_mask=serve_mask,
        senders=s_ext, receivers=r_ext, edge_mask=emask, mef=mef, rows=rows,
        halo_size=h, n_ext=n_ext, depth=depth, rounds=rounds)

    if telescope is not None:
        if sum(telescope) != rounds or any(t <= 0 for t in telescope):
            raise ValueError(f"telescope {telescope} must be positive and "
                             f"sum to rounds {rounds}")
        # position of each original eid inside part p's stage-0 edge array
        pos0 = [np.full(len(senders), e_ext, np.int64) for _ in range(P)]
        for p in range(P):
            pos0[p][sorted_eids[p]] = np.arange(len(sorted_eids[p]))
        stages = []
        prev_gids = ext_gids
        a = telescope[0]
        for si, t_rounds in enumerate(telescope[1:]):
            d_s = depth - a
            per, max_k, max_m = [], 0, 0
            for p in range(P):
                own = p * n_p + np.arange(n_p, dtype=np.int64)
                ids = np.nonzero((dist[p] <= d_s) & (part_of != p))[0]
                g_s = np.sort(np.concatenate([own, gid[ids]]))
                eid = np.nonzero(dist[p][receivers] <= d_s - 1)[0]
                rl = np.searchsorted(g_s, gid[receivers[eid]])
                o = np.argsort(rl, kind="stable")
                eid, rl = eid[o], rl[o]
                per.append((g_s, eid, rl))
                max_k = max(max_k, len(g_s))
                max_m = max(max_m, len(eid))
            n_ext_s = int(-(-(max_k + 1) // 128) * 128)
            e_ext_s = max(chunk, int(-(-max_m // chunk) * chunk))
            f_band_s = f_band_r = None
            if force_stages is not None:
                fn_, fe_, f_band_s, f_band_r = force_stages[si]
                if fn_ < n_ext_s or fe_ < e_ext_s:
                    raise ValueError(
                        f"forced telescope stage {si} shapes ({fn_}, {fe_}) "
                        f"< required ({n_ext_s}, {e_ext_s})")
                n_ext_s, e_ext_s = fn_, fe_
            nre = np.zeros((P, n_ext_s), np.int32)
            ere = np.full((P, e_ext_s), e_ext, np.int32)  # pads: drop-slot
            opos = np.zeros((P, n_p), np.int32)
            s_s = np.full((P, e_ext_s), n_ext_s - 1, np.int32)
            r_s = np.full((P, e_ext_s), n_ext_s - 1, np.int32)
            em_s = np.zeros((P, e_ext_s), bool)
            rows_s = np.zeros((P, n_ext_s + 1), np.int32)
            for p in range(P):
                g_s, eid, rl = per[p]
                k, m = len(g_s), len(eid)
                nre[p, :k] = np.searchsorted(prev_gids[p], g_s)
                # pad rows gather the previous table's first pad row
                nre[p, k:] = len(prev_gids[p])
                opos[p] = np.searchsorted(
                    g_s, p * n_p + np.arange(n_p)).astype(np.int32)
                s_s[p, :m] = np.searchsorted(g_s, gid[senders[eid]])
                r_s[p, :m] = rl
                # dead edges -> this part's first pad row (band-window
                # independent, same argument as the main table)
                s_s[p, m:] = k
                r_s[p, m:] = k
                em_s[p, :m] = True
                ere[p, :m] = pos0[p][eid]
                rows_s[p, :n_ext_s] = csr_row_offsets(rl, n_ext_s - 1)
                rows_s[p, n_ext_s] = e_ext_s
            st = TelescopeStage(
                rounds=t_rounds, depth=d_s, nremap=nre, eremap=ere,
                own_pos=opos, senders=s_s, receivers=r_s, edge_mask=em_s,
                rows=rows_s, n_ext=n_ext_s)
            if build_fused:
                from mgn_tpu.ops.fused import build_fused_plan

                spl = [build_fused_plan(s_s[p], r_s[p], n_ext_s, max_band_s,
                                        max_band_r, chunk) for p in range(P)]
                if all(x is not None for x in spl):
                    bs_ = f_band_s or max(x.band_s for x in spl)
                    br_ = f_band_r or max(x.band_r for x in spl)
                    spl = [build_fused_plan(s_s[p], r_s[p], n_ext_s,
                                            max_band_s, max_band_r, chunk,
                                            force_band_s=bs_,
                                            force_band_r=br_)
                           for p in range(P)]
                    if force_stages is not None and any(
                            x is None for x in spl):
                        raise ValueError(
                            f"forced telescope stage {si} bands too narrow")
                if all(x is not None for x in spl):
                    st = dataclasses.replace(
                        st,
                        frel_s=np.stack([np.asarray(x.rel_s) for x in spl]),
                        frel_r=np.stack([np.asarray(x.rel_r) for x in spl]),
                        fstarts_s=np.stack(
                            [np.asarray(x.starts_s) for x in spl]),
                        fstarts_r=np.stack(
                            [np.asarray(x.starts_r) for x in spl]),
                        band_s=bs_, band_r=br_, chunk=spl[0].chunk)
            stages.append(st)
            prev_gids = [g for g, _, _ in per]
            a += t_rounds
        plan = dataclasses.replace(plan, stages=stages,
                                   stage0_rounds=telescope[0])

    if not build_fused:
        return plan

    from mgn_tpu.ops.fused import build_fused_plan

    def build(p, bs=None, br=None):
        return build_fused_plan(s_ext[p], r_ext[p], n_ext, max_band_s,
                                max_band_r, chunk, force_band_s=bs,
                                force_band_r=br)

    plans = [build(p) for p in range(P)]
    if any(pl is None for pl in plans):
        return plan  # bands blown: XLA fallback, plan still usable
    band_s = force_band_s or max(pl.band_s for pl in plans)
    band_r = force_band_r or max(pl.band_r for pl in plans)
    plans = [build(p, band_s, band_r) for p in range(P)]
    if any(pl is None for pl in plans):
        return plan
    return dataclasses.replace(
        plan,
        frel_s=np.stack([np.asarray(pl.rel_s) for pl in plans]),
        frel_r=np.stack([np.asarray(pl.rel_r) for pl in plans]),
        fstarts_s=np.stack([np.asarray(pl.starts_s) for pl in plans]),
        fstarts_r=np.stack([np.asarray(pl.starts_r) for pl in plans]),
        band_s=band_s, band_r=band_r, chunk=plans[0].chunk)
