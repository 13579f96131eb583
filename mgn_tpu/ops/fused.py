"""Fused VMEM-resident message-passing rounds (Pallas/Mosaic TPU kernel).

The round-1 bisection (docs/performance.md "Round-2 kernel plan") showed the
Encode-Process-Decode forward is HBM-bound: every processor round moves
~35-40 MB of intermediates (gathered sender/receiver features, messages,
aggregates) through HBM while only ~6 MB of state actually exists.  This
kernel keeps the whole graph state resident in VMEM across all
``message_passing_steps`` rounds:

- node latents ``v (N, L)``, edge latents ``e (E, L)`` and the f32
  aggregation buffer live in VMEM **scratch** that persists across a
  ``grid=(mps,)`` — one grid step per processor round;
- per-round MLP weights stream from HBM via BlockSpec index maps (double-
  buffered by the Pallas pipeline), so VMEM holds 2 rounds of weights, not 15;
- TPU has no vector-gather, so sender/receiver lookups are **banded one-hot
  matmuls**: edges are processed in static 128-edge chunks; for each chunk a
  host-precomputed aligned window start (scalar-prefetched) selects a narrow
  band of node rows, and ``onehot[w, j] = (rel_idx[j] == w)`` turns gather
  (``onehotᵀ @ v_band``) and scatter-add (``onehot @ msg``) into MXU work.
  Spatially ordered nodes (``data.prep spatial_reorder`` /
  ``parallel.partition``) keep the bands narrow;
- padded edges need no masking: the graph template points them at the last
  padded node (core/graph.py ``build_template``), so their messages only ever
  pollute a node that every downstream consumer masks.

This is the native-kernel heart of the framework — the op hidden inside
GraphNetCore's ``mgn.model(graph, ps, st)`` in the reference (call sites
/root/reference/src/solve.jl:198-200, /root/reference/src/strategies.jl:421).

Backward: ``custom_vjp`` that recomputes the rounds with plain XLA ops from
the saved ``(v0, e0)`` — same math, so gradients are exact; the fused forward
speeds up rollout/inference and the recompute keeps training correct.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedPlan", "build_fused_plan", "fused_process",
           "process_rounds_xla"]

_ALIGN = 32  # band starts aligned for f32(8)/bf16(16) sublane tiles
# Mosaic's default scoped-vmem cap is 16 MB but v5e/v5p cores carry 128 MB of
# VMEM; the kernels request a higher cap (measured: a raised cap alone costs
# nothing, benchmarks/probe_bwd_tpu.py) so the resident variants keep paying
# off on larger meshes.  _VMEM_BUDGET drives host-side resident-vs-streaming
# selection and stays below _VMEM_LIMIT by the compiler's own headroom
# (one-hot/MLP temporaries, scalar windows).
_VMEM_BUDGET = 56 << 20
_VMEM_LIMIT = 64 << 20


def set_vmem_budget(budget: int, limit: Optional[int] = None) -> None:
    """Adjust the host-side VMEM planning budget (drives resident-vs-stream
    selection in :func:`fused_fits` / :func:`residuals_resident`) and the
    Mosaic scoped-vmem cap requested by the kernels (``limit``, defaults to
    ``budget`` + 4 MB of compiler headroom)."""
    global _VMEM_BUDGET, _VMEM_LIMIT
    _VMEM_BUDGET = int(budget)
    _VMEM_LIMIT = int(limit) if limit is not None else int(budget) + (4 << 20)
    _make_fused.cache_clear()


def _compiler_params():
    if _VMEM_LIMIT is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(_VMEM_LIMIT))
_FORCE_STREAM = False  # testing hook: force the streaming residual path
_FORCE_PREPROJECT = None  # testing hook: pin the forward pre-projection path
_FORCE_STREAM_EDGES = None  # testing hook: pin the edge-streaming forward
_FORCE_DEFER = None  # testing hook: pin the deferred first-layer backward
_FORCE_WT = None  # testing hook: pin per-round transposed adjoint weights
_FORCE_WGB = None  # testing hook: pin per-round batched weight gradients
_FORCE_SAVEH = None  # testing hook: pin hidden-activation saving (skip the
# backward recompute: forward saves each round's post-relu hidden
# activations; the deferred backward rebuilds the MLP cache from them with
# ONE matmul instead of 2 gathers + n_layers matmuls per chunk)
# Unroll the per-round chunk loop only up to this many chunks: unrolling lets
# Mosaic hoist/CSE the loop-invariant work (measured fastest at cylinder
# size, 11-22 chunks), but compile time grows superlinearly with the unrolled
# body count — a 117-chunk 20k-node mesh took >40 min of remote Mosaic
# compile before this cap.  Rolled loops share one compiled body.
_UNROLL_CHUNKS_MAX = 32
# perf-bisection hook (benchmarks/probe_fused_tpu.py): None = real kernel;
# "const_oh" = loop-invariant one-hot matrices (removes the per-chunk VPU
# iota/compare build, keeps the gather matmuls); "skip_gather" = bypass the
# gather matmuls entirely (vs/vr reuse e_c); "skip_mlp" = identity message
# MLP; "skip_scatter" = drop the agg scatter-add matmuls; "round_indep" =
# edge stages read a round-0 snapshot of v (breaks the node->edge cross-round
# dependency: measures whether ANY inter-round overlap is available to the
# scheduler — the software-pipelining go/no-go).  Timing-only —
# outputs are wrong for every non-None value.
_PROBE = None


class FusedPlan(struct.PyTreeNode):
    """Host-precomputed static banding plan for one graph template."""

    rel_s: jax.Array  # (C, chunk) int32 — senders - starts_s[c]
    rel_r: jax.Array  # (C, chunk) int32 — receivers - starts_r[c]
    starts_s: jax.Array  # (C,) int32, _ALIGN-aligned
    starts_r: jax.Array  # (C,) int32, _ALIGN-aligned
    band_s: int = struct.field(pytree_node=False, default=0)
    band_r: int = struct.field(pytree_node=False, default=0)
    chunk: int = struct.field(pytree_node=False, default=1024)


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def _node_block(n: int, cap: int = 2048) -> int:
    """Largest row-block ≤ cap that divides n (multiple of 128): bounds the
    node-stage MLP temporaries so big-N meshes don't blow VMEM."""
    d = n // 128
    best = 1
    for k in range(1, cap // 128 + 1):
        if d % k == 0:
            best = k
    return 128 * best


def build_fused_plan(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    max_band_s: int = 2048,
    max_band_r: int = 1024,
    chunk: int = 1024,
    force_band_s: Optional[int] = None,
    force_band_r: Optional[int] = None,
) -> Optional[FusedPlan]:
    """Banding plan over static ``chunk``-edge chunks; ``None`` when any
    chunk's sender/receiver window exceeds the band caps (spatially unordered
    mesh — callers fall back to the unfused path).  Larger chunks mean larger
    (more MXU-efficient) matmuls but wider bands; ``chunk`` must be a
    multiple of 128 (int32 lane width) and divide the padded edge count.

    ``force_band_s``/``force_band_r`` pin the band widths (SPMD callers need
    identical static shapes across graph partitions); ``None`` when a forced
    band is narrower than the required one."""
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    e = senders.shape[0]
    while chunk > 128 and e % chunk != 0:
        chunk //= 2
    if e % chunk != 0 or chunk % 128 != 0 or num_nodes % 128 != 0:
        return None

    def plan_axis(idx, max_band, force_band):
        chunks = idx.reshape(-1, chunk)
        starts = (chunks.min(1) // _ALIGN) * _ALIGN
        span = chunks.max(1) - starts + 1
        band = _round_up(span.max(), 128)
        if force_band is not None:
            if force_band < band:
                return None
            band = force_band
        if band > max_band or band > num_nodes:
            return None
        starts = np.minimum(starts, num_nodes - band).astype(np.int32)
        rel = (chunks - starts[:, None]).astype(np.int32)
        return starts, rel, int(band)

    ps = plan_axis(senders, max_band_s, force_band_s)
    pr = plan_axis(receivers, max_band_r, force_band_r)
    if ps is None or pr is None:
        return None
    return FusedPlan(
        rel_s=jnp.asarray(ps[1]), rel_r=jnp.asarray(pr[1]),
        starts_s=jnp.asarray(ps[0]), starts_r=jnp.asarray(pr[0]),
        band_s=ps[2], band_r=pr[2], chunk=chunk,
    )


# --- parameter flattening ----------------------------------------------------
# the processor params pytree (models/mgn.init_mgn) has every leaf stacked on
# a leading (mps,) axis; the kernel takes them as a flat, fixed-order list.

def _flatten_proc(proc: Dict[str, Any]):
    """Fixed-order leaf list; (mps, L) vectors become (mps, 1, L) so the
    per-round BlockSpec (1, 1, L) satisfies Mosaic's block-shape rules."""
    leaves = []
    for mlp in ("edge_mlp", "node_mlp"):
        p = proc[mlp]
        leaves.extend(p["w"])
        leaves.extend(w.reshape(w.shape[0], 1, w.shape[1]) for w in p["b"])
        leaves.append(p["ln_scale"].reshape(p["ln_scale"].shape[0], 1, -1))
        leaves.append(p["ln_bias"].reshape(p["ln_bias"].shape[0], 1, -1))
    return leaves


def _mlp_slot_counts(proc: Dict[str, Any]) -> Tuple[int, int]:
    return len(proc["edge_mlp"]["w"]), len(proc["node_mlp"]["w"])


# --- the kernels -------------------------------------------------------------

def _mlp_fwd(h_parts, ws, bs, ln_scale, ln_bias, w0_splits, cdtype,
             extra_acc=None):
    """First layer computed from parts (no concat); then hidden+out+LN.

    Returns (out, cache) where cache holds the pre-activation intermediates
    needed by the hand-written backward (the bwd kernel recomputes forward
    and consumes this cache).  ``extra_acc``: optional f32 pre-computed
    first-layer partial sum (the pre-projection path — gathered rows of
    ``v @ W0_slice`` accumulated before the call)."""
    f32 = jnp.float32
    acc = extra_acc
    off = 0
    w0 = ws[0]
    for p, d in zip(h_parts, w0_splits):
        acc_p = jax.lax.dot_general(
            p, w0[off:off + d, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        acc = acc_p if acc is None else acc + acc_p
        off += d
    h = acc.astype(cdtype) + bs[0]
    pre = [h]  # pre-relu activations per layer boundary
    post = []  # post-relu (inputs to the next matmul)
    for i in range(1, len(ws)):
        hr = jnp.maximum(h, 0)
        post.append(hr)
        h = jax.lax.dot_general(
            hr, ws[i], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(cdtype) + bs[i]
        pre.append(h)
    h32 = h.astype(f32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (h32 - mean) * rstd
    out = (xhat * ln_scale + ln_bias).astype(cdtype)
    return out, (pre, post, xhat, rstd)


def _mlp_bwd(dout, cache, h_parts, ws, ln_scale, w0_splits, cdtype,
             wts=None, wgrad_sink=None):
    """Backward of :func:`_mlp_fwd`.

    Returns (dparts, dws, dbs, dln_scale, dln_bias, dh0); dws/dbs are f32,
    dparts are ``cdtype`` (matching JAX's cotangent dtype semantics).
    ``dh0`` is the first-layer pre-activation cotangent — the deferred
    first-layer backward scatters it into node-space accumulators instead of
    materialising per-part input cotangents (in which case ``h_parts`` /
    ``w0_splits`` carry only the non-deferred leading parts).

    ``wts``: optional pre-transposed weights (``wts[i] == ws[i].T``, computed
    once per round by the kernel) — the adjoint matmuls then contract (1,0)
    on a canonical operand layout instead of (1,1) against the transposed
    weight (``_FORCE_WT``).

    ``wgrad_sink(level, post_or_None, dh)``: when given, per-chunk weight/
    bias gradients are NOT computed; instead the activations and cotangents
    are handed to the sink (the batched-wgrad kernel stashes them in (E, L)
    scratch and runs one big matmul per layer per round — ``_FORCE_WGB``).
    ``dws``/``dbs`` come back ``None`` then (LN grads still returned)."""
    f32 = jnp.float32
    pre, post, xhat, rstd = cache
    if _PROBE and "bwd_skip_vpu" in _PROBE:  # timing-only: no LN-bwd/relu VPU
        dgamma = dbeta = jnp.zeros((1, dout.shape[1]), f32)
        dh = dout
    else:
        dy = dout.astype(f32)
        dgamma = jnp.sum(dy * xhat, axis=0, keepdims=True)
        dbeta = jnp.sum(dy, axis=0, keepdims=True)
        dxhat = dy * ln_scale.astype(f32)
        dh = (dxhat - jnp.mean(dxhat, -1, keepdims=True)
              - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True)) * rstd
        dh = dh.astype(cdtype)
    dws = [None] * len(ws)
    dbs = [None] * len(ws)
    # timing-only probe variants (benchmarks/probe_bwd_tpu.py): "bwd_adj10"
    # contracts the adjoint dh@wᵀ matmuls as (1,0) — shape-identical for
    # square (L,L) weights, measures the transposed-operand layout cost;
    # "bwd_wg10" replaces the (0,0) weight-grad contraction with an
    # untransposed matmul of the same FLOPs against a fake (L,chunk) operand.
    adj_dim = (0,) if _PROBE and "bwd_adj10" in _PROBE else (1,)

    def _wgrad(p, dh):
        if _PROBE and "bwd_wg10" in _PROBE:
            fake = jnp.full((p.shape[1], p.shape[0]), 0.5, p.dtype)
            return jax.lax.dot_general(
                fake, dh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
        return jax.lax.dot_general(  # pᵀ @ dh
            p, dh, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    for i in range(len(ws) - 1, 0, -1):
        if wgrad_sink is not None:
            wgrad_sink(i, post[i - 1], dh)
        else:
            dbs[i] = jnp.sum(dh.astype(f32), axis=0, keepdims=True)
            dws[i] = _wgrad(post[i - 1], dh)
        if wts is not None:
            dhr = jax.lax.dot_general(  # dh @ wᵀ, pre-transposed operand
                dh, wts[i], (((1,), (0,)), ((), ())),
                preferred_element_type=f32).astype(cdtype)
        else:
            dhr = jax.lax.dot_general(  # dh @ wᵀ
                dh, ws[i], (((1,), adj_dim), ((), ())),
                preferred_element_type=f32).astype(cdtype)
        dh = dhr if _PROBE and "bwd_skip_vpu" in _PROBE \
            else dhr * (pre[i - 1] > 0).astype(cdtype)
    if wgrad_sink is not None:
        wgrad_sink(0, None, dh)
    else:
        dbs[0] = jnp.sum(dh.astype(f32), axis=0, keepdims=True)
    dh32 = dh
    dw0_rows = []
    dparts = []
    off = 0
    w0 = ws[0]
    for p, d in zip(h_parts, w0_splits):
        if wgrad_sink is None:
            dw0_rows.append(_wgrad(p, dh32))
        if wts is not None:
            dparts.append(jax.lax.dot_general(  # dh @ (w0ᵀ cols)
                dh32, wts[0][:, off:off + d], (((1,), (0,)), ((), ())),
                preferred_element_type=f32).astype(cdtype))
        else:
            dparts.append(jax.lax.dot_general(  # dh @ w0_sliceᵀ
                dh32, w0[off:off + d, :], (((1,), adj_dim if d == w0.shape[1]
                                            else (1,)), ((), ())),
                preferred_element_type=f32).astype(cdtype))
        off += d
    if wgrad_sink is not None:
        return dparts, None, None, dgamma, dbeta, dh32
    dw0 = jnp.concatenate(dw0_rows, axis=0)
    return dparts, [dw0] + dws[1:], dbs, dgamma, dbeta, dh32


def _unpack_weight_refs(refs, n_layers_e, n_layers_n):
    i = 0
    ew = [refs[i + k][0] for k in range(n_layers_e)]
    i += n_layers_e
    eb = [refs[i + k][0] for k in range(n_layers_e)]
    i += n_layers_e
    eln_s, eln_b = refs[i][0], refs[i + 1][0]
    i += 2
    nw = [refs[i + k][0] for k in range(n_layers_n)]
    i += n_layers_n
    nb = [refs[i + k][0] for k in range(n_layers_n)]
    i += n_layers_n
    nln_s, nln_b = refs[i][0], refs[i + 1][0]
    return ew, eb, eln_s, eln_b, nw, nb, nln_s, nln_b


def _dma(src, dst):
    """Scoped synchronous DMA (start+wait); ~µs for the sizes used here."""
    def run(sem):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(run, pltpu.SemaphoreType.DMA(()))


def _make_kernel(n: int, e: int, latent: int, band_s: int, band_r: int,
                 chunk: int, n_layers_e: int, n_layers_n: int, mps: int,
                 cdtype, save_residuals: bool = False,
                 stream_saves: bool = False, return_edges: bool = False,
                 preproject: bool = False, save_h: bool = False,
                 node_extra: bool = False):
    chunks = e // chunk
    f32 = jnp.float32
    n_weights = n_layers_e * 2 + 2 + n_layers_n * 2 + 2
    n_h = n_layers_e - 1 if save_h else 0

    def kernel(starts_s_ref, starts_r_ref,  # scalar prefetch
               v0_ref, e0_ref, rel_s_ref, rel_r_ref, *refs):
        vsnap_ref = None
        if _PROBE == "round_indep":  # timing-only extra scratch, last slot
            vsnap_ref, refs = refs[-1], refs[:-1]
        xtr_ref = None
        if node_extra:
            # f32 (N, L) pre-activation offset added into the node MLP's
            # first layer — the multi-edge-set (cloth) path computes the
            # world-edge aggregate's W0 contribution outside and the kernel
            # folds it in (models/mgn_multi.apply_mgn_multi)
            xtr_ref, refs = refs[0], refs[1:]
        weight_refs = refs[:n_weights]
        refs = refs[n_weights:]
        ps_ref = qs_ref = None
        if preproject:
            ps_ref, qs_ref = refs[-2:]
            refs = refs[:-2]
        eout_ref = None
        if return_edges:
            eout_ref = refs[1]
            refs = refs[:1] + refs[2:]
        aggc_scr = None
        hsave_refs = ()
        if save_h:  # implies save_residuals and not stream_saves
            (vout_ref, vsave_ref, esave_ref, aggsave_ref, *rest2) = refs
            hsave_refs = rest2[:n_h]
            v_ref, e_ref, agg_ref = rest2[n_h:]
        elif save_residuals and stream_saves:
            (vout_ref, vsave_ref, esave_ref, aggsave_ref,
             v_ref, e_ref, agg_ref, aggc_scr) = refs
        elif save_residuals:
            (vout_ref, vsave_ref, esave_ref, aggsave_ref,
             v_ref, e_ref, agg_ref) = refs
        else:
            vout_ref, v_ref, e_ref, agg_ref = refs

        (ew, eb, eln_s, eln_b, nw, nb, nln_s, nln_b) = _unpack_weight_refs(
            weight_refs, n_layers_e, n_layers_n)

        r = pl.program_id(0)
        if vsnap_ref is not None:
            # round_indep: double-buffered agg kills the WAR hazard between
            # round k's node stage (reads agg) and round k+1's zeroing
            agg_ref = agg_ref.at[r % 2]

        @pl.when(r == 0)
        def _():
            # v0/e0 live in HBM (halves resident VMEM vs full-VMEM inputs);
            # one DMA into the persistent scratch at round 0
            def load(sem_v, sem_e):
                cp_v = pltpu.make_async_copy(v0_ref, v_ref, sem_v)
                cp_e = pltpu.make_async_copy(e0_ref, e_ref, sem_e)
                cp_v.start()
                cp_e.start()
                cp_v.wait()
                cp_e.wait()

            pl.run_scoped(load, pltpu.SemaphoreType.DMA(()),
                          pltpu.SemaphoreType.DMA(()))
            if vsnap_ref is not None:
                vsnap_ref[:] = v_ref[:]

        if save_residuals and not stream_saves:
            # start-of-round state for the backward kernel (VMEM windows)
            vsave_ref[0] = v_ref[:]
            esave_ref[0] = e_ref[:]
        elif save_residuals:
            # streamed saves: residual stacks are HBM (ANY) outputs; DMA the
            # start-of-round state out before the edge stage mutates it
            _dma(v_ref, vsave_ref.at[r])
            _dma(e_ref, esave_ref.at[r])

        agg_ref[:] = jnp.zeros((n, latent), f32)

        if preproject:
            # gathering commutes with the first-layer weight multiply:
            # project v through the vs/vr row-slices of W0 ONCE per round
            # (2 full (n,L)@(L,L) matmuls), then gather projected rows per
            # chunk — deletes the per-chunk vs/vr first-layer partial
            # matmuls (2 of the 3), ~16% of round FLOPs
            # (docs/performance.md round-2 bisection).
            w0 = ew[0]  # (3L, L): rows [0:L]=e_c, [L:2L]=vs, [2L:3L]=vr
            v_all = vsnap_ref[:] if vsnap_ref is not None else v_ref[:]
            ps_ref[:] = jax.lax.dot_general(
                v_all, w0[latent:2 * latent, :], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            qs_ref[:] = jax.lax.dot_general(
                v_all, w0[2 * latent:3 * latent, :], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        def edge_chunk(c, _):
            # starts are _ALIGN-aligned by plan construction; tell Mosaic
            ss = pl.multiple_of(starts_s_ref[c], _ALIGN)
            sr = pl.multiple_of(starts_r_ref[c], _ALIGN)
            rel_s = rel_s_ref[c]  # (chunk,)
            rel_r = rel_r_ref[c]
            base = pl.multiple_of(c * chunk, chunk)
            e_c = e_ref[pl.ds(base, chunk), :]
            if not preproject:
                v_src = vsnap_ref if vsnap_ref is not None else v_ref
                v_band_s = v_src[pl.ds(ss, band_s), :]
                v_band_r = v_src[pl.ds(sr, band_r), :]
            if _PROBE == "const_oh":  # loop-invariant: build hoisted/CSE'd
                oh_s = (jax.lax.broadcasted_iota(
                    jnp.int32, (band_s, chunk), 0) == 0).astype(cdtype)
                oh_r = (jax.lax.broadcasted_iota(
                    jnp.int32, (band_r, chunk), 0) == 0).astype(cdtype)
            else:
                oh_s = (jax.lax.broadcasted_iota(
                    jnp.int32, (band_s, chunk), 0)
                        == rel_s[None, :]).astype(cdtype)
                oh_r = (jax.lax.broadcasted_iota(
                    jnp.int32, (band_r, chunk), 0)
                        == rel_r[None, :]).astype(cdtype)
            if preproject:
                if _PROBE == "skip_gather":
                    extra = jnp.zeros((chunk, latent), f32)
                else:
                    p_band = ps_ref[pl.ds(ss, band_s), :]
                    q_band = qs_ref[pl.ds(sr, band_r), :]
                    extra = jax.lax.dot_general(  # gather of projected rows
                        oh_s, p_band, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    extra = extra + jax.lax.dot_general(
                        oh_r, q_band, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                if _PROBE == "skip_mlp":
                    msg = extra.astype(cdtype)
                else:
                    msg, cache_f = _mlp_fwd((e_c,), ew, eb, eln_s, eln_b,
                                            (latent,), cdtype,
                                            extra_acc=extra)
                    for i_h in range(n_h):
                        hsave_refs[i_h][0, pl.ds(base, chunk), :] = \
                            cache_f[1][i_h]
            elif _PROBE == "skip_gather":
                vs = e_c
                vr = e_c
                msg = vs if _PROBE == "skip_mlp" else _mlp_fwd(
                    (e_c, vs, vr), ew, eb, eln_s, eln_b,
                    (latent, latent, latent), cdtype)[0]
            else:
                vs = jax.lax.dot_general(  # onehotᵀ @ band — gather
                    oh_s, v_band_s, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                vr = jax.lax.dot_general(
                    oh_r, v_band_r, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                if _PROBE == "skip_mlp":
                    msg = vs
                else:
                    msg, cache_f = _mlp_fwd((e_c, vs, vr), ew, eb, eln_s,
                                            eln_b, (latent, latent, latent),
                                            cdtype)
                    for i_h in range(n_h):
                        hsave_refs[i_h][0, pl.ds(base, chunk), :] = \
                            cache_f[1][i_h]
            e_ref[pl.ds(base, chunk), :] = e_c + msg
            if _PROBE != "skip_scatter":
                contrib = jax.lax.dot_general(  # onehot @ msg — scatter-add
                    oh_r, msg, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                agg_ref[pl.ds(sr, band_r), :] += contrib
            return 0

        jax.lax.fori_loop(0, chunks, edge_chunk, 0,
                          unroll=chunks <= _UNROLL_CHUNKS_MAX)

        if save_residuals and not stream_saves:
            aggsave_ref[0] = agg_ref[:].astype(cdtype)
        elif save_residuals:
            aggc_scr[:] = agg_ref[:].astype(cdtype)
            _dma(aggc_scr, aggsave_ref.at[r])

        # node stage: no gather — blocked MXU matmuls over (node_blk, L)
        # rows (bounds the MLP temporaries for big-N meshes)
        node_blk = _node_block(n)
        for b in range(n // node_blk):
            sl = pl.ds(b * node_blk, node_blk)
            v_c = v_ref[sl, :]
            agg_c = agg_ref[sl, :].astype(cdtype)
            upd, _ = _mlp_fwd((v_c, agg_c), nw, nb, nln_s, nln_b,
                              (latent, latent), cdtype,
                              extra_acc=xtr_ref[sl, :] if node_extra
                              else None)
            v_ref[sl, :] = v_c + upd

        @pl.when(r == mps - 1)
        def _():
            vout_ref[:] = v_ref[:]
            if return_edges:
                eout_ref[:] = e_ref[:]

    return kernel


def _make_kernel_stream_e(n: int, e: int, latent: int, band_s: int,
                          band_r: int, chunk: int, n_layers_e: int,
                          n_layers_n: int, mps: int, cdtype,
                          save_residuals: bool = False,
                          preproject: bool = False):
    """Edge-streaming forward for meshes whose edge latents do not fit VMEM.

    Node latents / aggregation stay VMEM-resident (O(N·L)); the edge-latent
    carry lives **inside the edge output buffer** (HBM) and is read-modify-
    written per ``chunk`` with 2-slot prefetched reads and 2-slot deferred
    writes (the protocol of :func:`_make_bwd_kernel_stream`).  Round 0 reads
    chunks from the ``e0`` input; later rounds read the carry.  The resident
    footprint is O(N·L + chunk·L), independent of E — this keeps the fused
    round fast on 10k-node-class single-chip meshes that previously fell
    back to the banded path (docs/performance.md).  ``save_residuals``
    additionally streams per-round (v, e, agg) stacks to HBM for the
    streaming backward kernel; the primal always returns ``(v, e)``.
    """
    chunks = e // chunk
    f32 = jnp.float32
    n_weights = n_layers_e * 2 + 2 + n_layers_n * 2 + 2

    def kernel(starts_s_ref, starts_r_ref,  # scalar prefetch
               v0_ref, e0_ref, rel_s_ref, rel_r_ref, *refs):
        weight_refs = refs[:n_weights]
        refs = refs[n_weights:]
        if save_residuals:
            (vout_ref, ecarry_ref, vsave_ref, esave_ref, aggsave_ref) = \
                refs[:5]
            refs = refs[5:]
        else:
            vout_ref, ecarry_ref = refs[:2]
            refs = refs[2:]
        ps_ref = qs_ref = None
        if preproject:
            v_ref, agg_ref, ps_ref, qs_ref = refs[:4]
            refs = refs[4:]
        else:
            v_ref, agg_ref = refs[:2]
            refs = refs[2:]
        if save_residuals:
            ec_scr, eo_scr, aggc_scr, sem_e, sem_w, sem_s = refs
        else:
            ec_scr, eo_scr, sem_e, sem_w = refs

        (ew, eb, eln_s, eln_b, nw, nb, nln_s, nln_b) = _unpack_weight_refs(
            weight_refs, n_layers_e, n_layers_n)

        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            _dma(v0_ref, v_ref)  # v resident; e stays in HBM

        if save_residuals:
            _dma(v_ref, vsave_ref.at[r])  # start-of-round node latents

        agg_ref[:] = jnp.zeros((n, latent), f32)

        if preproject:
            w0 = ew[0]
            v_all = v_ref[:]
            ps_ref[:] = jax.lax.dot_general(
                v_all, w0[latent:2 * latent, :], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            qs_ref[:] = jax.lax.dot_general(
                v_all, w0[2 * latent:3 * latent, :], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        def read0(slot, c):  # round 0: chunks come from the e0 input
            return pltpu.make_async_copy(
                e0_ref.at[pl.ds(c * chunk, chunk)],
                ec_scr.at[slot], sem_e.at[slot])

        def readc(slot, c):  # later rounds: read the HBM carry
            return pltpu.make_async_copy(
                ecarry_ref.at[pl.ds(c * chunk, chunk)],
                ec_scr.at[slot], sem_e.at[slot])

        def start_read(slot, c):
            @pl.when(r == 0)
            def _():
                read0(slot, c).start()

            @pl.when(r > 0)
            def _():
                readc(slot, c).start()

        def write_eo(slot, c):
            return pltpu.make_async_copy(
                eo_scr.at[slot],
                ecarry_ref.at[pl.ds(c * chunk, chunk)], sem_w.at[slot])

        def save_e(slot, c):
            return pltpu.make_async_copy(
                ec_scr.at[slot],
                esave_ref.at[r, pl.ds(c * chunk, chunk)], sem_s.at[slot])

        start_read(0, 0)

        def chunk_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < chunks)
            def _():
                # the (c+1) slot was last used by chunk c-1: its save DMA
                # (reading ec_scr) must land before the read overwrites it
                if save_residuals:
                    @pl.when(c >= 1)
                    def _():
                        save_e((c + 1) % 2, c - 1).wait()

                start_read((c + 1) % 2, c + 1)

            readc(slot, c).wait()
            e_c = ec_scr[slot]
            if save_residuals:
                save_e(slot, c).start()

            ss = pl.multiple_of(starts_s_ref[c], _ALIGN)
            sr = pl.multiple_of(starts_r_ref[c], _ALIGN)
            rel_s = rel_s_ref[c]
            rel_r = rel_r_ref[c]
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (band_s, chunk), 0)
                    == rel_s[None, :]).astype(cdtype)
            oh_r = (jax.lax.broadcasted_iota(jnp.int32, (band_r, chunk), 0)
                    == rel_r[None, :]).astype(cdtype)
            if preproject:
                extra = jax.lax.dot_general(
                    oh_s, ps_ref[pl.ds(ss, band_s), :],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
                extra = extra + jax.lax.dot_general(
                    oh_r, qs_ref[pl.ds(sr, band_r), :],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
                msg, _ = _mlp_fwd((e_c,), ew, eb, eln_s, eln_b,
                                  (latent,), cdtype, extra_acc=extra)
            else:
                vs = jax.lax.dot_general(
                    oh_s, v_ref[pl.ds(ss, band_s), :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                vr = jax.lax.dot_general(
                    oh_r, v_ref[pl.ds(sr, band_r), :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                msg, _ = _mlp_fwd((e_c, vs, vr), ew, eb, eln_s, eln_b,
                                  (latent, latent, latent), cdtype)

            @pl.when(c >= 2)  # slot reused: prior write must have landed
            def _():
                write_eo(slot, c - 2).wait()

            eo_scr[slot] = e_c + msg
            write_eo(slot, c).start()
            contrib = jax.lax.dot_general(  # onehot @ msg — scatter-add
                oh_r, msg, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            agg_ref[pl.ds(sr, band_r), :] += contrib
            return 0

        jax.lax.fori_loop(0, chunks, chunk_body, 0)
        # drain outstanding carry writes (next round reads them) and saves
        for c in range(max(chunks - 2, 0), chunks):
            write_eo(c % 2, c).wait()
            if save_residuals:
                save_e(c % 2, c).wait()

        if save_residuals:
            aggc_scr[:] = agg_ref[:].astype(cdtype)
            _dma(aggc_scr, aggsave_ref.at[r])

        node_blk = _node_block(n)
        for b in range(n // node_blk):
            sl = pl.ds(b * node_blk, node_blk)
            v_c = v_ref[sl, :]
            agg_c = agg_ref[sl, :].astype(cdtype)
            upd, _ = _mlp_fwd((v_c, agg_c), nw, nb, nln_s, nln_b,
                              (latent, latent), cdtype)
            v_ref[sl, :] = v_c + upd

        @pl.when(r == mps - 1)
        def _():
            vout_ref[:] = v_ref[:]

    return kernel


def _make_bwd_kernel(n: int, e: int, latent: int, band_s: int, band_r: int,
                     chunk: int, n_layers_e: int, n_layers_n: int, mps: int,
                     cdtype, with_ge: bool = False,
                     defer_first: bool = False,
                     batch_wgrads: bool = False,
                     save_h: bool = False,
                     node_extra: bool = False):
    """Reverse-round backward: grid step g processes round mps-1-g.

    Consumes the saved per-round (v, e, agg) stacks; recomputes each chunk's
    MLP intermediates on the fly (memory-efficient discrete adjoint).
    Cotangent carries (dv, de) live in VMEM scratch in ``cdtype`` (JAX's
    cotangent dtype for a ``cdtype`` primal); weight grads are f32.
    ``with_ge``: an incoming edge-latent cotangent seeds the ``de`` carry
    (the ``return_edges`` forward).

    ``batch_wgrads`` (requires ``defer_first``): edge-MLP weight/bias grads
    are not accumulated per chunk; the per-chunk activations and cotangents
    are stashed into (E, L) VMEM stacks and each layer's ``dW`` becomes ONE
    (E,L)ᵀ@(E,L) matmul per round (3 big matmuls instead of 3 per chunk) —
    trades 2·n_layers-1 extra (E, L) buffers for a much shorter serial
    chunk chain (``_FORCE_WGB``).

    ``defer_first``: the deferred first-layer backward.  Per chunk, instead
    of materialising ``dvs``/``dvr`` (2 matmuls), scattering each (2) and
    accumulating their ``dW0`` rows (2), the raw first-layer cotangent
    ``dh0`` is scattered once per side into f32 node-space accumulators
    ``G_s``/``G_r``; at end of round ``dv += G @ W0_sliceᵀ`` and
    ``dW0_slice = v_savedᵀ @ G`` recover the same quantities with 4
    (N, L)-class matmuls per round — moving 4·E·L² FLOPs/round down to
    4·N·L² and shortening the serial per-chunk chain.  The recompute is
    pre-projected through the same W0 slices (mirrors the forward's
    ``preproject``), so ``vs``/``vr`` are never materialised at all.
    """
    chunks = e // chunk
    f32 = jnp.float32
    n_weights = n_layers_e * 2 + 2 + n_layers_n * 2 + 2

    n_h = n_layers_e - 1 if save_h else 0

    def kernel(starts_s_ref, starts_r_ref, *pre):
        if with_ge:
            (rel_s_ref, rel_r_ref, g_ref, ge_ref, vsave_ref, esave_ref,
             aggsave_ref) = pre[:7]
            base = 7
        else:
            (rel_s_ref, rel_r_ref, g_ref, vsave_ref, esave_ref,
             aggsave_ref) = pre[:6]
            base = 6
        xtr_ref = None
        if node_extra:
            xtr_ref = pre[base]
            base += 1
        hsave_refs, refs = pre[base:base + n_h], pre[base + n_h:]
        weight_refs = refs[:n_weights]
        grad_refs = refs[n_weights:n_weights * 2]
        n_out = 3 if node_extra else 2
        dv0_ref, de0_ref = refs[n_weights * 2:n_weights * 2 + 2]
        dxtr_ref = refs[n_weights * 2 + 2] if node_extra else None
        rest = refs[n_weights * 2 + n_out:]
        dh_scr = post_scr = None
        if batch_wgrads:
            n_wgb = n_layers_e if save_h else 2 * n_layers_e - 1
            rest, wgb_scr = rest[:-n_wgb], rest[-n_wgb:]
            dh_scr = wgb_scr[:n_layers_e]
            post_scr = wgb_scr[n_layers_e:]
        ps_ref = qs_ref = None
        if defer_first and save_h:
            (dv_ref, de_ref, dagg_ref, gs_ref, gr_ref) = rest
        elif defer_first:
            (dv_ref, de_ref, dagg_ref, ps_ref, qs_ref, gs_ref,
             gr_ref) = rest
        else:
            dv_ref, de_ref, dagg_ref = rest

        (ew, eb, eln_s, eln_b, nw, nb, nln_s, nln_b) = _unpack_weight_refs(
            weight_refs, n_layers_e, n_layers_n)

        # per-round transposed adjoint weights (one (L,·) transpose per
        # weight per round instead of a layout fix-up per adjoint matmul)
        wt_e = [jnp.swapaxes(w, 0, 1) for w in ew] if _FORCE_WT else None
        wt_n = [jnp.swapaxes(w, 0, 1) for w in nw] if _FORCE_WT else None

        gidx = pl.program_id(0)

        @pl.when(gidx == 0)
        def _():
            dv_ref[:] = g_ref[:].astype(cdtype)
            if with_ge:
                de_ref[:] = ge_ref[:]
            else:
                de_ref[:] = jnp.zeros((e, latent), cdtype)

        # ---- node stage backward (blocked rows) ------------------------------
        i = n_layers_e * 2 + 2
        node_blk = _node_block(n)
        if _PROBE == "bwd_skip_node":  # timing-only: zero node-stage work
            dagg_ref[:] = jnp.zeros((n, latent), f32)
            for k in range(n_layers_n * 2 + 2):
                grad_refs[i + k][0] = jnp.zeros(
                    grad_refs[i + k].shape[1:], f32)
        for b in range(n // node_blk if _PROBE != "bwd_skip_node" else 0):
            sl = pl.ds(b * node_blk, node_blk)
            v_c = vsave_ref[0, sl, :]  # start-of-round latents
            agg_c = aggsave_ref[0, sl, :]
            upd, cache_n = _mlp_fwd((v_c, agg_c), nw, nb, nln_s, nln_b,
                                    (latent, latent), cdtype,
                                    extra_acc=xtr_ref[sl, :] if node_extra
                                    else None)
            dupd = dv_ref[sl, :]  # v' = v + upd  =>  d upd = dv'
            (dv_p, dagg_p), dnw, dnb, dgn, dbn, dh_node = _mlp_bwd(
                dupd, cache_n, (v_c, agg_c), nw, nln_s, (latent, latent),
                cdtype, wts=wt_n)
            dv_ref[sl, :] = dv_ref[sl, :] + dv_p
            dagg_ref[sl, :] = dagg_p.astype(f32)
            if node_extra:
                # the extra enters the first layer additively, so its
                # cotangent is the raw pre-activation cotangent
                dxtr_ref[sl, :] = dh_node.astype(f32)
            parts = dnw + dnb + [dgn, dbn]
            for k, gval in enumerate(parts):
                if b == 0:
                    grad_refs[i + k][0] = gval
                else:
                    grad_refs[i + k][0] += gval

        # ---- edge stage backward (per chunk, recompute + adjoint) -----------
        def zeros_like_ref(ref):
            ref[0] = jnp.zeros(ref.shape[1:], f32)

        for k in range(n_layers_e * 2 + 2):
            zeros_like_ref(grad_refs[k])

        if defer_first:
            if not save_h:
                # pre-project saved node latents through the vs/vr W0
                # row-slices (mirrors the forward preproject) for the
                # recompute; with saved activations no recompute happens
                w0 = ew[0]
                v_all = vsave_ref[0]
                ps_ref[:] = jax.lax.dot_general(
                    v_all, w0[latent:2 * latent, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                qs_ref[:] = jax.lax.dot_general(
                    v_all, w0[2 * latent:3 * latent, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
            gs_ref[:] = jnp.zeros((n, latent), f32)
            gr_ref[:] = jnp.zeros((n, latent), f32)

        def edge_chunk_deferred(c, _):
            ss = pl.multiple_of(starts_s_ref[c], _ALIGN)
            sr = pl.multiple_of(starts_r_ref[c], _ALIGN)
            rel_s = rel_s_ref[c]
            rel_r = rel_r_ref[c]
            base = pl.multiple_of(c * chunk, chunk)
            e_c = esave_ref[0, pl.ds(base, chunk), :]
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (band_s, chunk), 0)
                    == rel_s[None, :]).astype(cdtype)
            oh_r = (jax.lax.broadcasted_iota(jnp.int32, (band_r, chunk), 0)
                    == rel_r[None, :]).astype(cdtype)
            if save_h:
                # rebuild the MLP cache from the saved post-relu hidden
                # activations: ONE matmul (final pre-activation) + LN stats
                # instead of 2 gathers + n_layers matmuls of recompute.
                # relu masks use post > 0 (== pre > 0 where it matters).
                h_posts = [hsave_refs[i][0, pl.ds(base, chunk), :]
                           for i in range(n_h)]
                pre_last = jax.lax.dot_general(
                    h_posts[-1], ew[n_layers_e - 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype) \
                    + eb[n_layers_e - 1]
                h32 = pre_last.astype(f32)
                mean = jnp.mean(h32, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(h32 - mean), axis=-1,
                               keepdims=True)
                rstd = jax.lax.rsqrt(var + 1e-5)
                xhat = (h32 - mean) * rstd
                cache_e = (list(h_posts) + [pre_last], list(h_posts),
                           xhat, rstd)
            else:
                extra = jax.lax.dot_general(  # gather of pre-projected rows
                    oh_s, ps_ref[pl.ds(ss, band_s), :],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
                extra = extra + jax.lax.dot_general(
                    oh_r, qs_ref[pl.ds(sr, band_r), :],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
                _, cache_e = _mlp_fwd((e_c,), ew, eb, eln_s, eln_b,
                                      (latent,), cdtype, extra_acc=extra)
            de_c = de_ref[pl.ds(base, chunk), :]
            dmsg = de_c + jax.lax.dot_general(
                oh_r, dagg_ref[pl.ds(sr, band_r), :].astype(cdtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32).astype(cdtype)
            sink = None
            if batch_wgrads:
                def sink(level, p, dh_l):
                    dh_scr[level][pl.ds(base, chunk), :] = dh_l
                    if level > 0 and not save_h:  # posts live in hsave
                        post_scr[level - 1][pl.ds(base, chunk), :] = p
            (de_p,), dew, deb, dge, dbe, dh0 = _mlp_bwd(
                dmsg, cache_e, (e_c,), ew, eln_s, (latent,), cdtype,
                wts=wt_e, wgrad_sink=sink)
            de_ref[pl.ds(base, chunk), :] = de_c + de_p
            # scatter dh0 into node space (f32 accumulators); dv and dW0's
            # vs/vr rows are recovered once per round after the loop
            dh0c = dh0.astype(cdtype)
            gs_ref[pl.ds(ss, band_s), :] += jax.lax.dot_general(
                oh_s, dh0c, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            gr_ref[pl.ds(sr, band_r), :] += jax.lax.dot_general(
                oh_r, dh0c, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            if not batch_wgrads:
                grad_refs[0][0, 0:latent, :] += dew[0]
                for k in range(1, n_layers_e):
                    grad_refs[k][0] += dew[k]
                for k in range(n_layers_e):
                    grad_refs[n_layers_e + k][0] += deb[k]
            grad_refs[2 * n_layers_e][0] += dge
            grad_refs[2 * n_layers_e + 1][0] += dbe
            return 0

        def edge_chunk_bwd(c, _):
            ss = pl.multiple_of(starts_s_ref[c], _ALIGN)
            sr = pl.multiple_of(starts_r_ref[c], _ALIGN)
            rel_s = rel_s_ref[c]
            rel_r = rel_r_ref[c]
            base = pl.multiple_of(c * chunk, chunk)
            e_c = esave_ref[0, pl.ds(base, chunk), :]
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (band_s, chunk), 0)
                    == rel_s[None, :]).astype(cdtype)
            oh_r = (jax.lax.broadcasted_iota(jnp.int32, (band_r, chunk), 0)
                    == rel_r[None, :]).astype(cdtype)
            if _PROBE == "bwd_skip_recompute":
                # timing-only: fake the recompute cache (wrong numerics);
                # pre/post stay f32 like the real path (bf16 cmpf rejected)
                vs = vr = e_c
                e32 = e_c.astype(f32)
                cache_e = ([e32] * n_layers_e, [e32] * (n_layers_e - 1),
                           e32, jnp.ones((chunk, 1), f32))
            else:
                if _PROBE == "bwd_skip_gather":
                    vs = vr = e_c  # timing-only: no gather matmuls
                else:
                    vs = jax.lax.dot_general(
                        oh_s, vsave_ref[0, pl.ds(ss, band_s), :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=f32).astype(cdtype)
                    vr = jax.lax.dot_general(
                        oh_r, vsave_ref[0, pl.ds(sr, band_r), :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=f32).astype(cdtype)
                _, cache_e = _mlp_fwd((e_c, vs, vr), ew, eb, eln_s, eln_b,
                                      (latent, latent, latent), cdtype)
            # dmsg = de' (residual) + gather of dagg (scatter-add adjoint)
            de_c = de_ref[pl.ds(base, chunk), :]
            if _PROBE == "bwd_skip_dflow":
                dmsg = de_c  # timing-only: no dagg gather
            else:
                dmsg = de_c + jax.lax.dot_general(
                    oh_r, dagg_ref[pl.ds(sr, band_r), :].astype(cdtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
            if _PROBE == "bwd_skip_mlpbwd":
                de_p, dvs, dvr = dmsg, dmsg, dmsg  # timing-only
                dew = deb = None
            else:
                (de_p, dvs, dvr), dew, deb, dge, dbe, _ = _mlp_bwd(
                    dmsg, cache_e, (e_c, vs, vr), ew, eln_s,
                    (latent, latent, latent), cdtype, wts=wt_e)
            if _PROBE != "bwd_skip_dflow":
                de_ref[pl.ds(base, chunk), :] = de_c + de_p
                # gather adjoints: scatter dvs/dvr back into the dv bands
                dv_ref[pl.ds(ss, band_s), :] += jax.lax.dot_general(
                    oh_s, dvs, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                dv_ref[pl.ds(sr, band_r), :] += jax.lax.dot_general(
                    oh_r, dvr, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
            if dew is not None and _PROBE != "bwd_skip_wgrads":
                for k in range(n_layers_e):
                    grad_refs[k][0] += dew[k]
                    grad_refs[n_layers_e + k][0] += deb[k]
                grad_refs[2 * n_layers_e][0] += dge
                grad_refs[2 * n_layers_e + 1][0] += dbe
            return 0

        jax.lax.fori_loop(0, chunks,
                          edge_chunk_deferred if defer_first
                          else edge_chunk_bwd, 0,
                          unroll=chunks <= _UNROLL_CHUNKS_MAX)

        if batch_wgrads:
            # one big (E,L)ᵀ@(E,L) weight-grad matmul per layer per round
            # (plus one bias-sum per layer) from the stashed stacks
            grad_refs[0][0, 0:latent, :] += jax.lax.dot_general(
                esave_ref[0], dh_scr[0][:], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            for lv in range(1, n_layers_e):
                post_src = (hsave_refs[lv - 1][0] if save_h
                            else post_scr[lv - 1][:])
                grad_refs[lv][0] += jax.lax.dot_general(
                    post_src, dh_scr[lv][:],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
            for lv in range(n_layers_e):
                grad_refs[n_layers_e + lv][0] += jnp.sum(
                    dh_scr[lv][:].astype(f32), axis=0, keepdims=True)

        if defer_first:
            # deferred first-layer: dv += G_s @ W0_vsᵀ + G_r @ W0_vrᵀ;
            # dW0 vs/vr rows = v_savedᵀ @ G (4 (N,L)-class matmuls/round)
            w0 = ew[0]
            if wt_e is not None:
                dv_f = jax.lax.dot_general(
                    gs_ref[:], wt_e[0][:, latent:2 * latent],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                dv_f = dv_f + jax.lax.dot_general(
                    gr_ref[:], wt_e[0][:, 2 * latent:3 * latent],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
            else:
                dv_f = jax.lax.dot_general(
                    gs_ref[:], w0[latent:2 * latent, :],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
                dv_f = dv_f + jax.lax.dot_general(
                    gr_ref[:], w0[2 * latent:3 * latent, :],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
            dv_ref[:] += dv_f.astype(cdtype)
            grad_refs[0][0, latent:2 * latent, :] = jax.lax.dot_general(
                vsave_ref[0], gs_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            grad_refs[0][0, 2 * latent:3 * latent, :] = jax.lax.dot_general(
                vsave_ref[0], gr_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)

        @pl.when(gidx == mps - 1)
        def _():
            dv0_ref[:] = dv_ref[:]
            de0_ref[:] = de_ref[:]

    return kernel


def _make_bwd_kernel_stream(n: int, e: int, latent: int, band_s: int,
                            band_r: int, chunk: int, n_layers_e: int,
                            n_layers_n: int, mps: int, cdtype,
                            with_ge: bool = False,
                            defer_first: bool = False):
    """Streaming variant of the reverse-round backward for meshes whose edge
    arrays do not fit VMEM: the saved residual stacks stay in HBM (per-round
    v/agg DMA'd whole; e DMA'd per chunk with 2-slot prefetch) and the ``de``
    cotangent carry lives **inside the de0 output buffer** (HBM), read-
    modify-written per chunk.  dv and the weight-grad accumulators stay in
    VMEM — the resident footprint is O(N·L + chunk·L), independent of E.
    ``with_ge``: the first processed round's ``de`` chunks are DMA'd from the
    incoming edge cotangent (HBM) instead of being masked to zero.
    """
    chunks = e // chunk
    f32 = jnp.float32
    n_weights = n_layers_e * 2 + 2 + n_layers_n * 2 + 2

    def kernel(starts_s_ref, starts_r_ref, *pre):
        if with_ge:
            (rel_s_ref, rel_r_ref, g_ref, ge_ref, vsave_ref, esave_ref,
             aggsave_ref), refs = pre[:7], pre[7:]
        else:
            ge_ref = None
            (rel_s_ref, rel_r_ref, g_ref, vsave_ref, esave_ref,
             aggsave_ref), refs = pre[:6], pre[6:]
        weight_refs = refs[:n_weights]
        grad_refs = refs[n_weights:n_weights * 2]
        dv0_ref, de0_ref = refs[n_weights * 2:n_weights * 2 + 2]
        ps_ref = qs_ref = gs_ref = gr_ref = None
        if defer_first:
            (dv_ref, dagg_ref, vs_scr, aggc_scr, ec_scr, dec_scr, deo_scr,
             ps_ref, qs_ref, gs_ref, gr_ref,
             sem_e, sem_d, sem_w) = refs[n_weights * 2 + 2:]
        else:
            (dv_ref, dagg_ref, vs_scr, aggc_scr, ec_scr, dec_scr, deo_scr,
             sem_e, sem_d, sem_w) = refs[n_weights * 2 + 2:]

        (ew, eb, eln_s, eln_b, nw, nb, nln_s, nln_b) = _unpack_weight_refs(
            weight_refs, n_layers_e, n_layers_n)

        wt_e = [jnp.swapaxes(w, 0, 1) for w in ew] if _FORCE_WT else None
        wt_n = [jnp.swapaxes(w, 0, 1) for w in nw] if _FORCE_WT else None

        gidx = pl.program_id(0)
        ridx = mps - 1 - gidx

        @pl.when(gidx == 0)
        def _():
            dv_ref[:] = g_ref[:].astype(cdtype)

        _dma(vsave_ref.at[ridx], vs_scr)
        _dma(aggsave_ref.at[ridx], aggc_scr)

        # ---- node stage backward (blocked rows) ------------------------------
        i = n_layers_e * 2 + 2
        node_blk = _node_block(n)
        for b in range(n // node_blk):
            sl = pl.ds(b * node_blk, node_blk)
            v_c = vs_scr[sl, :]
            agg_c = aggc_scr[sl, :]
            upd, cache_n = _mlp_fwd((v_c, agg_c), nw, nb, nln_s, nln_b,
                                    (latent, latent), cdtype)
            dupd = dv_ref[sl, :]
            (dv_p, dagg_p), dnw, dnb, dgn, dbn, _ = _mlp_bwd(
                dupd, cache_n, (v_c, agg_c), nw, nln_s, (latent, latent),
                cdtype, wts=wt_n)
            dv_ref[sl, :] = dv_ref[sl, :] + dv_p
            dagg_ref[sl, :] = dagg_p.astype(f32)
            parts = dnw + dnb + [dgn, dbn]
            for k, gval in enumerate(parts):
                if b == 0:
                    grad_refs[i + k][0] = gval
                else:
                    grad_refs[i + k][0] += gval

        for k in range(n_layers_e * 2 + 2):
            grad_refs[k][0] = jnp.zeros(grad_refs[k].shape[1:], f32)

        if defer_first:
            w0 = ew[0]
            ps_ref[:] = jax.lax.dot_general(
                vs_scr[:], w0[latent:2 * latent, :], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            qs_ref[:] = jax.lax.dot_general(
                vs_scr[:], w0[2 * latent:3 * latent, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            gs_ref[:] = jnp.zeros((n, latent), f32)
            gr_ref[:] = jnp.zeros((n, latent), f32)

        # ---- edge chunks: 2-slot prefetched reads, 2-slot deferred writes ---
        def read_e(slot, c):
            return pltpu.make_async_copy(
                esave_ref.at[ridx, pl.ds(c * chunk, chunk)],
                ec_scr.at[slot], sem_e.at[slot])

        def read_d(slot, c):
            # at gidx==0 the buffer is uninitialized; the value is masked to
            # zero below (or, with_ge, the DMA reads the ge input instead);
            # the DMA keeps the slot protocol uniform
            return pltpu.make_async_copy(
                de0_ref.at[pl.ds(c * chunk, chunk)],
                dec_scr.at[slot], sem_d.at[slot])

        def read_g0(slot, c):
            return pltpu.make_async_copy(
                ge_ref.at[pl.ds(c * chunk, chunk)],
                dec_scr.at[slot], sem_d.at[slot])

        def start_read_d(slot, c):
            if not with_ge:
                read_d(slot, c).start()
                return

            @pl.when(gidx == 0)
            def _():
                read_g0(slot, c).start()

            @pl.when(gidx > 0)
            def _():
                read_d(slot, c).start()

        def write_d(slot, c):
            return pltpu.make_async_copy(
                deo_scr.at[slot],
                de0_ref.at[pl.ds(c * chunk, chunk)], sem_w.at[slot])

        read_e(0, 0).start()
        start_read_d(0, 0)

        def chunk_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < chunks)
            def _():
                read_e((c + 1) % 2, c + 1).start()

            @pl.when(c + 1 < chunks)
            def _():
                start_read_d((c + 1) % 2, c + 1)

            read_e(slot, c).wait()
            read_d(slot, c).wait()
            ss = pl.multiple_of(starts_s_ref[c], _ALIGN)
            sr = pl.multiple_of(starts_r_ref[c], _ALIGN)
            rel_s = rel_s_ref[c]
            rel_r = rel_r_ref[c]
            e_c = ec_scr[slot]
            if with_ge:
                de_c = dec_scr[slot]  # gidx==0 chunks were DMA'd from ge
            else:
                # first processed round: the de0 buffer is uninitialized HBM
                # — select (not multiply: NaN-safe) zero
                de_c = jnp.where(gidx > 0, dec_scr[slot],
                                 jnp.zeros((chunk, latent), cdtype))
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (band_s, chunk), 0)
                    == rel_s[None, :]).astype(cdtype)
            oh_r = (jax.lax.broadcasted_iota(jnp.int32, (band_r, chunk), 0)
                    == rel_r[None, :]).astype(cdtype)
            if defer_first:
                extra = jax.lax.dot_general(
                    oh_s, ps_ref[pl.ds(ss, band_s), :],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
                extra = extra + jax.lax.dot_general(
                    oh_r, qs_ref[pl.ds(sr, band_r), :],
                    (((0,), (0,)), ((), ())), preferred_element_type=f32)
                _, cache_e = _mlp_fwd((e_c,), ew, eb, eln_s, eln_b,
                                      (latent,), cdtype, extra_acc=extra)
            else:
                vs = jax.lax.dot_general(
                    oh_s, vs_scr[pl.ds(ss, band_s), :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                vr = jax.lax.dot_general(
                    oh_r, vs_scr[pl.ds(sr, band_r), :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                _, cache_e = _mlp_fwd((e_c, vs, vr), ew, eb, eln_s, eln_b,
                                      (latent, latent, latent), cdtype)
            dmsg = de_c + jax.lax.dot_general(
                oh_r, dagg_ref[pl.ds(sr, band_r), :].astype(cdtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32).astype(cdtype)
            if defer_first:
                (de_p,), dew, deb, dge, dbe, dh0 = _mlp_bwd(
                    dmsg, cache_e, (e_c,), ew, eln_s, (latent,), cdtype,
                    wts=wt_e)
            else:
                (de_p, dvs, dvr), dew, deb, dge, dbe, _ = _mlp_bwd(
                    dmsg, cache_e, (e_c, vs, vr), ew, eln_s,
                    (latent, latent, latent), cdtype, wts=wt_e)

            @pl.when(c >= 2)  # slot reused: prior write must have landed
            def _():
                write_d(slot, c - 2).wait()

            deo_scr[slot] = de_c + de_p
            write_d(slot, c).start()
            if defer_first:
                dh0c = dh0.astype(cdtype)
                gs_ref[pl.ds(ss, band_s), :] += jax.lax.dot_general(
                    oh_s, dh0c, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                gr_ref[pl.ds(sr, band_r), :] += jax.lax.dot_general(
                    oh_r, dh0c, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                grad_refs[0][0, 0:latent, :] += dew[0]
                for k in range(1, n_layers_e):
                    grad_refs[k][0] += dew[k]
                for k in range(n_layers_e):
                    grad_refs[n_layers_e + k][0] += deb[k]
            else:
                dv_ref[pl.ds(ss, band_s), :] += jax.lax.dot_general(
                    oh_s, dvs, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                dv_ref[pl.ds(sr, band_r), :] += jax.lax.dot_general(
                    oh_r, dvr, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32).astype(cdtype)
                for k in range(n_layers_e):
                    grad_refs[k][0] += dew[k]
                    grad_refs[n_layers_e + k][0] += deb[k]
            grad_refs[2 * n_layers_e][0] += dge
            grad_refs[2 * n_layers_e + 1][0] += dbe
            return 0

        jax.lax.fori_loop(0, chunks, chunk_body, 0)
        # drain outstanding de writes before the next round reads them
        for c in range(max(chunks - 2, 0), chunks):
            write_d(c % 2, c).wait()

        if defer_first:
            w0 = ew[0]
            if wt_e is not None:
                dv_f = jax.lax.dot_general(
                    gs_ref[:], wt_e[0][:, latent:2 * latent],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                dv_f = dv_f + jax.lax.dot_general(
                    gr_ref[:], wt_e[0][:, 2 * latent:3 * latent],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
            else:
                dv_f = jax.lax.dot_general(
                    gs_ref[:], w0[latent:2 * latent, :],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
                dv_f = dv_f + jax.lax.dot_general(
                    gr_ref[:], w0[2 * latent:3 * latent, :],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
            dv_ref[:] += dv_f.astype(cdtype)
            grad_refs[0][0, latent:2 * latent, :] = jax.lax.dot_general(
                vs_scr[:], gs_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            grad_refs[0][0, 2 * latent:3 * latent, :] = jax.lax.dot_general(
                vs_scr[:], gr_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)

        @pl.when(gidx == mps - 1)
        def _():
            dv0_ref[:] = dv_ref[:]

    return kernel


def _round_weight_bytes(latent: int, n_layers_e: int = 3,
                        n_layers_n: int = 3) -> int:
    """f32 bytes of one round's MLP weight matrices, double-buffered, plus
    the grad copy the backward keeps: edge MLP is 3L->L then (n_layers_e-1)
    LxL matrices ((n_layers_e + 2) L^2 elements), node MLP is 2L->L then
    (n_layers_n - 1) LxL ((n_layers_n + 1) L^2).  At the default depth
    (hidden_layers=2 -> 3 matrices each) this is the former 9 L^2 constant;
    parameterizing it keeps the VMEM planning honest for hidden_layers=1/3
    (round-2 verdict weak item 4)."""
    per_round = (n_layers_e + 2 + n_layers_n + 1) * latent * latent
    return 2 * 2 * per_round * 4


def residuals_resident(n: int, e: int, latent: int, dtype,
                       budget: Optional[int] = None,
                       n_extra_e: int = 0,
                       n_layers_e: int = 3, n_layers_n: int = 3) -> bool:
    """Can the backward keep the per-round residual windows + carries in VMEM
    (fast path), or must it stream them from HBM?  Shared by the forward
    (which chooses how to emit the saves) and the backward.  ``n_extra_e``:
    additional resident (E, L) cdtype buffers (the ``return_edges`` variants
    carry an e-output / ge-input)."""
    if budget is None:
        budget = _VMEM_BUDGET
    b = 2 if dtype == jnp.bfloat16 else 4
    est = 2 * (2 * n + e) * latent * b  # double-buffered per-round windows
    est += (n + e) * latent * b  # dv + de carries
    est += n * latent * (4 + b)  # dagg + g
    est += n_extra_e * e * latent * b
    est += _round_weight_bytes(latent, n_layers_e, n_layers_n)
    return est <= budget


def _saveh_active(n: int, e: int, latent: int, dtype, n_layers_e: int,
                  return_edges: bool, n_layers_n: int = 3) -> bool:
    """Hidden-activation saving: resident-residual, non-return_edges,
    depth>=2 path only — the forward emits ``n_layers_e - 1`` extra
    per-round (E, L) f32 stacks and the deferred backward skips its
    recompute (gathers + MLP) entirely.  Auto-on when everything fits
    (probe_layout_tpu, cylinder bf16: −9% grad step alone, −16% stacked
    with batched wgrads); ``_FORCE_SAVEH`` pins it either way."""
    if return_edges or n_layers_e < 2:
        return False
    if _FORCE_SAVEH is not None and not _FORCE_SAVEH:
        return False
    if _FORCE_DEFER is not None and not _FORCE_DEFER:
        # defer pinned off: the backward's ``save_h = hsaves and defer``
        # would ignore the stacks — don't pay their HBM traffic
        return False
    b = 2 if dtype == jnp.bfloat16 else 4
    weights_b = _round_weight_bytes(latent, n_layers_e, n_layers_n)
    if _FORCE_STREAM_EDGES is not None:
        stream_e = bool(_FORCE_STREAM_EDGES)
    else:
        stream_e = (n * latent * (b + 4) + e * latent * b
                    + weights_b) > _VMEM_BUDGET
    if stream_e or _FORCE_STREAM or not residuals_resident(
            n, e, latent, dtype,
            n_layers_e=n_layers_e, n_layers_n=n_layers_n):
        return False
    # only the deferred backward consumes the stacks — mirror its own
    # activation condition (E >= N; _pallas_backward) so the forward never
    # saves what the backward will ignore
    if e < n and _FORCE_SAVEH is None:
        return False
    # the extra double-buffered (E, L) windows must fit on top of the
    # resident backward estimate + the deferred path's (N, L) buffers; the
    # saved activations are f32 (the f32 master biases promote the
    # pre-activations), hence 4 bytes not b
    extra = 2 * (n_layers_e - 1) * e * latent * 4
    est = 2 * (2 * n + e) * latent * b + (n + e) * latent * b \
        + n * latent * (4 + b) + weights_b + 16 * n * latent
    return est + extra <= _VMEM_BUDGET


def edges_resident(n: int, e: int, latent: int, dtype,
                   n_layers_e: int = 3, n_layers_n: int = 3) -> bool:
    """Does the forward keep the (E, L) edge-latent buffer VMEM-resident
    (vs the edge-streaming kernel)?  The ``node_extra`` variant (multi-edge-
    set fast path) requires residency."""
    b = 2 if dtype == jnp.bfloat16 else 4
    weights_b = _round_weight_bytes(latent, n_layers_e, n_layers_n)
    return (n * latent * (b + 4) + e * latent * b + weights_b) <= _VMEM_BUDGET


def fused_fits(n: int, e: int, latent: int, dtype,
               kernel_bwd: bool = False,
               budget: Optional[int] = None,
               n_layers_e: int = 3, n_layers_n: int = 3) -> bool:
    """Host-side guard: can the fused kernels run this mesh — via the
    VMEM-resident or HBM-streaming variants — without a Mosaic scoped-vmem
    OOM?  Used by :func:`mgn_tpu.models.mgn.apply_mgn` to decide whether the
    ``cfg.fused`` request is honoured or silently falls back to the unfused
    path.  ``kernel_bwd``: also require the native reverse-round backward to
    fit (its streaming variant keeps four (N, L)-class carries resident)."""
    if budget is None:
        budget = _VMEM_BUDGET
    b = 2 if dtype == jnp.bfloat16 else 4
    w = _round_weight_bytes(latent, n_layers_e, n_layers_n)
    slack = 2 << 20  # chunk slot buffers + staging headroom
    fwd_resident = n * latent * (b + 4) + e * latent * b + w
    fwd_stream = n * latent * (b + 4) + w + slack
    if min(fwd_resident, fwd_stream) > budget:
        return False
    if not kernel_bwd:
        return True
    if residuals_resident(n, e, latent, dtype, budget,
                          n_layers_e=n_layers_e, n_layers_n=n_layers_n):
        return True
    bwd_stream = n * latent * (3 * b + 4) + 2 * w + slack
    return bwd_stream <= budget


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda g, *_: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _per_round_spec(shape_rest, mps, reverse=False):
    shape = (1,) + tuple(shape_rest)
    nd = len(shape_rest)
    if reverse:
        return pl.BlockSpec(shape, lambda g, *_: (mps - 1 - g,) + (0,) * nd,
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(shape, lambda g, *_: (g,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def _pallas_forward(proc_leaves, v0, e0, plan: FusedPlan, mps: int,
                    n_layers_e: int, n_layers_n: int, interpret: bool,
                    save_residuals: bool = False, return_edges: bool = False,
                    save_h: bool = False, node_extra=None):
    n, latent = v0.shape
    e = e0.shape[0]
    cdtype = v0.dtype
    b = 2 if cdtype == jnp.bfloat16 else 4
    weights_b = _round_weight_bytes(latent, n_layers_e, n_layers_n)
    # edge latents stream from HBM (read-modify-write carry) when the
    # resident (E, L) buffer would blow VMEM — keeps the fused round on
    # 10k-node-class meshes that previously fell back to the banded path
    if _FORCE_STREAM_EDGES is not None:
        stream_e = bool(_FORCE_STREAM_EDGES)
    else:
        stream_e = (n * latent * (b + 4) + e * latent * b
                    + weights_b) > _VMEM_BUDGET
    stream = save_residuals and (
        stream_e or _FORCE_STREAM or not residuals_resident(
            n, e, latent, cdtype, n_extra_e=int(return_edges),
            n_layers_e=n_layers_e, n_layers_n=n_layers_n))
    # pre-project v through the vs/vr W0 slices once per round when the
    # per-chunk first-layer savings (2·E·L²) beat the projection cost
    # (2·N·L²) — i.e. whenever E ≥ N, which is every real mesh — and the
    # two extra (N, L) f32 scratch buffers still fit VMEM alongside the
    # forward's resident set
    if _FORCE_PREPROJECT is not None:
        preproject = _FORCE_PREPROJECT
    else:
        resident = n * latent * (b + 4) + weights_b
        if not stream_e:
            resident += e * latent * b
            if save_residuals and not stream:
                resident += 2 * (2 * n + e) * latent * b  # dbl-buf windows
        else:
            resident += 4 * plan.chunk * latent * b  # carry slot buffers
        preproject = (e >= n
                      and resident + 2 * n * latent * 4 <= _VMEM_BUDGET)

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),  # v0 stays in HBM
                pl.BlockSpec(memory_space=pltpu.HBM),  # e0 stays in HBM
                _full_spec(plan.rel_s.shape), _full_spec(plan.rel_r.shape)]
    if node_extra is not None:
        if stream_e:
            raise NotImplementedError(
                "node_extra requires the resident-edge forward kernel")
        in_specs.append(_full_spec((n, latent)))
    in_specs += [_per_round_spec(w.shape[1:], mps) for w in proc_leaves]

    if stream_e:
        kernel = _make_kernel_stream_e(
            n, e, latent, plan.band_s, plan.band_r, plan.chunk,
            n_layers_e, n_layers_n, mps, cdtype,
            save_residuals=save_residuals, preproject=preproject)
        # outputs: v (VMEM), e carry (HBM) [, streamed residual stacks]
        out_shape = [jax.ShapeDtypeStruct((n, latent), cdtype),
                     jax.ShapeDtypeStruct((e, latent), cdtype)]
        out_specs = [_full_spec((n, latent)),
                     pl.BlockSpec(memory_space=pltpu.HBM)]
        if save_residuals:
            out_shape += [jax.ShapeDtypeStruct((mps, n, latent), cdtype),
                          jax.ShapeDtypeStruct((mps, e, latent), cdtype),
                          jax.ShapeDtypeStruct((mps, n, latent), cdtype)]
            out_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 3
        scratch = [pltpu.VMEM((n, latent), cdtype),  # v
                   pltpu.VMEM((n, latent), jnp.float32)]  # agg
        if preproject:
            scratch += [pltpu.VMEM((n, latent), jnp.float32),
                        pltpu.VMEM((n, latent), jnp.float32)]
        scratch += [pltpu.VMEM((2, plan.chunk, latent), cdtype),  # ec_scr
                    pltpu.VMEM((2, plan.chunk, latent), cdtype)]  # eo_scr
        if save_residuals:
            scratch.append(pltpu.VMEM((n, latent), cdtype))  # aggc staging
        scratch += [pltpu.SemaphoreType.DMA((2,)),  # sem_e
                    pltpu.SemaphoreType.DMA((2,))]  # sem_w
        if save_residuals:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))  # sem_s
    else:
        save_h = save_h and save_residuals and not stream
        kernel = _make_kernel(
            n, e, latent, plan.band_s, plan.band_r, plan.chunk,
            n_layers_e, n_layers_n, mps, cdtype,
            save_residuals=save_residuals, stream_saves=stream,
            return_edges=return_edges, preproject=preproject,
            save_h=save_h, node_extra=node_extra is not None)

        out_shape = [jax.ShapeDtypeStruct((n, latent), cdtype)]
        out_specs = [_full_spec((n, latent))]
        if return_edges:
            out_shape.append(jax.ShapeDtypeStruct((e, latent), cdtype))
            out_specs.append(_full_spec((e, latent)))
        if save_residuals:
            out_shape += [jax.ShapeDtypeStruct((mps, n, latent), cdtype),
                          jax.ShapeDtypeStruct((mps, e, latent), cdtype),
                          jax.ShapeDtypeStruct((mps, n, latent), cdtype)]
            if stream:
                out_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 3
            else:
                out_specs += [_per_round_spec((n, latent), mps),
                              _per_round_spec((e, latent), mps),
                              _per_round_spec((n, latent), mps)]
            if save_h:
                # post-relu hidden activations are f32 regardless of the
                # compute dtype (the f32 master biases promote the
                # pre-activations), so the save stacks must be f32 too —
                # a cdtype (bf16) ref rejects the swap and would lose the
                # exact-recompute-match property besides
                out_shape += [jax.ShapeDtypeStruct((mps, e, latent),
                                                   jnp.float32)
                              for _ in range(n_layers_e - 1)]
                out_specs += [_per_round_spec((e, latent), mps)
                              for _ in range(n_layers_e - 1)]

        scratch = [
            pltpu.VMEM((n, latent), cdtype),
            pltpu.VMEM((e, latent), cdtype),
            pltpu.VMEM((2, n, latent) if _PROBE == "round_indep"
                       else (n, latent), jnp.float32),
        ]
        if stream:
            scratch.append(pltpu.VMEM((n, latent), cdtype))  # agg staging
        if preproject:
            scratch += [pltpu.VMEM((n, latent), jnp.float32),  # v @ W0_vs
                        pltpu.VMEM((n, latent), jnp.float32)]  # v @ W0_vr
        if _PROBE == "round_indep":
            scratch.append(pltpu.VMEM((n, latent), cdtype))  # v snapshot

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(mps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    xtr_args = (() if node_extra is None
                else (node_extra.astype(jnp.float32),))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(plan.starts_s, plan.starts_r, v0, e0, plan.rel_s, plan.rel_r,
      *xtr_args, *proc_leaves)
    if stream_e:
        # the e carry output doubles as the return_edges output; drop it
        # for callers that did not ask for edge latents
        res = [out[0]] + ([out[1]] if return_edges else []) + list(out[2:])
        return tuple(res) if len(res) > 1 else res[0]
    if save_residuals or return_edges:
        return tuple(out)
    return out[0]


def _pallas_backward(proc_leaves, plan: FusedPlan, vsave, esave, aggsave,
                     g, mps: int, n_layers_e: int, n_layers_n: int,
                     interpret: bool, ge=None, hsaves=None, xtr=None):
    """Returns (leaf_grads list, dv0, de0).  ``ge``: optional incoming
    edge-latent cotangent (the ``return_edges`` forward).  ``hsaves``:
    per-round hidden-activation stacks the forward saved (``_FORCE_SAVEH``)
    — the deferred backward then skips its recompute."""
    _, n, latent = vsave.shape
    e = esave.shape[1]
    cdtype = vsave.dtype
    with_ge = ge is not None
    stream = _FORCE_STREAM or not residuals_resident(
        n, e, latent, cdtype, n_extra_e=int(with_ge),
        n_layers_e=n_layers_e, n_layers_n=n_layers_n)
    if xtr is not None and stream:
        raise NotImplementedError(
            "node_extra requires the resident-residual backward kernel")
    chunk = plan.chunk
    # deferred first-layer backward: needs 4 extra (N, L) f32 buffers and
    # only pays when E ≥ N (every real mesh); see _make_bwd_kernel.
    b = 2 if cdtype == jnp.bfloat16 else 4
    if stream:
        resident = n * latent * (3 * b + 4) + (2 << 20)
    else:
        # the non-stream kernel also holds the ge cotangent as a resident
        # (E, L) buffer when return_edges — mirror residuals_resident's
        # n_extra_e term so the WGB/defer auto gates match the kernel's
        # true footprint (round-2 advisor finding)
        resident = (2 * (2 * n + e) * latent * b
                    + (n + e) * latent * b + n * latent * (4 + b)
                    + int(with_ge) * e * latent * b)
    resident += _round_weight_bytes(latent, n_layers_e, n_layers_n)
    if _FORCE_DEFER is not None:
        defer = bool(_FORCE_DEFER)
    else:
        defer = e >= n and resident + 16 * n * latent <= _VMEM_BUDGET
    # saved hidden activations: consumed only by the deferred resident body
    save_h = bool(hsaves) and defer and not stream
    # batched weight grads: resident + deferred path only (the stream kernel
    # keeps per-chunk wgrads; (E, L) stacks would defeat its O(chunk) bound).
    # Auto-on when the stash fits — measured −8% grad step alone, −16%
    # stacked with the saved-activation backward (probe_layout_tpu, cylinder
    # bf16: 1.898 → 1.739 / 1.587 ms).
    if _FORCE_WGB is not None:
        wgb = bool(_FORCE_WGB) and defer and not stream
    else:
        hsave_b = 2 * (n_layers_e - 1) * e * latent * 4 if save_h else 0
        wgb_b = (n_layers_e * e * latent * b  # dh stacks (cdtype)
                 + (0 if save_h  # post stacks (f32; hsave covers them)
                    else (n_layers_e - 1) * e * latent * 4))
        wgb = (defer and not stream
               and resident + 16 * n * latent + hsave_b + wgb_b
               <= _VMEM_BUDGET)
    if stream:
        kernel = _make_bwd_kernel_stream(
            n, e, latent, plan.band_s, plan.band_r, plan.chunk,
            n_layers_e, n_layers_n, mps, cdtype,
            with_ge=with_ge, defer_first=defer)
    else:
        kernel = _make_bwd_kernel(
            n, e, latent, plan.band_s, plan.band_r, plan.chunk,
            n_layers_e, n_layers_n, mps, cdtype,
            with_ge=with_ge, defer_first=defer, batch_wgrads=wgb,
            save_h=save_h, node_extra=xtr is not None)

    in_specs = [_full_spec(plan.rel_s.shape), _full_spec(plan.rel_r.shape),
                _full_spec((n, latent))]
    if with_ge:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM) if stream
                        else _full_spec((e, latent)))
    if stream:
        in_specs += [pl.BlockSpec(memory_space=pltpu.HBM)] * 3
    else:
        in_specs += [_per_round_spec((n, latent), mps, reverse=True),
                     _per_round_spec((e, latent), mps, reverse=True),
                     _per_round_spec((n, latent), mps, reverse=True)]
    if xtr is not None:
        in_specs.append(_full_spec((n, latent)))
    if save_h:
        in_specs += [_per_round_spec((e, latent), mps, reverse=True)
                     for _ in range(n_layers_e - 1)]
    in_specs += [_per_round_spec(w.shape[1:], mps, reverse=True)
                 for w in proc_leaves]

    out_shape = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                 for w in proc_leaves]
    out_specs = [_per_round_spec(w.shape[1:], mps, reverse=True)
                 for w in proc_leaves]
    out_shape += [jax.ShapeDtypeStruct((n, latent), cdtype),
                  jax.ShapeDtypeStruct((e, latent), cdtype)]
    out_specs += [_full_spec((n, latent)),
                  pl.BlockSpec(memory_space=pltpu.HBM) if stream
                  else _full_spec((e, latent))]
    if xtr is not None:
        out_shape.append(jax.ShapeDtypeStruct((n, latent), jnp.float32))
        out_specs.append(_full_spec((n, latent)))

    # defer scratch: ps/qs (pre-projected recompute operands — skipped when
    # the saved activations make the recompute unnecessary) + G_s/G_r
    defer_scr = [pltpu.VMEM((n, latent), jnp.float32)
                 for _ in range(2 if save_h else 4)] if defer else []
    if stream:
        scratch = [
            pltpu.VMEM((n, latent), cdtype),  # dv carry
            pltpu.VMEM((n, latent), jnp.float32),  # dagg
            pltpu.VMEM((n, latent), cdtype),  # vs_scr (saved v)
            pltpu.VMEM((n, latent), cdtype),  # aggc_scr (saved agg)
            pltpu.VMEM((2, chunk, latent), cdtype),  # ec_scr
            pltpu.VMEM((2, chunk, latent), cdtype),  # dec_scr
            pltpu.VMEM((2, chunk, latent), cdtype),  # deo_scr
            *defer_scr,
            pltpu.SemaphoreType.DMA((2,)),  # sem_e
            pltpu.SemaphoreType.DMA((2,)),  # sem_d
            pltpu.SemaphoreType.DMA((2,)),  # sem_w
        ]
    else:
        scratch = [
            pltpu.VMEM((n, latent), cdtype),  # dv carry
            pltpu.VMEM((e, latent), cdtype),  # de carry
            pltpu.VMEM((n, latent), jnp.float32),  # dagg
            *defer_scr,
        ]
        if wgb:  # dh stacks (n_layers_e, cdtype cotangents) + post stacks
            # (n_layers_e - 1, f32 — the activations carry the f32 master
            # biases' promotion; read from the hsave windows when save_h)
            scratch += [pltpu.VMEM((e, latent), cdtype)
                        for _ in range(n_layers_e)]
            if not save_h:
                scratch += [pltpu.VMEM((e, latent), jnp.float32)
                            for _ in range(n_layers_e - 1)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(mps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    args = [plan.rel_s, plan.rel_r, g]
    if with_ge:
        args.append(ge)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(plan.starts_s, plan.starts_r, *args, vsave, esave, aggsave,
      *(() if xtr is None else (xtr.astype(jnp.float32),)),
      *(hsaves if save_h else ()), *proc_leaves)
    n_leaves = len(proc_leaves)
    dxtr = out[n_leaves + 2] if xtr is not None else None
    return list(out[:n_leaves]), out[n_leaves], out[n_leaves + 1], dxtr


def process_rounds_xla(proc_params, v0, e0, senders, receivers, edge_valid,
                       mps: int, cdtype, n_pad: int,
                       row_offsets=None, backend=None,
                       return_edges: bool = False, node_extra=None):
    """Reference processor rounds in plain XLA (the unfused block math) —
    used as the fused kernel's backward recompute and in equality tests.
    ``node_extra``: (N, L) f32 pre-activation offset added into the node
    MLP's first layer each round (the multi-edge-set path; meaningful for
    ``mps == 1`` where the caller runs one round per call)."""
    from mgn_tpu.models.mlp import apply_mlp_parts
    from mgn_tpu.ops.segment import gather, segment_sum

    def block(carry, bp):
        v, e = carry
        vs = gather(v, senders)
        vr = gather(v, receivers)
        msg = apply_mlp_parts(bp["edge_mlp"], (e, vs, vr), cdtype)
        msg = msg * edge_valid
        agg = segment_sum(msg, receivers, n_pad, row_offsets=row_offsets,
                          backend=backend).astype(cdtype)
        upd = apply_mlp_parts(bp["node_mlp"], (v, agg), cdtype,
                              extra=node_extra)
        return (v + upd, e + msg), None

    (v, e), _ = jax.lax.scan(block, (v0, e0), proc_params)
    return (v, e) if return_edges else v


def _unflatten_proc_grads(leaf_grads, n_layers_e, n_layers_n):
    """Inverse of _flatten_proc for the gradient leaves (f32)."""
    out = {}
    i = 0
    for mlp, n_layers in (("edge_mlp", n_layers_e), ("node_mlp", n_layers_n)):
        ws = list(leaf_grads[i:i + n_layers])
        i += n_layers
        bs = [b.reshape(b.shape[0], -1) for b in leaf_grads[i:i + n_layers]]
        i += n_layers
        ln_s = leaf_grads[i].reshape(leaf_grads[i].shape[0], -1)
        ln_b = leaf_grads[i + 1].reshape(leaf_grads[i + 1].shape[0], -1)
        i += 2
        out[mlp] = {"w": ws, "b": bs, "ln_scale": ln_s, "ln_bias": ln_b}
    return out


@functools.lru_cache(maxsize=32)
def _make_fused(mps: int, n_layers_e: int, n_layers_n: int,
                interpret: bool, kernel_bwd: bool,
                return_edges: bool = False, node_extra: bool = False):
    """Cached custom_vjp wrapper per static configuration.

    ``kernel_bwd=False``: backward recomputes the rounds with plain XLA ops
    (exact, but ~3 XLA passes).  ``kernel_bwd=True``: backward is the native
    reverse-round Pallas kernel consuming per-round residuals the forward
    saves — the training-speed path.  ``return_edges``: the primal returns
    ``(v, e)`` and the backward accepts cotangents for both (the per-round
    sharded caller threads edge latents between rounds).
    """

    def _primal(proc_params, v0, e0, plan, senders, receivers, edge_valid,
                xtr=None):
        leaves = _flatten_proc(proc_params)
        return _pallas_forward(leaves, v0, e0, plan, mps,
                               n_layers_e, n_layers_n, interpret,
                               return_edges=return_edges, node_extra=xtr)

    @jax.custom_vjp
    def fused(proc_params, v0, e0, plan, senders, receivers, edge_valid,
              *xtr):
        return _primal(proc_params, v0, e0, plan, senders, receivers,
                       edge_valid, *xtr)

    if kernel_bwd:
        def fwd(proc_params, v0, e0, plan, senders, receivers, edge_valid,
                *xtr):
            leaves = _flatten_proc(proc_params)
            saveh = _saveh_active(v0.shape[0], e0.shape[0], v0.shape[1],
                                  v0.dtype, n_layers_e, return_edges,
                                  n_layers_n=n_layers_n)
            out = _pallas_forward(
                leaves, v0, e0, plan, mps, n_layers_e, n_layers_n, interpret,
                save_residuals=True, return_edges=return_edges,
                save_h=saveh, node_extra=xtr[0] if node_extra else None)
            if return_edges:
                v, e, vsave, esave, aggsave, *hs = out
                primal = (v, e)
            else:
                v, vsave, esave, aggsave, *hs = out
                primal = v
            return primal, (proc_params, plan, vsave, esave, aggsave,
                            tuple(hs), xtr[0] if node_extra else None)

        def bwd(res, g):
            proc_params, plan, vsave, esave, aggsave, hs, xtr = res
            gv, ge = g if return_edges else (g, None)
            leaves = _flatten_proc(proc_params)
            leaf_grads, dv, de, dxtr = _pallas_backward(
                leaves, plan, vsave, esave, aggsave, gv, mps,
                n_layers_e, n_layers_n, interpret, ge=ge,
                hsaves=hs or None, xtr=xtr)
            dp = _unflatten_proc_grads(leaf_grads, n_layers_e, n_layers_n)
            base = (dp, dv, de, None, None, None, None)
            return base + ((dxtr,) if node_extra else ())
    else:
        def fwd(proc_params, v0, e0, plan, senders, receivers, edge_valid,
                *xtr):
            out = _primal(proc_params, v0, e0, plan, senders, receivers,
                          edge_valid, *xtr)
            return out, (proc_params, v0, e0, senders, receivers, edge_valid,
                         xtr[0] if node_extra else None)

        def bwd(res, g):
            proc_params, v0, e0, senders, receivers, edge_valid, xtr = res
            n_pad = v0.shape[0]

            def recompute(p, v, e, *x):
                return process_rounds_xla(p, v, e, senders, receivers,
                                          edge_valid, mps, v0.dtype, n_pad,
                                          return_edges=return_edges,
                                          node_extra=x[0] if node_extra
                                          else None)

            if node_extra:
                _, vjp = jax.vjp(recompute, proc_params, v0, e0, xtr)
                dp, dv, de, dxtr = vjp(g)
                return dp, dv, de, None, None, None, None, dxtr
            _, vjp = jax.vjp(recompute, proc_params, v0, e0)
            dp, dv, de = vjp(g)
            return dp, dv, de, None, None, None, None

    fused.defvjp(fwd, bwd)
    return fused


def fused_process(proc_params, v0, e0, plan: FusedPlan, senders, receivers,
                  edge_valid, mps: int, interpret: bool = False,
                  kernel_bwd: bool = False, return_edges: bool = False,
                  node_extra=None):
    """Run ``mps`` processor rounds through the fused kernel.

    ``proc_params`` is the stacked processor pytree (models/mgn.init_mgn);
    ``senders``/``receivers``/``edge_valid`` are only consumed by the exact
    XLA backward recompute (``kernel_bwd=False``).  Gradients flow to params,
    v0 and e0 either way.  ``return_edges``: return ``(v, e)`` after the
    rounds instead of just ``v`` (differentiable w.r.t. both outputs) — the
    graph-parallel path calls the kernel once per round and threads both
    latent carries through the halo exchange (parallel/halo.py).
    ``node_extra``: (N, L) f32 pre-activation offset folded into the node
    MLP's first layer each round — the multi-edge-set (cloth) fast path
    computes the world-edge aggregate's W0 contribution outside the kernel
    (models/mgn_multi.apply_mgn_multi; gradients flow to it too).
    """
    n_layers_e, n_layers_n = _mlp_slot_counts(proc_params)
    if node_extra is not None and int(mps) != 1:
        raise ValueError("node_extra is a per-round quantity; call the "
                         "kernel with mps=1 per round (the multi-edge-set "
                         "path does)")
    fn = _make_fused(int(mps), n_layers_e, n_layers_n, bool(interpret),
                     bool(kernel_bwd), bool(return_edges),
                     node_extra=node_extra is not None)
    xargs = () if node_extra is None else (node_extra,)
    return fn(proc_params, v0, e0, plan, senders, receivers, edge_valid,
              *xargs)
