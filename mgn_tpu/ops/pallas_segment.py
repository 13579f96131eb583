"""Pallas TPU kernel: CSR segment-sum (scatter-add of edge messages to nodes).

This is the framework's native-code equivalent of the scatter kernels hidden in
the reference's GraphNetCore GPU stack (SURVEY.md §2: the hot inner call at
/root/reference/src/solve.jl:198-200).  Design:

- Edges are receiver-sorted (CSR) by graph construction, so the per-node sum is
  a contiguous-row reduction.
- Grid over node blocks of ``block_nodes``.  Each step DMAs that block's edge
  rows from HBM in chunks of ``block_edges`` (double-buffered), builds a local
  one-hot matrix ``M[a, b] = (receiver[b] == node_base + a)`` per 128-edge
  sub-block and accumulates ``M @ chunk`` on the MXU — turning the scatter-add
  into dense matmuls at MXU throughput instead of serialized vector adds.
- Receiver ids are stored as (E/128, 128) so index DMAs respect the 128-lane
  tiling constraint.
- Per-block edge ranges arrive via scalar prefetch, so only O(num_blocks)
  scalars live in SMEM regardless of graph size.

Backward pass of segment-sum is a pure gather (``g[receivers]``), wired up via
``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["csr_segment_sum"]

_LANE = 128


def _kernel(
    starts_ref,  # scalar prefetch: (num_blocks,) int32, TE-aligned chunk starts
    nchunks_ref,  # scalar prefetch: (num_blocks,) int32, chunk counts
    data_ref,  # HBM: (E_pad, F)
    recv_ref,  # HBM: (E_pad // 128, 128) int32
    out_ref,  # VMEM block: (TN, F) float32
    acc_ref,  # VMEM scratch: (TN, F) float32
    data_buf,  # VMEM scratch: (2, TE, F)
    recv_buf,  # VMEM scratch: (2, TE // 128, 128) int32
    sems,  # DMA semaphores (2, 2)
    *,
    block_nodes: int,
    block_edges: int,
):
    i = pl.program_id(0)
    start = starts_ref[i]
    nchunks = nchunks_ref[i]
    node_base = i * block_nodes
    sub = block_edges // _LANE

    def get_dma(slot, k):
        off = pl.multiple_of(start + k * block_edges, block_edges)
        return (
            pltpu.make_async_copy(
                data_ref.at[pl.ds(off, block_edges), :],
                data_buf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                recv_ref.at[pl.ds(off // _LANE, sub), :],
                recv_buf.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(nchunks > 0)
    def _():
        d, r = get_dma(0, 0)
        d.start()
        r.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # node ids of this block, replicated across the 128 lanes: (TN, 128)
    ids = node_base + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, _LANE), 0
    )

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            d, r = get_dma((k + 1) % 2, k + 1)
            d.start()
            r.start()

        d, r = get_dma(slot, k)
        d.wait()
        r.wait()

        recv_all = recv_buf[slot]  # (TE//128, 128)
        data_all = data_buf[slot]  # (TE, F)
        # f32 inputs need HIGHEST (full-f32 MXU passes) so the scatter-add is
        # exact, not bf16-rounded; bf16 inputs are already rounded and
        # accumulate exactly into f32 at DEFAULT precision.
        precision = (jax.lax.Precision.HIGHEST
                     if data_all.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        for s in range(sub):
            recv_row = recv_all[s : s + 1, :]  # (1, 128)
            onehot = (recv_row == ids).astype(data_all.dtype)  # (TN, 128)
            acc_ref[:] += jax.lax.dot_general(
                onehot,
                data_all[s * _LANE : (s + 1) * _LANE, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[:] = acc_ref[:]


def _kernel_vmem(
    starts_ref,  # scalar prefetch: (num_blocks,) int32 (LANE-aligned starts)
    nchunks_ref,  # scalar prefetch: (num_blocks,) int32 (128-edge chunks)
    data_ref,  # VMEM: (E_pad, F) — entire edge array resident
    recv_ref,  # VMEM: (E_pad // 128, 128) int32
    out_ref,  # VMEM block: (TN, F) float32
    acc_ref,  # VMEM scratch: (TN, F) float32
    *,
    block_nodes: int,
):
    """Small-graph fast path: everything VMEM-resident, no manual DMA.

    Grid over node blocks; each block sweeps its (128-edge-aligned) CSR range
    with dynamic VMEM slices and accumulates one-hot matmuls.  For graphs
    whose edge array fits in VMEM this removes all DMA orchestration overhead
    — the dominant cost at cylinder-flow scale.
    """
    i = pl.program_id(0)
    start = starts_ref[i]
    nchunks = nchunks_ref[i]
    node_base = i * block_nodes

    ids = node_base + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, _LANE), 0
    )
    acc_ref[:] = jnp.zeros_like(acc_ref)

    precision = (jax.lax.Precision.HIGHEST
                 if data_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def body(k, _):
        row = start // _LANE + k
        recv_row = recv_ref[pl.ds(row, 1), :]  # (1, 128)
        onehot = (recv_row == ids).astype(data_ref.dtype)  # (TN, 128)
        chunk = data_ref[pl.ds(row * _LANE, _LANE), :]  # (128, F)
        acc_ref[:] += jax.lax.dot_general(
            onehot, chunk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[:] = acc_ref[:]


def _forward_vmem(data, receivers, row_offsets, num_segments, block_nodes,
                  interpret):
    e_pad, f = data.shape
    n_pad = num_segments
    num_blocks = n_pad // block_nodes
    blk_start = row_offsets[0 : n_pad : block_nodes]
    blk_end = row_offsets[block_nodes : n_pad + 1 : block_nodes]
    starts = (blk_start // _LANE) * _LANE
    nchunks = pl.cdiv(blk_end - starts, _LANE).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((e_pad, f), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_pad // _LANE, _LANE), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_nodes, f), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_nodes, f), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_vmem, block_nodes=block_nodes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(starts.astype(jnp.int32), nchunks, data,
      receivers.reshape(e_pad // _LANE, _LANE))


# Edge arrays up to this many bytes use the VMEM-resident kernel.
_VMEM_BYTES_LIMIT = 6 * 1024 * 1024


def _forward(
    data: jax.Array,
    receivers: jax.Array,
    row_offsets: jax.Array,
    num_segments: int,
    block_nodes: int,
    block_edges: int,
    interpret: bool,
) -> jax.Array:
    e_pad, f = data.shape
    n_pad = num_segments
    assert n_pad % block_nodes == 0, (n_pad, block_nodes)
    assert e_pad % block_edges == 0, (e_pad, block_edges)
    assert block_edges % _LANE == 0
    if e_pad * f * data.dtype.itemsize <= _VMEM_BYTES_LIMIT:
        return _forward_vmem(data, receivers, row_offsets, num_segments,
                             block_nodes, interpret)
    num_blocks = n_pad // block_nodes

    # Per-node-block edge ranges, chunk-aligned (host-free, jit-friendly).
    blk_start = row_offsets[0 : n_pad : block_nodes]  # (num_blocks,)
    blk_end = row_offsets[block_nodes : n_pad + 1 : block_nodes]  # (num_blocks,)
    starts = (blk_start // block_edges) * block_edges
    nchunks = pl.cdiv(blk_end - starts, block_edges).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_nodes, f), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_nodes, f), jnp.float32),
            pltpu.VMEM((2, block_edges, f), data.dtype),
            pltpu.VMEM((2, block_edges // _LANE, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, block_nodes=block_nodes, block_edges=block_edges
    )
    flops = 2 * e_pad * block_nodes * f  # upper bound over the band
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=e_pad * f * 4 + n_pad * f * 4, transcendentals=0
        ),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        nchunks,
        data,
        receivers.reshape(e_pad // _LANE, _LANE),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _csr_segment_sum(data, receivers, row_offsets, num_segments, block_nodes,
                     block_edges, interpret):
    return _forward(data, receivers, row_offsets, num_segments, block_nodes,
                    block_edges, interpret)


def _fwd(data, receivers, row_offsets, num_segments, block_nodes, block_edges,
         interpret):
    out = _forward(data, receivers, row_offsets, num_segments, block_nodes,
                   block_edges, interpret)
    return out, (receivers, jnp.zeros((0,), data.dtype))


def _bwd(num_segments, block_nodes, block_edges, interpret, res, g):
    receivers, dtype_probe = res
    # d/d data of segment-sum is a row gather of the cotangent.
    return (jnp.take(g, receivers, axis=0).astype(dtype_probe.dtype), None, None)


_csr_segment_sum.defvjp(_fwd, _bwd)


def csr_segment_sum(
    data: jax.Array,
    receivers: jax.Array,
    row_offsets: jax.Array,
    num_segments: int,
    block_nodes: int = 128,
    block_edges: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Segment-sum of receiver-sorted ``data`` (E_pad, F) into (N_pad, F).

    ``row_offsets`` are CSR offsets (N_pad+1,).  Requires N_pad % block_nodes
    == 0 and E_pad % block_edges == 0 (guaranteed by graph bucketing).  Runs in
    Pallas interpreter mode automatically off-TPU so tests exercise the same
    code path on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # shrink blocks to divide the padded sizes (buckets are 128-multiples)
    while num_segments % block_nodes and block_nodes > _LANE:
        block_nodes //= 2
    while data.shape[0] % block_edges and block_edges > _LANE:
        block_edges //= 2
    return _csr_segment_sum(
        data, receivers, row_offsets, num_segments, block_nodes, block_edges,
        interpret,
    )
