"""Banded-dense segment-sum: scatter-add as batched MXU matmuls, pure XLA.

Receiver-sorted edges mean each 128-node block's incident edges occupy one
contiguous window of the edge array.  So the scatter-add is, per block,

    out[block] = onehot(block, window) @ data[window]          (128, F)

with ``onehot[i, j] = (receiver[window_start + j] == block_base + i)`` —
a batched dense matmul over (B, 128, band) one-hot bands, built on the fly
from the receiver ids.  No Pallas, no per-chunk control flow: XLA lowers it to
one fused gather + batched-matmul, which keeps the MXU busy instead of
serializing on scatter updates.

``band`` must cover the widest block's edge window (asserted host-side at
template build; see ``required_band``).  Backward is the exact gather
``g[receivers]`` via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["banded_segment_sum", "required_band"]

_BLOCK = 128


def required_band(row_offsets: np.ndarray, num_segments: int,
                  block: int = _BLOCK, multiple: int = 128) -> int:
    """Smallest valid band (host-side, at template build): max edges windowed
    by any node block, rounded up."""
    ro = np.asarray(row_offsets)
    starts = ro[0:num_segments:block]
    ends = ro[block : num_segments + 1 : block]
    span = int((ends - starts).max()) if len(starts) else 0
    return max(multiple, int(-(-span // multiple) * multiple))


def _forward(data, receivers, row_offsets, num_segments, band):
    e_pad, f = data.shape
    n_blocks = num_segments // _BLOCK
    starts = jnp.minimum(
        row_offsets[0:num_segments:_BLOCK], jnp.int32(e_pad - band)
    )
    starts = jnp.maximum(starts, 0)

    def window(s):
        return (jax.lax.dynamic_slice_in_dim(data, s, band, 0),
                jax.lax.dynamic_slice_in_dim(receivers, s, band, 0))

    windows, recv_w = jax.vmap(window)(starts)  # (B, band, F), (B, band)
    ids = (jnp.arange(n_blocks, dtype=jnp.int32)[:, None] * _BLOCK
           + jnp.arange(_BLOCK, dtype=jnp.int32)[None, :])  # (B, 128)
    onehot = (recv_w[:, None, :] == ids[:, :, None]).astype(data.dtype)
    precision = (jax.lax.Precision.HIGHEST if data.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out = jnp.einsum("bnw,bwf->bnf", onehot, windows,
                     precision=precision,
                     preferred_element_type=jnp.float32)
    return out.reshape(num_segments, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def banded_segment_sum(data, receivers, row_offsets, num_segments, band):
    """out[n] = sum of data rows whose receiver == n; (N_pad, F) float32.

    Requires receiver-sorted edges and ``band`` >= the widest block window
    (``required_band``).  ``num_segments`` must be a multiple of 128.
    """
    return _forward(data, receivers, row_offsets, num_segments, band)


def _fwd(data, receivers, row_offsets, num_segments, band):
    return (_forward(data, receivers, row_offsets, num_segments, band),
            (receivers, jnp.zeros((0,), data.dtype)))


def _bwd(num_segments, band, res, g):
    receivers, probe = res
    return (jnp.take(g, receivers, axis=0).astype(probe.dtype), None, None)


banded_segment_sum.defvjp(_fwd, _bwd)


def required_gather_band(indices: np.ndarray, chunk: int = _BLOCK,
                         multiple: int = 128) -> int:
    """Smallest valid band for banded_gather: max (max-min+1) of indices
    within any 128-entry chunk (host-side; needs spatially ordered nodes to
    be small — see data.prep spatial_reorder)."""
    idx = np.asarray(indices).reshape(-1, chunk)
    span = int((idx.max(1) - idx.min(1)).max()) + 1
    return max(multiple, int(-(-span // multiple) * multiple))


def _gather_forward(v, indices, band):
    n, f = v.shape
    e = indices.shape[0]
    idx_c = indices.reshape(e // _BLOCK, _BLOCK)
    starts = jnp.clip(jnp.min(idx_c, axis=1), 0, jnp.int32(max(n - band, 0)))

    def window(s):
        return jax.lax.dynamic_slice_in_dim(v, s, band, 0)

    windows = jax.vmap(window)(starts)  # (C, band, F)
    rel = idx_c - starts[:, None]  # (C, 128)
    onehot = (rel[:, :, None]
              == jnp.arange(band, dtype=indices.dtype)[None, None, :]
              ).astype(v.dtype)
    precision = (jax.lax.Precision.HIGHEST if v.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out = jnp.einsum("cjw,cwf->cjf", onehot, windows, precision=precision,
                     preferred_element_type=jnp.float32)
    return out.reshape(e, f).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def banded_gather(v, indices, band):
    """Row gather ``v[indices]`` as banded MXU matmuls.

    Requires each 128-entry index chunk to span < ``band`` rows
    (``required_gather_band``; guaranteed by spatial node ordering).  The MXU
    formulation avoids TPU's slow vector-gather path; backward is the exact
    scatter-add.
    """
    return _gather_forward(v, indices, band)


def _g_fwd(v, indices, band):
    return _gather_forward(v, indices, band), (indices, v.shape[0],
                                               jnp.zeros((0,), v.dtype))


def _g_bwd(band, res, g):
    indices, n, probe = res
    dv = jax.ops.segment_sum(g.astype(jnp.float32), indices, num_segments=n)
    return (dv.astype(probe.dtype), None)


banded_gather.defvjp(_g_fwd, _g_bwd)
