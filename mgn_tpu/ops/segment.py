"""Gather/scatter message-passing primitives with backend dispatch.

These are the hot ops of the framework — the equivalent of the scatter-add /
gather kernels hidden inside GraphNetCore's ``mgn.model(graph, ps, st)``
(call sites /root/reference/src/solve.jl:198-200, /root/reference/src/strategies.jl:418-421).

Two implementations:
- XLA path (this module): ``jax.ops.segment_sum`` / gather; works everywhere,
  used on CPU and as the autodiff-friendly default.
- Pallas path (:mod:`mgn_tpu.ops.pallas_segment`): CSR segment-sum using the
  MXU one-hot-matmul trick, selected on TPU via ``use_pallas``.

Edges are receiver-sorted by construction (see ``core.graph.build_template``),
so the XLA scatter can use ``indices_are_sorted=True``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["gather", "segment_sum", "set_default_backend", "get_default_backend"]

_DEFAULT_BACKEND = "auto"


def set_default_backend(name: str) -> None:
    """Set the global aggregation backend: 'auto' | 'xla' | 'pallas' | 'banded'."""
    global _DEFAULT_BACKEND
    if name not in ("auto", "xla", "pallas", "banded"):
        raise ValueError(f"unknown backend {name!r}")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


def _resolve(backend: Optional[str]) -> str:
    b = backend or _DEFAULT_BACKEND
    if b == "auto":
        platform = jax.default_backend()
        b = "banded" if platform == "tpu" else "xla"
    return b


def gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather ``x[idx]`` — sender/receiver feature lookup, (E, F)."""
    return jnp.take(x, idx, axis=0)


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    row_offsets: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
    backend: Optional[str] = None,
    band: int = 2048,
) -> jax.Array:
    """Scatter-add edge rows into node rows: out[n] = sum_{e: seg[e]==n} data[e].

    ``row_offsets`` (CSR, (num_segments+1,)) enables the TPU-native backends
    ('banded' — batched MXU matmuls, the default on TPU — or 'pallas');
    without it the XLA scatter path is used.  ``band`` is the banded backend's
    per-128-node edge-window capacity (validated at template build).
    """
    b = _resolve(backend)
    if row_offsets is not None and b in ("banded", "pallas"):
        if b == "banded":
            from mgn_tpu.ops.banded import banded_segment_sum

            # a band of the whole edge array is always valid for small graphs
            return banded_segment_sum(data, segment_ids, row_offsets,
                                      num_segments, min(band, data.shape[0]))
        from mgn_tpu.ops.pallas_segment import csr_segment_sum

        return csr_segment_sum(data, segment_ids, row_offsets, num_segments)
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
