"""Functional feature normalizers.

Pure-pytree redesign of GraphNetCore's normalisers (call sites:
/root/reference/src/MeshGraphNets.jl:74-206, /root/reference/src/graph.jl:80-93,
/root/reference/src/solve.jl:205-210).  Three kinds:

- ``OfflineMinMax`` — fixed affine map data-range -> target-range
  (``NormaliserOfflineMinMax``; default target range [0, 1]).
- ``OfflineMeanStd`` — fixed z-score (``NormaliserOfflineMeanStd``).
- ``Online`` — running mean/std accumulator capped at ``max_acc`` samples
  (``NormaliserOnline``); state is carried functionally so it jits, scans and
  psums across data-parallel shards.

All normalizers operate on node-major arrays ``(N, dim)`` (or ``(..., dim)``).
State updates return a new pytree; nothing mutates.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Union

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "OfflineMinMax",
    "OfflineMeanStd",
    "Online",
    "Normalizer",
    "normalize",
    "inverse",
    "accumulate",
    "accumulate_synced",
    "accumulate_tree",
    "cross_replica_sync",
    "normalizers_from_meta",
]


class OfflineMinMax(struct.PyTreeNode):
    data_min: jax.Array
    data_max: jax.Array
    target_min: jax.Array
    target_max: jax.Array

    @classmethod
    def create(cls, data_min, data_max, target_min=0.0, target_max=1.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f(data_min), f(data_max), f(target_min), f(target_max))

    def __call__(self, x: jax.Array) -> jax.Array:
        scale = (self.target_max - self.target_min) / jnp.maximum(
            self.data_max - self.data_min, 1e-8
        )
        return (x - self.data_min) * scale + self.target_min

    def inverse(self, y: jax.Array) -> jax.Array:
        scale = (self.data_max - self.data_min) / jnp.maximum(
            self.target_max - self.target_min, 1e-8
        )
        return (y - self.target_min) * scale + self.data_min


class OfflineMeanStd(struct.PyTreeNode):
    mean: jax.Array
    std: jax.Array

    @classmethod
    def create(cls, mean, std):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f(mean), f(std))

    def __call__(self, x: jax.Array) -> jax.Array:
        return (x - self.mean) / jnp.maximum(self.std, 1e-8)

    def inverse(self, y: jax.Array) -> jax.Array:
        return y * jnp.maximum(self.std, 1e-8) + self.mean


class Online(struct.PyTreeNode):
    """Running mean/std, accumulation capped at ``max_acc`` samples.

    Covers ``NormaliserOnline(dims, device; max_acc)``
    (/root/reference/src/MeshGraphNets.jl:92,153-155,193-199).  Accumulators are
    plain sums so they can be ``psum``-merged across shards exactly.
    """

    acc_count: jax.Array  # () f32 — number of accumulation calls
    num_accumulations: jax.Array  # () f32 — number of samples (rows) seen
    acc_sum: jax.Array  # (dim,) f32
    acc_sum_sq: jax.Array  # (dim,) f32
    max_acc: jax.Array  # () f32 — cap on accumulation calls
    std_epsilon: jax.Array  # () f32

    @classmethod
    def create(cls, dim: int, max_acc: float = 1e7, std_epsilon: float = 1e-8):
        z = jnp.zeros((dim,), jnp.float32)
        return cls(
            acc_count=jnp.zeros((), jnp.float32),
            num_accumulations=jnp.zeros((), jnp.float32),
            acc_sum=z,
            acc_sum_sq=z,
            max_acc=jnp.asarray(max_acc, jnp.float32),
            std_epsilon=jnp.asarray(std_epsilon, jnp.float32),
        )

    @property
    def mean(self) -> jax.Array:
        n = jnp.maximum(self.num_accumulations, 1.0)
        return self.acc_sum / n

    @property
    def std(self) -> jax.Array:
        n = jnp.maximum(self.num_accumulations, 1.0)
        var = self.acc_sum_sq / n - (self.acc_sum / n) ** 2
        return jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), self.std_epsilon)

    def __call__(self, x: jax.Array) -> jax.Array:
        return (x - self.mean) / self.std

    def inverse(self, y: jax.Array) -> jax.Array:
        return y * self.std + self.mean

    def update(self, x: jax.Array, mask: jax.Array | None = None) -> "Online":
        """Accumulate one batch ``x: (N, dim)``; ``mask: (N,)`` selects valid rows.

        No-op once ``acc_count >= max_acc`` (the warmup cap).
        """
        if x.ndim == 1:
            x = x[:, None]
        x = x.astype(jnp.float32)
        if mask is None:
            m = jnp.ones((x.shape[0],), jnp.float32)
        else:
            m = mask.astype(jnp.float32)
        live = (self.acc_count < self.max_acc).astype(jnp.float32)
        w = m * live
        return self.replace(
            acc_count=self.acc_count + live,
            num_accumulations=self.num_accumulations + live * jnp.sum(m),
            acc_sum=self.acc_sum + jnp.sum(x * w[:, None], axis=0),
            acc_sum_sq=self.acc_sum_sq + jnp.sum(x * x * w[:, None], axis=0),
        )


Normalizer = Union[OfflineMinMax, OfflineMeanStd, Online]


def normalize(norm: Normalizer, x: jax.Array) -> jax.Array:
    return norm(x)


def inverse(norm: Normalizer, y: jax.Array) -> jax.Array:
    return norm.inverse(y)


def accumulate(norm: Normalizer, x: jax.Array, mask=None, training: bool = True):
    """Update accumulator state if this is an online normalizer (else no-op)."""
    if isinstance(norm, Online) and training:
        return norm.update(x, mask)
    return norm


def accumulate_tree(
    norms: Mapping[str, Normalizer],
    batches: Mapping[str, jax.Array],
    mask=None,
    training: bool = True,
) -> Dict[str, Normalizer]:
    """Accumulate every online normalizer in a dict against matching batches."""
    out = dict(norms)
    for k, v in batches.items():
        if k in out:
            out[k] = accumulate(out[k], v, mask, training)
    return out


def cross_replica_sync(norm: Normalizer, axis_name: str) -> Normalizer:
    """psum online accumulators across a named mesh axis (multi-host training).

    New capability vs the single-device reference (SURVEY §2.3): keeps online
    statistics identical on every shard.

    **ONE-TIME merge only**: this psums the FULL accumulators, so applying it
    to already-synced state multiplies the sums by the axis size — repeated
    per-step syncing overflows f32 within ~40 steps (mean/std stay correct
    until then because numerator and denominator scale together, which is how
    the bug hid).  Inside a training step, use :func:`accumulate_synced`,
    which psums only the new batch's contribution.
    """
    if not isinstance(norm, Online):
        return norm
    return norm.replace(
        acc_count=jax.lax.pmax(norm.acc_count, axis_name),
        num_accumulations=jax.lax.psum(norm.num_accumulations, axis_name),
        acc_sum=jax.lax.psum(norm.acc_sum, axis_name),
        acc_sum_sq=jax.lax.psum(norm.acc_sum_sq, axis_name),
    )


def accumulate_synced(norm: Normalizer, x: jax.Array, mask=None,
                      axis_name=None, training: bool = True) -> Normalizer:
    """Accumulate one batch with its sums ``psum``'d across ``axis_name``.

    The repeat-safe sibling of ``accumulate`` + ``cross_replica_sync``: only
    the NEW batch's masked sums cross the axis, so already-synced state stays
    exact under arbitrarily many steps (every shard must call this the same
    number of times with its local shard of the batch).  ``axis_name`` may be
    a name or a tuple of names; ``None`` degrades to plain ``accumulate``.
    """
    if not isinstance(norm, Online) or not training:
        return norm
    if axis_name is None:
        return norm.update(x, mask)
    if x.ndim == 1:
        x = x[:, None]
    x = x.astype(jnp.float32)
    if mask is None:
        m = jnp.ones((x.shape[0],), jnp.float32)
    else:
        m = mask.reshape(-1).astype(jnp.float32)
    # acc_count advances once per call and is already identical on every
    # shard, so it needs no collective
    live = (norm.acc_count < norm.max_acc).astype(jnp.float32)
    w = m * live
    return norm.replace(
        acc_count=norm.acc_count + live,
        num_accumulations=norm.num_accumulations
        + live * jax.lax.psum(jnp.sum(m), axis_name),
        acc_sum=norm.acc_sum
        + jax.lax.psum(jnp.sum(x * w[:, None], axis=0), axis_name),
        acc_sum_sq=norm.acc_sum_sq
        + jax.lax.psum(jnp.sum(x * x * w[:, None], axis=0), axis_name),
    )


def normalizers_from_meta(
    meta: Mapping[str, Any], max_norm_steps: float = 1e7
) -> tuple[int, Normalizer, Dict[str, Normalizer], Dict[str, Normalizer]]:
    """Build (quantities, edge_norm, node_norms, output_norms) from meta.json.

    Mirrors the decision tree of ``calc_norms``
    (/root/reference/src/MeshGraphNets.jl:74-206):

    - edge meta with data_min/max -> offline min-max; data_mean/std -> offline
      mean-std; otherwise online over ``dims + 1`` features.
    - bool features: min-max over [0, 1]; int32 one-hot features: min-max with
      optional target range remap, width ``data_max - data_min + 1``.
    - float features: offline min-max (with optional target remap) or offline
      mean-std when stats present, else online; output normalizer uses
      output_min/max (or output_mean/std) when present, else online.
    - mesh_pos and cells are skipped (not node features).
    """
    quantities = 0
    n_norms: Dict[str, Normalizer] = {}
    o_norms: Dict[str, Normalizer] = {}
    dims = meta["dims"]
    ndim = len(dims) if isinstance(dims, (list, tuple)) else int(dims)

    edges_meta = meta.get("edges")
    if edges_meta is not None and isinstance(edges_meta, Mapping):
        if "data_min" in edges_meta and "data_max" in edges_meta:
            e_norm: Normalizer = OfflineMinMax.create(
                edges_meta["data_min"], edges_meta["data_max"]
            )
        elif "data_mean" in edges_meta and "data_std" in edges_meta:
            e_norm = OfflineMeanStd.create(
                edges_meta["data_mean"], edges_meta["data_std"]
            )
        else:
            raise KeyError(
                "'edges' in metadata requires data_min/data_max or data_mean/data_std"
            )
    else:
        e_norm = Online.create(ndim + 1, max_acc=max_norm_steps)

    target_features = meta.get("target_features", [])
    for feature in meta["feature_names"]:
        if feature in ("mesh_pos", "cells"):
            continue
        f = meta["features"][feature]
        dtype = f.get("dtype", "float32")
        is_target = feature in target_features
        if dtype == "bool":
            quantities += 1
            n_norms[feature] = OfflineMinMax.create(0.0, 1.0)
            if is_target:
                o_norms[feature] = OfflineMinMax.create(0.0, 1.0)
        elif dtype in ("int32", "int64"):
            if not f.get("onehot", False):
                raise ValueError(
                    f"integer feature '{feature}' must be onehot (as in the reference)"
                )
            quantities += int(f["data_max"]) - int(f["data_min"]) + 1
            tmin = f.get("target_min", 0.0)
            tmax = f.get("target_max", 1.0)
            n_norms[feature] = OfflineMinMax.create(0.0, 1.0, tmin, tmax)
            if is_target:
                o_norms[feature] = OfflineMinMax.create(0.0, 1.0, tmin, tmax)
        else:
            dim = int(f["dim"])
            quantities += dim
            if "data_min" in f and "data_max" in f:
                n_norms[feature] = OfflineMinMax.create(
                    f["data_min"],
                    f["data_max"],
                    f.get("target_min", 0.0),
                    f.get("target_max", 1.0),
                )
            elif "data_mean" in f and "data_std" in f:
                n_norms[feature] = OfflineMeanStd.create(f["data_mean"], f["data_std"])
            else:
                n_norms[feature] = Online.create(dim, max_acc=max_norm_steps)
            if is_target:
                if "output_min" in f and "output_max" in f:
                    o_norms[feature] = OfflineMinMax.create(
                        f["output_min"],
                        f["output_max"],
                        f.get("target_min", 0.0),
                        f.get("target_max", 1.0),
                    )
                elif "output_mean" in f and "output_std" in f:
                    o_norms[feature] = OfflineMeanStd.create(
                        f["output_mean"], f["output_std"]
                    )
                else:
                    o_norms[feature] = Online.create(dim, max_acc=max_norm_steps)
    return quantities, e_norm, n_norms, o_norms
