"""meta.json dataset-schema contract.

Format-compatible with the reference's metadata (consumed at
/root/reference/src/MeshGraphNets.jl:79-203 and /root/reference/src/dataset.jl:194-345,
documented in /root/reference/docs/src/training_data.md): keys ``dt``,
``trajectory_length``, ``n_trajectories``, ``n_trajectories_valid``, ``dims``,
``feature_names``, ``target_features``, optional ``edges`` (normalization
stats), ``custom_edges``, ``no_edges_node_types``, ``exclude_node_indices``,
and per-feature ``key/split/dim/shape/type/dtype/onehot/data_min/data_max/
target_min/target_max/output_min/output_max/has_ev``.  DeepMind-style and
reference-converted datasets load unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

__all__ = ["load_meta", "validate_meta", "feature_dtype", "node_type_range",
           "target_dims", "spatial_dim"]

_DTYPES = {
    "float32": np.float32,
    "float64": np.float64,
    "int32": np.int32,
    "int64": np.int64,
    "bool": np.bool_,
}


def load_meta(path: str) -> Dict[str, Any]:
    """Load and validate ``meta.json`` from a dataset directory (or file path)."""
    if os.path.isdir(path):
        path = os.path.join(path, "meta.json")
    with open(path) as f:
        meta = json.load(f)
    validate_meta(meta)
    return meta


def validate_meta(meta: Dict[str, Any]) -> None:
    for key in ("dt", "trajectory_length", "dims", "feature_names", "features"):
        if key not in meta:
            raise KeyError(f"meta.json missing required key {key!r}")
    for fn in meta["feature_names"]:
        if fn not in meta["features"]:
            raise KeyError(f"feature {fn!r} listed but not described in 'features'")
        f = meta["features"][fn]
        if f.get("type", "static") not in ("static", "dynamic"):
            raise ValueError(f"feature {fn!r}: type must be static|dynamic")
        if f.get("dtype", "float32") not in _DTYPES:
            raise ValueError(f"feature {fn!r}: unsupported dtype {f.get('dtype')!r}")
    for tf in meta.get("target_features", []):
        if tf not in meta["features"]:
            raise KeyError(f"target feature {tf!r} not described in 'features'")


def feature_dtype(meta: Dict[str, Any], name: str) -> np.dtype:
    return np.dtype(_DTYPES[meta["features"][name].get("dtype", "float32")])


def node_type_range(meta: Dict[str, Any]) -> tuple[int, int]:
    """(data_min, data_max) of the node_type one-hot feature."""
    f = meta["features"]["node_type"]
    return int(f.get("data_min", 0)), int(f.get("data_max", 6))


def target_dims(meta: Dict[str, Any]) -> Dict[str, int]:
    """target feature -> dim, in ``target_features`` order
    (the ``target_dict`` of /root/reference/src/strategies.jl:149-152)."""
    return {tf: int(meta["features"][tf]["dim"]) for tf in meta["target_features"]}


def spatial_dim(meta: Dict[str, Any]) -> int:
    dims = meta["dims"]
    return len(dims) if isinstance(dims, (list, tuple)) else int(dims)
