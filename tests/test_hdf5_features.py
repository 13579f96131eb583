"""Reference-style HDF5 layouts: %d-indexed keys, split coords, .ev extras,
custom_edges, grid synthesis, per-trajectory dt (semantics of
/root/reference/src/dataset.jl:194-352)."""

import json
import os

import h5py
import numpy as np
import pytest

from mgn_tpu.data.hdf5 import read_trajectory
from mgn_tpu.data.pipeline import load_dataset


@pytest.fixture(scope="module")
def grid_ds(tmp_path_factory):
    """1-D grid dataset with %d-indexed, split, .ev features + dt vector."""
    d = tmp_path_factory.mktemp("gridds")
    tl, n = 6, 5
    meta = {
        "dt": "timestamps",
        "trajectory_length": tl,
        "dims": [5],
        "feature_names": ["mesh_pos", "node_type", "temp", "disp"],
        "target_features": ["temp"],
        "features": {
            "mesh_pos": {"type": "static", "dim": 1, "dtype": "float32",
                         "key": "pos%d"},
            "node_type": {"type": "static", "dim": 1, "dtype": "int32",
                          "onehot": True, "data_min": 0, "data_max": 6,
                          "key": "type%d"},
            "temp": {"type": "dynamic", "dim": 1, "dtype": "float32",
                     "key": "T%d", "has_ev": True},
            "disp": {"type": "dynamic", "dim": 2, "dtype": "float32",
                     "key": "u%d", "split": True},
        },
    }
    rng = np.random.default_rng(0)
    temps = rng.random((n, tl)).astype(np.float32)
    disps = rng.random((n, 2, tl)).astype(np.float32)
    with h5py.File(os.path.join(d, "train.h5"), "w") as f:
        g = f.create_group("traj0")
        g["timestamps"] = (np.arange(tl) * 0.5).astype(np.float32)
        for i in range(n):
            g[f"pos{i}"] = np.float32(i * 0.25)
            g[f"type{i}"] = np.int32(0 if 0 < i < n - 1 else 6)
            g[f"T{i}"] = temps[i]
            g[f"T{i}.ev"] = np.stack([temps[i], temps[i]], 1)
            g[f"u{i}[0]"] = disps[i, 0]
            g[f"u{i}[1]"] = disps[i, 1]
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    return str(d), meta, temps, disps


def test_percent_d_and_split_keys(grid_ds):
    d, meta, temps, disps = grid_ds
    raw = read_trajectory(os.path.join(d, "train.h5"), "traj0", meta)
    assert raw["temp"].shape == (6, 5, 1)
    assert np.allclose(raw["temp"][:, :, 0], temps.T)
    assert raw["disp"].shape == (6, 5, 2)
    assert np.allclose(raw["disp"][:, :, 0], disps[:, 0].T)
    assert np.allclose(raw["disp"][:, :, 1], disps[:, 1].T)
    assert np.allclose(raw["mesh_pos"][0, :, 0], np.arange(5) * 0.25)
    assert raw["node_type"][0, :, 0].tolist() == [6, 0, 0, 0, 6]


def test_ev_and_times_and_grid_edges(grid_ds):
    d, meta, temps, _ = grid_ds
    raw = read_trajectory(os.path.join(d, "train.h5"), "traj0", meta)
    assert "temp.ev" in raw and raw["temp.ev"].shape == (6, 5, 2)
    assert np.allclose(raw["times"], np.arange(6) * 0.5)
    # 1-D chain edges synthesized from grid dims
    edges = raw["edges"]
    und = set(map(tuple, np.sort(edges, axis=1)))
    assert und == {(0, 1), (1, 2), (2, 3), (3, 4)}


def test_load_dataset_grid(grid_ds):
    d, meta, temps, _ = grid_ds
    ds = load_dataset(d, is_training=True)
    t = ds.trajectory(0)
    assert t.num_nodes == 5
    assert t.edges is not None
    assert "temp" in t.fields and t.fields["temp"].shape == (6, 5, 1)
    assert "temp.ev" in t.extras


@pytest.fixture(scope="module")
def custom_edge_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("ceds")
    tl, n = 3, 6
    meta = {
        "dt": 0.1,
        "trajectory_length": tl,
        "dims": [6],
        "custom_edges": "graph_edges",
        "no_edges_node_types": [9],
        "exclude_node_indices": [5],
        "feature_names": ["mesh_pos", "node_type", "val"],
        "target_features": ["val"],
        "features": {
            "mesh_pos": {"type": "static", "dim": 1, "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "dtype": "int32",
                          "onehot": True, "data_min": 0, "data_max": 9},
            "val": {"type": "dynamic", "dim": 1, "dtype": "float32"},
        },
    }
    with h5py.File(os.path.join(d, "train.h5"), "w") as f:
        g = f.create_group("0")
        g["mesh_pos"] = np.arange(n, dtype=np.float32)[:, None]
        g["node_type"] = np.array([0, 0, 9, 0, 0, 0], np.int32)[:, None]
        g["val"] = np.ones((tl, n), np.float32)
        g["graph_edges"] = np.array(
            [[0, 1], [1, 2], [2, 3], [3, 4], [4, 5]], np.int32)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    return str(d), meta


def test_custom_edges_with_exclusions(custom_edge_ds):
    d, meta = custom_edge_ds
    raw = read_trajectory(os.path.join(d, "train.h5"), "0", meta)
    edges = raw["edges"]
    pairs = set(map(tuple, edges))
    # node 2 excluded by type 9, node 5 excluded by index
    assert (0, 1) in pairs and (3, 4) in pairs
    assert not any(2 in p for p in pairs)
    assert not any(5 in p for p in pairs)


def test_jld2_layout(tmp_path):
    """JLD2 files are valid HDF5 bytes; Julia column-major arrays appear
    dimension-reversed through h5py, landing on this reader's row-major
    (T, N, dim) convention.  The JLD2-internal ``_types`` metadata group must
    be skipped, and ``.jld2`` files route through the HDF5 reader
    (/root/reference/src/dataset.jl:92-100, :118-167)."""
    tl, n = 4, 7
    meta = {
        "dt": 0.1,
        "trajectory_length": tl,
        "dims": 1,
        "feature_names": ["mesh_pos", "node_type", "temp"],
        "target_features": ["temp"],
        "features": {
            "mesh_pos": {"type": "static", "dim": 1, "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "dtype": "int32",
                          "onehot": True, "data_min": 0, "data_max": 6},
            "temp": {"type": "dynamic", "dim": 1, "dtype": "float32"},
        },
    }
    rng = np.random.default_rng(3)
    temp = rng.random((tl, n)).astype(np.float32)
    p = os.path.join(tmp_path, "train.jld2")
    with h5py.File(p, "w") as f:
        # JLD2 writes a committed-datatype group alongside the user data
        t = f.create_group("_types")
        t["00000001"] = np.int32(0)
        for k in ("0", "1"):
            g = f.create_group(k)
            # Julia Vector{Float32}(n) / Matrix (n, tl) -> h5py (n,), (tl, n)
            g["mesh_pos"] = np.linspace(0, 1, n).astype(np.float32)
            g["node_type"] = np.zeros((n,), np.int32)
            g["temp"] = temp
            g["edges_custom"] = np.stack(
                [np.arange(n - 1), np.arange(1, n)], 1).astype(np.int32)
    meta["custom_edges"] = "edges_custom"
    with open(os.path.join(tmp_path, "meta.json"), "w") as f:
        json.dump(meta, f)

    from mgn_tpu.data.hdf5 import trajectory_keys

    assert trajectory_keys(p) == ["0", "1"]  # _types skipped
    ds = load_dataset(str(tmp_path), is_training=True)
    assert ds.num_trajectories == 2
    t0 = ds.trajectory(0)
    assert t0.num_nodes == n
    assert np.allclose(t0.fields["temp"][:, :, 0], temp)


def test_place_rejects_wrong_layout(tmp_path):
    """Strict meta-driven layout: a (N, T) dynamic array (transposed) must
    raise instead of being guessed at (round-1 weak item 5)."""
    tl, n = 5, 9  # distinct so the transpose is detectable
    meta = {
        "dt": 0.1, "trajectory_length": tl, "dims": 1,
        "feature_names": ["mesh_pos", "node_type", "temp"],
        "target_features": ["temp"],
        "features": {
            "mesh_pos": {"type": "static", "dim": 1, "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "dtype": "int32",
                          "onehot": True, "data_min": 0, "data_max": 6},
            "temp": {"type": "dynamic", "dim": 1, "dtype": "float32"},
        },
    }
    p = os.path.join(tmp_path, "train.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("0")
        g["mesh_pos"] = np.zeros((n,), np.float32)
        g["node_type"] = np.zeros((n,), np.int32)
        g["temp"] = np.zeros((n, tl), np.float32)  # transposed!
    with pytest.raises(ValueError, match="does not match the meta.json layout"):
        read_trajectory(p, "0", meta)


def test_extras_are_read_but_stripped_from_model_state(grid_ds):
    """`.ev` parity: the reference reads `.ev` channels and strips them at
    state assembly without consuming them anywhere
    (/root/reference/src/dataset.jl:216-218 read,
    /root/reference/src/strategies.jl:153-160 and
    /root/reference/src/MeshGraphNets.jl:579-586 strip).  Here they land in
    Trajectory.extras and never enter FieldSpec (= the model inputs)."""
    d, meta, _, _ = grid_ds
    from mgn_tpu.train.common import FieldSpec

    ds = load_dataset(d, is_training=True)
    t = ds.trajectory(0)
    assert "temp.ev" in t.extras          # read (data available to users)
    spec = FieldSpec.from_meta(meta)
    assert all(not f.endswith(".ev") for f in spec.fields)   # stripped
    assert "temp.ev" not in t.fields
