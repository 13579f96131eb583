"""Synthetic dataset generation (tests, benchmarks, examples).

Produces cylinder-flow-shaped datasets — triangulated 2-D channel mesh with
inflow/outflow/wall node types and a smooth traveling-wave velocity field — in
the same on-disk contract the real datasets use (meta.json + train/valid/test
HDF5 with one group per trajectory).  Node-type conventions follow the
reference example (types_updated=[0,5], inflow type 1:
/root/reference/src/MeshGraphNets.jl:45, :593).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import h5py
import numpy as np
from scipy.spatial import Delaunay

__all__ = ["make_channel_mesh", "make_trajectory", "write_synthetic_dataset",
           "synthetic_meta"]


def make_channel_mesh(num_nodes: int, seed: int = 0):
    """Random triangulated unit channel [0,2]x[0,1] with boundary node types.

    Returns (mesh_pos (N,2) f32, cells (C,3) i32, node_type (N,) i32):
    type 1 = inflow (x==0), 5 = outflow (x==2), 6 = wall (y boundary),
    0 = interior fluid.
    """
    rng = np.random.default_rng(seed)
    n_side = max(4, int(np.sqrt(num_nodes / 2)))
    # structured boundary + jittered interior for a valid triangulation
    xs = np.linspace(0, 2, 2 * n_side)
    ys = np.linspace(0, 1, n_side)
    bound = np.concatenate([
        np.stack([xs, np.zeros_like(xs)], 1),
        np.stack([xs, np.ones_like(xs)], 1),
        np.stack([np.zeros(n_side - 2), ys[1:-1]], 1),
        np.stack([np.full(n_side - 2, 2.0), ys[1:-1]], 1),
    ])
    n_int = max(0, num_nodes - len(bound))
    interior = rng.random((n_int, 2)) * [1.96, 0.96] + [0.02, 0.02]
    pos = np.concatenate([bound, interior], 0).astype(np.float32)
    tri = Delaunay(pos)
    cells = tri.simplices.astype(np.int32)
    node_type = np.zeros(len(pos), np.int32)
    node_type[np.abs(pos[:, 1]) < 1e-6] = 6
    node_type[np.abs(pos[:, 1] - 1) < 1e-6] = 6
    node_type[np.abs(pos[:, 0] - 2) < 1e-6] = 5
    node_type[np.abs(pos[:, 0]) < 1e-6] = 1
    return pos, cells, node_type


def make_trajectory(
    mesh_pos: np.ndarray, node_type: np.ndarray, tl: int, dt: float, seed: int = 0,
    speed: Optional[float] = None,
) -> np.ndarray:
    """Smooth traveling-wave velocity field (T, N, 2), zero on walls.

    With the default per-trajectory random ``speed`` the dynamics are NOT
    Markovian in the velocity state (du/dt is proportional to a speed that a
    single frame does not determine), which puts an irreducible floor on
    one-step models.  Pass a fixed ``speed`` for convergence studies where the
    field must be exactly learnable from the state (benchmarks/accuracy_tpu.py).
    """
    rng = np.random.default_rng(seed)
    phase = rng.random() * 2 * np.pi
    if speed is None:
        speed = 0.5 + rng.random()
    x, y = mesh_pos[:, 0], mesh_pos[:, 1]
    t = np.arange(tl, dtype=np.float32)[:, None] * dt
    profile = 4 * y * (1 - y)  # parabolic channel profile
    u = profile[None, :] * (1.0 + 0.3 * np.sin(2 * np.pi * (x[None, :] - speed * t) + phase))
    v = 0.1 * profile[None, :] * np.cos(2 * np.pi * (x[None, :] - speed * t) + phase)
    vel = np.stack([u, v], axis=-1).astype(np.float32)
    vel[:, node_type == 6] = 0.0
    return vel


def synthetic_meta(tl: int, n_train: int, n_valid: int, dt: float = 0.01) -> Dict:
    """meta.json matching the cylinder_flow example schema
    (/root/reference/examples/cylinder_flow/meta.json)."""
    return {
        "dt": dt,
        "trajectory_length": tl,
        "n_trajectories": n_train,
        "n_trajectories_valid": n_valid,
        "dims": 2,
        "feature_names": ["cells", "mesh_pos", "node_type", "velocity"],
        "target_features": ["velocity"],
        "features": {
            "cells": {"type": "static", "dim": 3, "shape": [1, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "dim": 2, "shape": [1, -1, 2],
                         "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "shape": [1, -1, 1],
                          "dtype": "int32", "onehot": True,
                          "data_min": 0, "data_max": 6},
            "velocity": {"type": "dynamic", "dim": 2, "shape": [tl, -1, 2],
                         "dtype": "float32"},
        },
    }


def write_synthetic_dataset(
    path: str,
    num_nodes: int = 256,
    tl: int = 50,
    n_train: int = 4,
    n_valid: int = 2,
    n_test: int = 2,
    dt: float = 0.01,
    seed: int = 0,
    num_nodes_per_traj=None,
    speed: Optional[float] = None,
) -> Dict:
    """Write meta.json + train/valid/test .h5 files; returns the meta dict.

    By default all trajectories share one mesh (like the fixed-topology
    datasets); ``num_nodes_per_traj`` (a sequence, cycled per split index)
    gives each trajectory its own mesh size — the heterogeneous-dataset case
    (airfoil-class) used by the bucket-probing tests.
    """
    os.makedirs(path, exist_ok=True)
    meta = synthetic_meta(tl, n_train, n_valid, dt)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)

    meshes: Dict[int, tuple] = {}

    def mesh_for(i: int):
        size = (num_nodes if num_nodes_per_traj is None
                else int(num_nodes_per_traj[i % len(num_nodes_per_traj)]))
        if size not in meshes:
            meshes[size] = make_channel_mesh(size, seed)
        return meshes[size]

    splits = {"train": n_train, "valid": n_valid, "test": n_test}
    k = 0
    for split, n in splits.items():
        with h5py.File(os.path.join(path, f"{split}.h5"), "w") as f:
            for i in range(n):
                pos, cells, node_type = mesh_for(i)
                g = f.create_group(str(i))
                g["cells"] = cells
                g["mesh_pos"] = pos
                g["node_type"] = node_type[:, None]
                g["velocity"] = make_trajectory(pos, node_type, tl, dt,
                                                seed + 1000 + k, speed=speed)
                k += 1
    return meta


# --- FlagSimple (cloth) -------------------------------------------------------

def make_flag_mesh(nx: int = 8, ny: int = 6):
    """Triangulated rectangular cloth sheet.

    Returns (mesh_pos (N,2) reference coords, cells (C,3), node_type (N,)):
    type 3 = HANDLE (fixed pole edge x=0), 0 = NORMAL cloth.
    """
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 0.6, ny),
                         indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    idx = np.arange(nx * ny).reshape(nx, ny)
    c = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            c.append([idx[i, j], idx[i + 1, j], idx[i, j + 1]])
            c.append([idx[i + 1, j], idx[i + 1, j + 1], idx[i, j + 1]])
    cells = np.asarray(c, np.int32)
    node_type = np.zeros(nx * ny, np.int32)
    node_type[idx[0, :]] = 3  # handle: attached edge
    return pos, cells, node_type


def make_flag_trajectory(mesh_pos: np.ndarray, node_type: np.ndarray, tl: int,
                         dt: float, seed: int = 0,
                         amp: Optional[float] = None,
                         freq: Optional[float] = None,
                         phase: Optional[float] = None) -> np.ndarray:
    """Waving-cloth world positions (T, N, 3): reference sheet + traveling
    transverse wave, handle pinned.

    With the default per-trajectory random ``freq`` the second-order
    dynamics are NOT Markovian in (position, velocity) — the acceleration is
    proportional to freq^2, unobservable from one state.  Pass a fixed
    ``freq`` for convergence studies (the field is then exactly harmonic:
    acc = -(2 pi freq)^2 * displacement).  ``amp`` and ``phase`` CAN vary
    per trajectory within that Markovian family — the acceleration stays
    proportional to the observable displacement — and ``phase`` defaults to
    a per-seed random draw so trajectories differ (round 4 trained on 8
    byte-identical trajectories because fixed amp+freq left seed with
    nothing to randomize — the marginal long-horizon number's root cause)."""
    rng = np.random.default_rng(seed)
    if amp is None:
        amp = 0.1 + 0.1 * rng.random()
    if freq is None:
        freq = 2.0 + 2.0 * rng.random()
    if phase is None:
        phase = 2 * np.pi * rng.random()
    x, y = mesh_pos[:, 0], mesh_pos[:, 1]
    t = np.arange(tl, dtype=np.float32)[:, None] * dt
    z = amp * x[None, :] * np.sin(
        2 * np.pi * (2 * x[None, :] - freq * t) + phase)
    wx = x[None, :] * (1 - 0.1 * amp * np.sin(2 * np.pi * freq * t + phase))
    world = np.stack([wx, np.broadcast_to(y[None, :], wx.shape), z], -1)
    world[:, node_type == 3, 2] = 0.0
    return world.astype(np.float32)


def flag_meta(tl: int, n_train: int, n_valid: int, dt: float = 0.02):
    return {
        "dt": dt,
        "trajectory_length": tl,
        "n_trajectories": n_train,
        "n_trajectories_valid": n_valid,
        "dims": 2,  # reference (mesh) space is 2-D; world space is 3-D
        "world_dim": 3,
        "world_edges": {"radius": 0.05, "capacity_per_node": 4},
        "feature_names": ["cells", "mesh_pos", "node_type", "world_pos"],
        "target_features": ["world_pos"],
        "features": {
            "cells": {"type": "static", "dim": 3, "shape": [1, -1, 3],
                      "dtype": "int32"},
            "mesh_pos": {"type": "static", "dim": 2, "shape": [1, -1, 2],
                         "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "shape": [1, -1, 1],
                          "dtype": "int32", "onehot": True,
                          "data_min": 0, "data_max": 6},
            "world_pos": {"type": "dynamic", "dim": 3, "shape": [tl, -1, 3],
                          "dtype": "float32"},
        },
    }


def write_flag_dataset(path: str, nx: int = 8, ny: int = 6, tl: int = 30,
                       n_train: int = 2, n_valid: int = 1, n_test: int = 1,
                       dt: float = 0.02, seed: int = 0,
                       amp: Optional[float] = None,
                       freq: Optional[float] = None):
    """FlagSimple-shaped synthetic dataset (cloth with 3-D world dynamics)."""
    os.makedirs(path, exist_ok=True)
    pos, cells, node_type = make_flag_mesh(nx, ny)
    meta = flag_meta(tl, n_train, n_valid, dt)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    k = 0
    for split, n in (("train", n_train), ("valid", n_valid), ("test", n_test)):
        with h5py.File(os.path.join(path, f"{split}.h5"), "w") as f:
            for i in range(n):
                g = f.create_group(str(i))
                g["cells"] = cells
                g["mesh_pos"] = pos
                g["node_type"] = node_type[:, None]
                g["world_pos"] = make_flag_trajectory(pos, node_type, tl, dt,
                                                      seed + 100 + k,
                                                      amp=amp, freq=freq)
                k += 1
    return meta


# --- Airfoil (compressible flow) ---------------------------------------------

def airfoil_meta(tl: int, n_train: int, n_valid: int, dt: float = 0.008):
    return {
        "dt": dt,
        "trajectory_length": tl,
        "n_trajectories": n_train,
        "n_trajectories_valid": n_valid,
        "dims": 2,
        "feature_names": ["cells", "mesh_pos", "node_type", "velocity",
                          "density"],
        "target_features": ["velocity", "density"],
        "features": {
            "cells": {"type": "static", "dim": 3, "shape": [1, -1, 3],
                      "dtype": "int32"},
            "mesh_pos": {"type": "static", "dim": 2, "shape": [1, -1, 2],
                         "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "shape": [1, -1, 1],
                          "dtype": "int32", "onehot": True,
                          "data_min": 0, "data_max": 6},
            "velocity": {"type": "dynamic", "dim": 2, "shape": [tl, -1, 2],
                         "dtype": "float32"},
            "density": {"type": "dynamic", "dim": 1, "shape": [tl, -1, 1],
                        "dtype": "float32"},
        },
    }


def write_airfoil_dataset(path: str, num_nodes: int = 256, tl: int = 20,
                          n_train: int = 2, n_valid: int = 1, n_test: int = 1,
                          dt: float = 0.008, seed: int = 0,
                          speed: Optional[float] = None):
    """Airfoil-shaped synthetic dataset: multi-target (velocity + density).

    Pass a fixed ``speed`` for convergence studies (Markovian dynamics,
    trajectories then differ by their random phase — see
    :func:`make_trajectory`)."""
    os.makedirs(path, exist_ok=True)
    pos, cells, node_type = make_channel_mesh(num_nodes, seed)
    meta = airfoil_meta(tl, n_train, n_valid, dt)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    k = 0
    for split, n in (("train", n_train), ("valid", n_valid), ("test", n_test)):
        with h5py.File(os.path.join(path, f"{split}.h5"), "w") as f:
            for i in range(n):
                g = f.create_group(str(i))
                vel = make_trajectory(pos, node_type, tl, dt, seed + 300 + k,
                                      speed=speed)
                g["cells"] = cells
                g["mesh_pos"] = pos
                g["node_type"] = node_type[:, None]
                g["velocity"] = vel
                # smooth companion density field correlated with speed
                g["density"] = (1.0 + 0.1 * np.linalg.norm(vel, axis=-1,
                                                           keepdims=True)
                                ).astype(np.float32)
                k += 1
    return meta


# --- DeformingPlate (3-D quasi-static solid with stress head) ----------------

def plate_meta(tl: int, n_train: int, n_valid: int, dt: float = 1.0,
               dims=(4, 4, 3)):
    return {
        "dt": dt,
        "trajectory_length": tl,
        "n_trajectories": n_train,
        "n_trajectories_valid": n_valid,
        "dims": list(dims),  # structured 3-D grid mesh
        "feature_names": ["mesh_pos", "node_type", "world_pos", "stress"],
        "target_features": ["world_pos", "stress"],
        "features": {
            "mesh_pos": {"type": "static", "dim": 3, "dtype": "float32"},
            "node_type": {"type": "static", "dim": 1, "dtype": "int32",
                          "onehot": True, "data_min": 0, "data_max": 6},
            "world_pos": {"type": "dynamic", "dim": 3, "dtype": "float32"},
            # stress is a value head, not a derivative (new capability)
            "stress": {"type": "dynamic", "dim": 1, "dtype": "float32",
                       "output_mode": "absolute"},
        },
    }


def write_plate_dataset(path: str, dims=(4, 4, 3), tl: int = 10,
                        n_train: int = 2, n_valid: int = 1, n_test: int = 1,
                        seed: int = 0, dt: float = 1.0, tau: float = 4.0):
    """DeformingPlate-shaped synthetic dataset: 3-D grid mesh, damped
    relaxation of a deformed solid + stress output head; node type 3 = held
    handle (top layer), 6 = clamped base.

    Dynamics (round-5 redesign — the old linear-in-t quasi-static push was
    NOT Markovian in the state: du/dt depended on the unobservable time):
    each trajectory starts from a random smooth displacement field and
    relaxes exponentially toward a fixed equilibrium,

        disp(t) = eq + (disp0 - eq) * exp(-t*dt/tau)
        => d disp/dt = (eq - disp) / tau        (function of the STATE)

    with ``eq`` a fixed geometry-determined sag (learnable from mesh_pos)
    and stress the instantaneous elastic magnitude ``|disp - eq|``-based
    field (an absolute output head, not a derivative).  Handle and clamped
    nodes stay at their initial positions.
    """
    os.makedirs(path, exist_ok=True)
    dims = tuple(int(d) for d in dims)
    n = int(np.prod(dims))
    # column-major (Fortran) node order to match the grid linear indexing
    grid = np.stack(np.meshgrid(*[np.linspace(0, 1, d) for d in dims],
                                indexing="ij"), -1).reshape(-1, 3, order="F")
    pos = grid.astype(np.float32)
    node_type = np.zeros(n, np.int32)
    node_type[pos[:, 2] > 0.99] = 3  # top layer: held handle
    node_type[pos[:, 2] < 0.01] = 6  # bottom clamped
    free = node_type == 0
    meta = plate_meta(tl, n_train, n_valid, dt=dt, dims=dims)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    rng = np.random.default_rng(seed)
    # fixed equilibrium sag: interior bows toward -z, zero at held layers
    shape_fn = (np.sin(np.pi * pos[:, 2]) * (1 - 0.4 * pos[:, 0])
                * (1 - 0.2 * pos[:, 1]))
    eq = np.zeros((n, 3), np.float32)
    eq[:, 2] = -0.15 * shape_fn
    eq[~free] = 0.0
    k = 0
    for split, cnt in (("train", n_train), ("valid", n_valid), ("test", n_test)):
        with h5py.File(os.path.join(path, f"{split}.h5"), "w") as f:
            for i in range(cnt):
                g = f.create_group(str(i))
                # random smooth initial displacement (few low-freq modes)
                r = rng.standard_normal(6) * 0.08
                disp0 = np.zeros((n, 3), np.float32)
                for ax in range(3):
                    disp0[:, ax] = (
                        r[ax] * np.sin(np.pi * pos[:, 2])
                        * np.sin(np.pi * pos[:, 0])
                        + r[3 + ax] * np.sin(np.pi * pos[:, 2])
                        * np.cos(np.pi * pos[:, 1])) * 0.5
                disp0[~free] = 0.0
                t = (np.arange(tl, dtype=np.float32) * dt)[:, None, None]
                decay = np.exp(-t / tau)
                disp = eq[None] + (disp0 - eq)[None] * decay
                world = pos[None] + disp
                stress = np.linalg.norm(disp - eq[None], axis=-1) \
                    + 0.5 * np.abs(disp[..., 2])
                g["mesh_pos"] = pos
                g["node_type"] = node_type[:, None]
                g["world_pos"] = world.astype(np.float32)
                g["stress"] = stress.astype(np.float32)
                k += 1
    return meta
