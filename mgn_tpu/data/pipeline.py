"""Dataset orchestration: file discovery, lazy readers, prefetch, device prep.

Covers the reference's data layer (/root/reference/src/dataset.jl): format
discovery (tfrecord > h5, /root/reference/src/dataset.jl:92-100), lazy
background producers (the Channel readers at :102-167 become a prefetch
thread), in-memory trajectory caching (:556-583), and the canonicalization +
padding step that turns ragged trajectories into static-shape device arrays
(the TPU-specific redesign — SURVEY.md §7.1 item 1).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from mgn_tpu.data import hdf5 as hdf5_reader
from mgn_tpu.data import tfrecord as tfr
from mgn_tpu.data.meta import load_meta

__all__ = ["Trajectory", "Dataset", "load_dataset"]


@dataclasses.dataclass
class Trajectory:
    """Canonical in-memory trajectory (host, row-major, node-major)."""

    mesh_pos: np.ndarray  # (N, D) f32
    node_type: np.ndarray  # (N,) i32
    times: np.ndarray  # (T,) f32 timestamps
    fields: Dict[str, np.ndarray]  # dynamic node fields, each (T, N, dim) f32
    cells: Optional[np.ndarray] = None  # (C, K) i32
    edges: Optional[np.ndarray] = None  # (E, 2) i32
    extras: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return self.mesh_pos.shape[0]

    @property
    def num_steps(self) -> int:
        return self.times.shape[0]


def _canonicalize(raw: Dict[str, np.ndarray], meta: Dict[str, Any]) -> Trajectory:
    """Reader output {feature: (T, N, dim)} -> Trajectory."""
    mesh_pos = np.asarray(raw["mesh_pos"], np.float32)
    if mesh_pos.ndim == 3:
        mesh_pos = mesh_pos[0]
    node_type = np.asarray(raw["node_type"], np.int32)
    if node_type.ndim == 3:
        node_type = node_type[0, :, 0]
    elif node_type.ndim == 2:
        node_type = node_type[:, 0]
    fields = {}
    extras = {}
    for fn in meta["feature_names"]:
        if fn in ("mesh_pos", "node_type", "cells"):
            continue
        arr = np.asarray(raw[fn], np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        fields[fn] = arr
        if fn + ".ev" in raw:
            extras[fn + ".ev"] = np.asarray(raw[fn + ".ev"], np.float32)
    cells = raw.get("cells")
    if cells is not None:
        cells = np.asarray(cells, np.int32)
        if cells.ndim == 3:
            cells = cells[0]
    edges = raw.get("edges")
    if edges is not None:
        edges = np.asarray(edges, np.int32).reshape(-1, 2)
    times = np.asarray(raw.get("times"), np.float32)
    return Trajectory(mesh_pos=mesh_pos, node_type=node_type, times=times,
                      fields=fields, cells=cells, edges=edges, extras=extras)


@dataclasses.dataclass
class TrajectoryStructure:
    """Shape-only view of a trajectory (bucket sizing without field I/O).
    Duck-typed against :class:`Trajectory` for ``common_buckets``."""

    num_nodes: int
    cells: Optional[np.ndarray] = None
    edges: Optional[np.ndarray] = None


class _Reader:
    def __len__(self) -> int:
        raise NotImplementedError

    def read(self, i: int) -> Trajectory:
        raise NotImplementedError

    def read_structure(self, i: int) -> Optional[TrajectoryStructure]:
        """Cheap shape probe; None means 'needs a full read'."""
        return None


class _H5Reader(_Reader):
    def __init__(self, path: str, meta: Dict[str, Any]):
        self.path = path
        self.meta = meta
        self.keys = hdf5_reader.trajectory_keys(path)
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.keys)

    def read(self, i: int) -> Trajectory:
        with self._lock:  # serialize HDF5 handle access (cf. reference's ReentrantLock)
            raw = hdf5_reader.read_trajectory(self.path, self.keys[i], self.meta)
        return _canonicalize(raw, self.meta)

    def read_structure(self, i: int) -> Optional[TrajectoryStructure]:
        with self._lock:
            st = hdf5_reader.read_structure(self.path, self.keys[i], self.meta)
        if st is None:
            return None
        n, cells, edges = st
        return TrajectoryStructure(num_nodes=n, cells=cells, edges=edges)


class _TFRecordReader(_Reader):
    def __init__(self, path: str, meta: Dict[str, Any]):
        self.path = path
        self.meta = meta
        with open(path, "rb") as f:
            data = f.read()
        # index record boundaries once; payloads decoded on demand
        self._offsets: List[tuple[int, int]] = []
        pos = 0
        import struct as _s

        while pos + 12 <= len(data):
            (ln,) = _s.unpack_from("<Q", data, pos)
            self._offsets.append((pos + 12, ln))
            pos += 12 + ln + 4
        self._data = data

    def __len__(self):
        return len(self._offsets)

    def read(self, i: int) -> Trajectory:
        off, ln = self._offsets[i]
        example = tfr.parse_example(self._data[off : off + ln])
        raw = tfr.parse_trajectory(example, self.meta)
        out: Dict[str, np.ndarray] = {}
        for k, v in raw.items():
            out[k] = v
        tl = int(self.meta["trajectory_length"])
        out["times"] = np.arange(tl, dtype=np.float32) * np.float32(self.meta["dt"])
        return _canonicalize(out, self.meta)

    def read_structure(self, i: int) -> Optional[TrajectoryStructure]:
        off, ln = self._offsets[i]
        example = tfr.parse_example(self._data[off : off + ln],
                                    keys={"mesh_pos", "cells"})
        raw = tfr.parse_trajectory(example, self.meta)
        if "mesh_pos" not in raw or "cells" not in raw:
            return None
        mp = raw["mesh_pos"]
        cells = np.asarray(raw["cells"], np.int32)
        if cells.ndim == 3:
            cells = cells[0]
        return TrajectoryStructure(
            num_nodes=int(mp.shape[1] if mp.ndim == 3 else mp.shape[0]),
            cells=cells)


class Dataset:
    """Train/valid (or test) split pair with caching and prefetch.

    The analogue of the reference ``Dataset`` struct + ``next_trajectory!``
    (/root/reference/src/dataset.jl:36-47, :608-624); preprocessing (targets,
    noise, shuffling) happens on device inside the jitted train step instead of
    on the host.
    """

    def __init__(self, meta: Dict[str, Any], reader: _Reader,
                 reader_valid: Optional[_Reader] = None, cache: bool = True,
                 prefetch: int = 2):
        self.meta = meta
        self._reader = reader
        self._reader_valid = reader_valid
        self._cache: Dict[tuple, Trajectory] = {}
        self._structures: Dict[tuple, TrajectoryStructure] = {}
        self._use_cache = cache
        self._prefetch = prefetch
        self.num_trajectories = len(reader)
        self.num_valid = len(reader_valid) if reader_valid is not None else 0

    def trajectory(self, i: int, valid: bool = False) -> Trajectory:
        key = ("v" if valid else "t", i % (self.num_valid if valid else self.num_trajectories))
        if key in self._cache:
            return self._cache[key]
        reader = self._reader_valid if valid else self._reader
        traj = reader.read(key[1])
        if self._use_cache:
            self._cache[key] = traj
        return traj

    def structure(self, i: int, valid: bool = False) -> TrajectoryStructure:
        """Shape-only trajectory view (num_nodes + connectivity) — cheap
        enough to scan over EVERY trajectory for bucket sizing."""
        n = self.num_valid if valid else self.num_trajectories
        key = ("sv" if valid else "st", i % n)
        if key in self._structures:
            return self._structures[key]
        reader = self._reader_valid if valid else self._reader
        st = reader.read_structure(key[1])
        if st is None:  # layout defeats the cheap probe: full read
            t = self.trajectory(i, valid=valid)
            st = TrajectoryStructure(num_nodes=t.num_nodes, cells=t.cells,
                                     edges=t.edges)
        self._structures[key] = st
        return st

    def iter_train(self, epochs: Optional[int] = None) -> Iterator[Trajectory]:
        """Round-robin over training trajectories with background prefetch."""
        total = None if epochs is None else epochs * self.num_trajectories
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()

        def producer():
            i = 0
            while not stop.is_set() and (total is None or i < total):
                try:
                    q.put(self.trajectory(i), timeout=0.5)
                    i += 1
                except queue.Full:
                    continue
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def iter_valid(self) -> Iterator[Trajectory]:
        for i in range(self.num_valid):
            yield self.trajectory(i, valid=True)


def load_dataset(path: str, is_training: bool = True, cache: bool = True) -> Dataset:
    """Discover and open a dataset directory.

    Priority per split file: ``<split>.tfrecord`` then ``<split>.h5`` then
    ``<split>.jld2``, matching /root/reference/src/dataset.jl:92-100.  JLD2
    files are valid HDF5 bytes and route through the HDF5 reader: trajectory
    groups of plain numeric arrays (the layout the reference documents) read
    identically via h5py — Julia's column-major arrays appear dim-reversed,
    which is exactly the row-major convention; JLD2's ``_types`` metadata
    group is skipped (see :func:`mgn_tpu.data.hdf5.trajectory_keys`).
    ``is_training`` selects train+valid vs test (the reference's convention
    at :522).
    """
    meta = load_meta(path)
    split = "train" if is_training else "test"

    def open_reader(name: str) -> Optional[_Reader]:
        for ext, cls in ((".tfrecord", _TFRecordReader), (".h5", _H5Reader),
                         (".jld2", _H5Reader)):
            p = os.path.join(path, name + ext)
            if os.path.isfile(p):
                return cls(p, meta)
        return None

    reader = open_reader(split)
    if reader is None:
        raise FileNotFoundError(f"no {split}.tfrecord/.h5 in {path}")
    reader_valid = open_reader("valid") if is_training else None
    meta = dict(meta)
    meta["n_trajectories"] = len(reader)
    if reader_valid is not None:
        meta["n_trajectories_valid"] = len(reader_valid)
    return Dataset(meta, reader, reader_valid, cache=cache)
