"""Native (C++) graph-builder vs NumPy reference."""

import numpy as np
import pytest

from mgn_tpu.core import graph as G
from mgn_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++?)")


def test_cells_to_edges_matches_numpy():
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 500, size=(800, 3)).astype(np.int32)
    s_np, r_np = G.cells_to_edges(cells)
    s_np, r_np = G.sort_edges_by_receiver(s_np, r_np)
    s_na, r_na = native.cells_to_edges_native(cells)
    assert len(s_na) == len(s_np)
    # both receiver-sorted; native additionally sorts by sender within receiver
    assert set(zip(s_na.tolist(), r_na.tolist())) == \
        set(zip(s_np.tolist(), r_np.tolist()))
    assert (np.diff(r_na) >= 0).all()


def test_tets_supported():
    cells = np.array([[0, 1, 2, 3]], np.int32)
    s, r = native.cells_to_edges_native(cells)
    assert len(s) == 12  # 6 undirected pairs x 2


def test_csr_offsets_match():
    rng = np.random.default_rng(1)
    recv = np.sort(rng.integers(0, 100, size=(1000,))).astype(np.int32)
    assert (native.csr_offsets_native(recv, 100)
            == G.csr_row_offsets(recv, 100)).all()


def test_edge_features_match():
    rng = np.random.default_rng(2)
    pos = rng.random((200, 3)).astype(np.float32)
    s = rng.integers(0, 200, size=(500,)).astype(np.int32)
    r = rng.integers(0, 200, size=(500,)).astype(np.int32)
    ref = G.relative_mesh_features(pos, s, r)
    out = native.edge_features_native(pos, s, r)
    assert np.allclose(out, ref, atol=1e-6)


def test_build_template_uses_native_consistently():
    rng = np.random.default_rng(3)
    pos = rng.random((100, 2)).astype(np.float32)
    cells = rng.integers(0, 100, size=(150, 3)).astype(np.int32)
    node_type = np.zeros(100, np.int32)
    t = G.build_template(pos, node_type, cells=cells, node_bucket=128,
                         edge_bucket=1024)
    e = int(t.edge_mask.sum())
    r = np.asarray(t.receivers)[:e]
    assert (np.diff(r) >= 0).all()
    ro = np.asarray(t.row_offsets)
    for v in range(100):
        assert ro[v + 1] - ro[v] == (r == v).sum()
