"""Property-based tests (hypothesis): graph builders, normalizers, segment ops."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from mgn_tpu.core import graph as G
from mgn_tpu.core import normalizers as N

FAST = settings(max_examples=25, deadline=None)


@given(st.integers(2, 40), st.integers(1, 60), st.integers(2, 4),
       st.randoms(use_true_random=False))
@FAST
def test_cells_to_edges_properties(n_nodes, n_cells, k, rnd):
    rng = np.random.default_rng(rnd.randint(0, 2**31))
    cells = rng.integers(0, n_nodes, size=(n_cells, k)).astype(np.int32)
    s, r = G.cells_to_edges(cells)
    assert len(s) == len(r)
    # symmetry for proper edges; self-loops appear exactly once
    pairs = list(zip(s.tolist(), r.tolist()))
    assert len(set(pairs)) == len(pairs)  # no duplicates
    for a, b in pairs:
        if a != b:
            assert (b, a) in set(pairs)
    # every emitted edge comes from some cell pair
    cellsets = [set(c) for c in cells.tolist()]
    for a, b in pairs:
        assert any(a in cs and b in cs for cs in cellsets)


@given(st.integers(1, 200), st.integers(0, 3))
@FAST
def test_bucket_size_properties(n, extra):
    m = 128 * (2 ** extra)
    b = G.bucket_size(n, multiple=m)
    assert b >= n and b % m == 0 and b - n < m


@given(st.floats(-100, 100), st.floats(0.1, 100),
       st.floats(-5, 5), st.floats(0.2, 4))
@FAST
def test_offline_normalizer_inverse_roundtrip(lo, width, tmin, twidth):
    nm = N.OfflineMinMax.create(lo, lo + width, tmin, tmin + twidth)
    x = jnp.linspace(lo, lo + width, 9)
    assert np.allclose(nm.inverse(nm(x)), x, atol=1e-3 * max(1, abs(lo) + width))
    ms = N.OfflineMeanStd.create(lo, width)
    assert np.allclose(ms.inverse(ms(x)), x, atol=1e-3 * max(1, abs(lo) + width))


@given(st.integers(1, 6), st.randoms(use_true_random=False))
@FAST
def test_online_normalizer_matches_numpy_stats(n_batches, rnd):
    rng = np.random.default_rng(rnd.randint(0, 2**31))
    xs = [rng.normal(rng.uniform(-3, 3), rng.uniform(0.5, 2),
                     size=(rng.integers(1, 30), 3)).astype(np.float32)
          for _ in range(n_batches)]
    stt = N.Online.create(3)
    for x in xs:
        stt = stt.update(jnp.asarray(x))
    flat = np.concatenate(xs, 0)
    assert np.allclose(stt.mean, flat.mean(0), atol=1e-3)
    assert np.allclose(stt.std, flat.std(0) + 1e-9, atol=1e-2)


@given(st.integers(1, 120), st.integers(2, 120), st.randoms(use_true_random=False))
@FAST
def test_segment_sum_xla_random(n_real, e_real, rnd):
    from mgn_tpu.ops.segment import segment_sum

    rng = np.random.default_rng(rnd.randint(0, 2**31))
    recv = np.sort(rng.integers(0, n_real, size=(e_real,))).astype(np.int32)
    data = rng.normal(size=(e_real, 4)).astype(np.float32)
    out = segment_sum(jnp.asarray(data), jnp.asarray(recv), n_real,
                      backend="xla")
    ref = np.zeros((n_real, 4), np.float32)
    np.add.at(ref, recv, data)
    assert np.allclose(np.asarray(out), ref, atol=1e-4)


@given(st.integers(2, 5), st.integers(2, 5), st.integers(1, 4))
@FAST
def test_grid_edges_count(nx, ny, nz):
    s, r = G.grid_edges([nx, ny, nz])
    expect = ((nx - 1) * ny * nz + nx * (ny - 1) * nz + nx * ny * (nz - 1))
    assert len(s) == 2 * expect
