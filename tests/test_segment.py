import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgn_tpu.core.graph import csr_row_offsets
from mgn_tpu.ops.segment import segment_sum
from mgn_tpu.ops.pallas_segment import csr_segment_sum


def make_case(rng, n_real, n_pad, e_real, e_pad, f):
    recv = np.sort(rng.integers(0, n_real, size=(e_real,))).astype(np.int32)
    recv_p = np.concatenate([recv, np.full((e_pad - e_real,), n_pad - 1, np.int32)])
    row = csr_row_offsets(recv, n_real)
    row_p = np.concatenate([row, np.full((n_pad - n_real,), e_real, np.int32)])
    row_p[-1] = e_pad
    data = rng.normal(size=(e_pad, f)).astype(np.float32)
    return jnp.asarray(data), jnp.asarray(recv_p), jnp.asarray(row_p)


def dense_ref(data, recv, n):
    out = np.zeros((n, data.shape[1]), np.float32)
    np.add.at(out, np.asarray(recv), np.asarray(data))
    return out


def test_xla_segment_sum_matches_dense():
    rng = np.random.default_rng(0)
    data, recv, row = make_case(rng, 100, 128, 700, 768, 16)
    out = segment_sum(data, recv, 128, backend="xla")
    assert np.allclose(np.asarray(out), dense_ref(data, recv, 128), atol=1e-5)


@pytest.mark.parametrize("n_real,n_pad,e_real,e_pad,f", [
    (100, 128, 700, 768, 128),
    (128, 128, 768, 768, 128),
    (5, 256, 17, 512, 8),
])
def test_pallas_csr_matches_dense(n_real, n_pad, e_real, e_pad, f):
    rng = np.random.default_rng(1)
    data, recv, row = make_case(rng, n_real, n_pad, e_real, e_pad, f)
    out = csr_segment_sum(data, recv, row, n_pad, block_nodes=128, block_edges=256)
    ref = dense_ref(data, recv, n_pad)
    assert np.allclose(np.asarray(out), ref, atol=1e-4), np.abs(np.asarray(out) - ref).max()


def test_pallas_csr_grad_is_gather():
    rng = np.random.default_rng(2)
    data, recv, row = make_case(rng, 100, 128, 700, 768, 8)

    def loss(d):
        out = csr_segment_sum(d, recv, row, 128, block_nodes=128, block_edges=256)
        return jnp.sum(out**2)

    g = jax.grad(loss)(data)
    out = dense_ref(data, recv, 128)
    expect = 2 * out[np.asarray(recv)]
    assert np.allclose(np.asarray(g), expect, atol=1e-4)


def test_pallas_csr_under_jit():
    rng = np.random.default_rng(3)
    data, recv, row = make_case(rng, 100, 128, 700, 768, 8)
    f = jax.jit(lambda d: csr_segment_sum(d, recv, row, 128))
    assert np.allclose(np.asarray(f(data)), dense_ref(data, recv, 128), atol=1e-4)


def test_pallas_hbm_path_matches_dense(monkeypatch):
    """Force the double-buffered HBM kernel (large-graph path)."""
    import mgn_tpu.ops.pallas_segment as ps
    monkeypatch.setattr(ps, "_VMEM_BYTES_LIMIT", 0)
    rng = np.random.default_rng(5)
    data, recv, row = make_case(rng, 100, 128, 700, 768, 128)
    out = csr_segment_sum(data, recv, row, 128, block_nodes=128, block_edges=256)
    assert np.allclose(np.asarray(out), dense_ref(data, recv, 128), atol=1e-4)


def test_banded_matches_dense():
    from mgn_tpu.ops.banded import banded_segment_sum, required_band

    rng = np.random.default_rng(7)
    data, recv, row = make_case(rng, 200, 256, 1500, 1536, 128)
    band = required_band(np.asarray(row), 256)
    out = banded_segment_sum(data, recv, row, 256, max(band, 128))
    assert np.allclose(np.asarray(out), dense_ref(data, recv, 256), atol=1e-4)
    # full-array band also valid
    out2 = banded_segment_sum(data, recv, row, 256, data.shape[0])
    assert np.allclose(np.asarray(out2), dense_ref(data, recv, 256), atol=1e-4)


def test_banded_grad_is_gather():
    from mgn_tpu.ops.banded import banded_segment_sum

    rng = np.random.default_rng(8)
    data, recv, row = make_case(rng, 100, 128, 700, 768, 8)

    def loss(d):
        return jnp.sum(banded_segment_sum(d, recv, row, 128, 768) ** 2)

    g = jax.grad(loss)(data)
    expect = 2 * dense_ref(data, recv, 128)[np.asarray(recv)]
    assert np.allclose(np.asarray(g), expect, atol=1e-4)


def test_backend_dispatch_banded():
    rng = np.random.default_rng(9)
    data, recv, row = make_case(rng, 100, 128, 700, 768, 16)
    out = segment_sum(data, recv, 128, row_offsets=row, backend="banded")
    assert np.allclose(np.asarray(out), dense_ref(data, recv, 128), atol=1e-4)
