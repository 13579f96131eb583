import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgn_tpu.core import normalizers as N


def test_offline_minmax_roundtrip():
    nm = N.OfflineMinMax.create(-2.0, 4.0)
    x = jnp.linspace(-2, 4, 7)
    y = nm(x)
    assert np.allclose(y, np.linspace(0, 1, 7), atol=1e-6)
    assert np.allclose(nm.inverse(y), x, atol=1e-6)


def test_offline_minmax_target_remap():
    nm = N.OfflineMinMax.create(0.0, 10.0, target_min=-1.0, target_max=1.0)
    assert np.allclose(nm(jnp.array([0.0, 5.0, 10.0])), [-1.0, 0.0, 1.0])
    assert np.allclose(nm.inverse(jnp.array([-1.0, 0.0, 1.0])), [0.0, 5.0, 10.0])


def test_offline_meanstd():
    nm = N.OfflineMeanStd.create(3.0, 2.0)
    x = jnp.array([1.0, 3.0, 5.0])
    assert np.allclose(nm(x), [-1, 0, 1])
    assert np.allclose(nm.inverse(nm(x)), x)


def test_online_matches_batch_stats():
    rng = np.random.default_rng(0)
    xs = rng.normal(3.0, 2.0, size=(10, 50, 4)).astype(np.float32)
    st = N.Online.create(4)
    for x in xs:
        st = st.update(jnp.asarray(x))
    flat = xs.reshape(-1, 4)
    assert np.allclose(st.mean, flat.mean(0), atol=1e-4)
    assert np.allclose(st.std, flat.std(0), atol=1e-3)
    y = st(jnp.asarray(flat))
    assert np.allclose(np.asarray(y).mean(0), 0, atol=1e-4)
    assert np.allclose(np.asarray(y).std(0), 1, atol=1e-3)
    assert np.allclose(st.inverse(y), flat, atol=1e-3)


def test_online_mask_and_cap():
    st = N.Online.create(2, max_acc=2)
    x = jnp.ones((4, 2))
    mask = jnp.array([True, True, False, False])
    st = st.update(x, mask)
    assert st.num_accumulations == 2.0
    st = st.update(x * 3)
    st = st.update(x * 100)  # beyond cap: ignored
    assert float(st.acc_count) == 2.0
    assert np.allclose(st.mean, (2 * 1 + 4 * 3) / 6.0)


def test_online_update_is_jittable():
    st = N.Online.create(3)

    @jax.jit
    def step(st, x):
        return st.update(x)

    st = step(st, jnp.ones((5, 3)))
    assert float(st.num_accumulations) == 5.0


def test_cross_replica_sync_on_virtual_mesh():
    ndev = len(jax.devices())
    assert ndev == 8, "conftest must force 8 virtual cpu devices"
    st = N.Online.create(1)

    def f(x):
        s = st.update(x)
        return N.cross_replica_sync(s, "d")

    xs = jnp.arange(ndev * 2, dtype=jnp.float32).reshape(ndev, 2, 1)
    out = jax.pmap(f, axis_name="d")(xs)
    # every shard holds identical, global statistics
    assert np.allclose(np.asarray(out.num_accumulations), 2 * ndev)
    assert np.allclose(np.asarray(out.mean), xs.mean())


def test_accumulate_synced_repeat_safe():
    """accumulate_synced over many steps == one global single-stream
    accumulation — regression for the f32 overflow where per-step
    cross_replica_sync multiplied the accumulators by the axis size each
    step (mean/std stayed correct until ~step 40, then went NaN)."""
    ndev = len(jax.devices())
    steps = 50
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(steps, ndev, 4, 2)).astype(np.float32)

    def f(x_steps):  # x_steps: (steps, 4, 2) local shard
        def body(st, x):
            return N.accumulate_synced(st, x, None, "d"), 0
        st, _ = jax.lax.scan(body, N.Online.create(2), x_steps)
        return st

    out = jax.pmap(f, axis_name="d")(jnp.asarray(xs).transpose(1, 0, 2, 3))
    flat = xs.reshape(-1, 2)
    assert np.allclose(np.asarray(out.num_accumulations), len(flat))
    st0 = jax.tree.map(lambda a: a[0], out)  # shard 0's (global) statistics
    assert np.allclose(np.asarray(st0.mean), flat.mean(0), atol=1e-5)
    assert np.allclose(np.asarray(st0.std), flat.std(0), atol=1e-4)
    # the broken pattern overflowed acc_sum_sq by ndev**steps; exact sums now
    assert np.allclose(np.asarray(st0.acc_sum_sq), (flat ** 2).sum(0),
                       rtol=1e-5)


def meta_cylinder():
    return {
        "dims": 2,
        "feature_names": ["cells", "mesh_pos", "node_type", "velocity"],
        "target_features": ["velocity"],
        "features": {
            "node_type": {"dtype": "int32", "dim": 1, "onehot": True,
                          "data_min": 0, "data_max": 6},
            "velocity": {"dtype": "float32", "dim": 2},
        },
    }


def test_normalizers_from_meta_online_default():
    q, e, nn, on = N.normalizers_from_meta(meta_cylinder())
    assert q == 7 + 2
    assert isinstance(e, N.Online) and e.acc_sum.shape == (3,)
    assert isinstance(nn["node_type"], N.OfflineMinMax)
    assert isinstance(nn["velocity"], N.Online)
    assert isinstance(on["velocity"], N.Online)
    assert set(on) == {"velocity"}


def test_normalizers_from_meta_offline_paths():
    meta = meta_cylinder()
    meta["features"]["velocity"].update(
        {"data_min": -1.0, "data_max": 1.0, "output_min": -5.0, "output_max": 5.0}
    )
    meta["edges"] = {"data_mean": 0.0, "data_std": 1.0}
    q, e, nn, on = N.normalizers_from_meta(meta)
    assert isinstance(e, N.OfflineMeanStd)
    assert isinstance(nn["velocity"], N.OfflineMinMax)
    assert isinstance(on["velocity"], N.OfflineMinMax)
    assert float(on["velocity"].data_min) == -5.0


def test_normalizers_from_meta_rejects_bad_int():
    meta = meta_cylinder()
    meta["features"]["node_type"]["onehot"] = False
    with pytest.raises(ValueError):
        N.normalizers_from_meta(meta)
