"""Non-uniform time grids + eval start/stop windowing (VERDICT r1 item 4).

Covers: arbitrary monotone ``saveat`` in the integrators
(/root/reference/src/solve.jl:57-61), per-trajectory dt in forcing lookups
(/root/reference/src/dataset.jl:313-322), aligned windowed eval
(/root/reference/src/MeshGraphNets.jl:509-521), resume-past-completion, and
the banded-capacity auto-fallback.
"""

import os

import h5py
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mgn_tpu import eval_network, train_network
from mgn_tpu.data.synthetic import write_synthetic_dataset
from mgn_tpu.rollout.integrators import odeint_fixed, odeint_tsit5_adaptive


def exp_decay(y, t):
    return -y


SAVEAT = jnp.asarray([0.0, 0.1, 0.3, 0.35, 0.7, 1.0], jnp.float32)


def test_fixed_nonuniform_saveat_matches_analytic():
    y0 = jnp.ones((3,))
    out = odeint_fixed(exp_decay, y0, SAVEAT, method="rk4", substeps=4)
    expected = jnp.exp(-SAVEAT)[:, None] * y0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_fixed_nonuniform_substep_refinement_converges():
    y0 = jnp.ones((2,))
    coarse = odeint_fixed(exp_decay, y0, SAVEAT, method="euler", substeps=1)
    fine = odeint_fixed(exp_decay, y0, SAVEAT, method="euler", substeps=32)
    expected = np.exp(-np.asarray(SAVEAT))[:, None] * np.ones((1, 2))
    err_c = np.abs(np.asarray(coarse) - expected).max()
    err_f = np.abs(np.asarray(fine) - expected).max()
    assert err_f < err_c / 4


def test_adaptive_nonuniform_saveat():
    y0 = jnp.ones((2,))
    out = odeint_tsit5_adaptive(exp_decay, y0, SAVEAT, rtol=1e-6, atol=1e-8)
    expected = jnp.exp(-SAVEAT)[:, None] * y0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def ds_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("win_ds")
    write_synthetic_dataset(str(d), num_nodes=48, tl=12, n_train=2, n_valid=1,
                            n_test=1)
    return str(d)


SMALL = dict(mps=1, layer_size=16, hidden_layers=1, norm_steps=2,
             types_updated=(0, 5), types_noisy=(0,), num_rollouts=1,
             solver_valid="euler", seed=0)


def test_eval_start_stop_alignment(ds_dir, tmp_path):
    """With start/stop set, y0, inflow forcing and the gt comparison must all
    use the same window of frames (round-1 bug: y0/gt stayed at frame 0)."""
    cp = str(tmp_path / "cp")
    train_network(0.01, optax.adam(1e-3), ds_dir, cp, steps=6, checkpoint=3,
                  **SMALL)

    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.train.common import FieldSpec

    dataset = load_dataset(ds_dir, is_training=False)
    meta = dataset.meta
    spec = FieldSpec.from_meta(meta)
    traj = dataset.trajectory(0)
    dt = float(traj.times[1] - traj.times[0])
    start, stop = float(traj.times[3]), float(traj.times[8])

    out = str(tmp_path / "out")
    reports = eval_network(ds_dir, cp, out, solver="euler", start=start,
                           stop=stop, mse_steps=(0, 2), **SMALL)
    # window = frames 3..8 inclusive -> 6 saved states
    with h5py.File(os.path.join(out, "euler", "trajectories.h5")) as f:
        gt = np.asarray(f["0"]["gt"])
        pred = np.asarray(f["0"]["prediction"])
        ts = np.asarray(f["0"]["timesteps"])
    assert gt.shape[0] == 6 and pred.shape[0] == 6
    np.testing.assert_allclose(ts, traj.times[3:9], rtol=1e-6)
    full_gt = np.concatenate([traj.fields[f] for f in spec.target_fields], -1)
    np.testing.assert_allclose(gt, full_gt[3:9], rtol=1e-6)
    # the first saved state equals the window's initial frame (y0 alignment)
    np.testing.assert_allclose(pred[0], full_gt[3], rtol=1e-5, atol=1e-6)
    # mse at horizon 0 is therefore ~0
    assert reports[0]["horizons"][0]["mse"] < 1e-8


def test_resume_past_completion_returns_cleanly(ds_dir, tmp_path):
    cp = str(tmp_path / "cp2")
    state1, _ = train_network(0.01, optax.adam(1e-3), ds_dir, cp, steps=8,
                              checkpoint=4, **SMALL)
    # ask for FEWER total steps than already trained: must not crash
    state2, _ = train_network(0.01, optax.adam(1e-3), ds_dir, cp, steps=4,
                              checkpoint=4, **SMALL)
    assert int(state2.step) == int(state1.step)


def test_band_overflow_falls_back_to_xla():
    """A >2048-edge hub node must warn + drop row_offsets, not crash."""
    from mgn_tpu.data.pipeline import Trajectory
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.train.common import FieldSpec

    n = 2200  # star graph: hub receives n-1 > 2048 directed edges
    rng = np.random.default_rng(0)
    mesh_pos = rng.normal(size=(n, 2)).astype(np.float32)
    edges = np.stack([np.zeros(n - 1, np.int32),
                      np.arange(1, n, dtype=np.int32)], 1)
    traj = Trajectory(
        mesh_pos=mesh_pos,
        node_type=np.zeros((n,), np.int32),
        times=np.arange(3, dtype=np.float32),
        fields={"velocity": rng.normal(size=(3, n, 2)).astype(np.float32)},
        edges=edges,
    )
    meta = {"features": {"node_type": {"data_min": 0, "data_max": 6}},
            "dims": 2}
    spec = FieldSpec(fields=("velocity",), target_fields=("velocity",),
                     field_dims=(2,), target_dims=(2,))
    with pytest.warns(UserWarning, match="banded"):
        prep = prepare_trajectory(traj, meta, spec)
    assert prep.template.row_offsets is None
