"""Model-family coverage: airfoil (multi-target) and deforming plate
(3-D grid mesh + absolute stress head) run end-to-end through the generic
train/eval path."""

import numpy as np
import optax
import pytest

from mgn_tpu import eval_network, train_network
from mgn_tpu.data.synthetic import write_airfoil_dataset, write_plate_dataset


SMALL = dict(mps=2, layer_size=16, hidden_layers=1, norm_steps=4,
             num_rollouts=1, solver_valid="euler", seed=0)


def test_airfoil_multi_target(tmp_path):
    d = str(tmp_path / "ds")
    write_airfoil_dataset(d, num_nodes=48, tl=8)
    cp = str(tmp_path / "cp")
    state, min_valid = train_network(
        (0.01, 0.001), optax.adam(1e-3), d, cp, steps=15, checkpoint=8,
        **SMALL)
    assert np.isfinite(min_valid)
    # output head covers velocity (2) + density (1)
    assert state.params["decoder"]["w"][-1].shape[1] == 3
    reports = eval_network(d, cp, str(tmp_path / "out"), solver="euler",
                           mse_steps=(2,), **SMALL)
    assert np.isfinite(reports[0]["final_rmse"])


def test_deforming_plate_grid_and_stress(tmp_path):
    d = str(tmp_path / "ds")
    write_plate_dataset(d, dims=(4, 4, 3), tl=6)
    cp = str(tmp_path / "cp")
    kw = dict(SMALL)
    kw["types_updated"] = (0, 6)  # plate: predict everywhere except handle
    state, min_valid = train_network(
        0.003, optax.adam(1e-3), d, cp, steps=12, checkpoint=6, **kw)
    assert np.isfinite(min_valid)
    # 3-D grid mesh synthesized edges; world_pos (3) + stress (1) outputs
    assert state.params["decoder"]["w"][-1].shape[1] == 4
    reports = eval_network(d, cp, str(tmp_path / "out"), solver="euler",
                           mse_steps=(2,), **kw)
    assert np.isfinite(reports[0]["final_rmse"])
