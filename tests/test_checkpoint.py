"""Checkpoint manager: dual streams, pruning, model-only restore, history."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mgn_tpu.checkpoint.manager import CheckpointManager
from mgn_tpu.core import normalizers as N
from mgn_tpu.train.common import NormState, TrainState


def make_state(step, val=1.0):
    opt = optax.adam(1e-3)
    params = {"w": [jnp.full((4, 4), val)], "b": [jnp.zeros((4,))]}
    return TrainState(
        params=params, opt_state=opt.init(params),
        norm=NormState(edge=N.Online.create(3),
                       node={"f": N.OfflineMeanStd.create(0.0, 1.0)},
                       output={"f": N.Online.create(2)}),
        step=jnp.asarray(step, jnp.int32))


def test_save_restore_roundtrip(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    st = make_state(7, val=2.5)
    st = st.replace(norm=st.norm.replace(edge=st.norm.edge.update(
        jnp.ones((5, 3)))))
    cm.save(st, loss=0.5)
    restored, hist = cm.restore(make_state(0))
    assert int(restored.step) == 7
    assert float(restored.params["w"][0][0, 0]) == 2.5
    # normalizer accumulators survive (the reference persists them too)
    assert float(restored.norm.edge.num_accumulations) == 5.0
    assert hist == [{"step": 7, "loss": 0.5}]


def test_best_stream_and_best_loss(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    assert cm.best_loss() == float("inf")
    cm.save(make_state(10), loss=1.0, best=True)
    cm.save(make_state(20), loss=0.4, best=True)
    assert cm.best_loss() == 0.4
    assert cm.latest_step(best=True) == 20
    assert cm.latest_step(best=False) is None


def test_keep_pruning(tmp_path):
    cm = CheckpointManager(str(tmp_path), keep=2)
    for s in (1, 2, 3, 4):
        cm.save(make_state(s), loss=float(s))
    steps = sorted(int(p.split("_")[1]) for p in os.listdir(str(tmp_path))
                   if p.startswith("step_"))
    assert steps == [3, 4]


def test_model_only_restore(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    cm.save(make_state(5, val=3.0), loss=0.1)
    abstract = CheckpointManager.model_subtree(make_state(0))
    model = cm.restore_model(abstract)
    assert float(model["params"]["w"][0][0, 0]) == 3.0
    assert int(model["step"]) == 5
    assert "opt_state" not in model


def test_restore_empty_returns_none(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    assert cm.restore(make_state(0)) is None
    assert cm.restore_model(CheckpointManager.model_subtree(make_state(0))) is None
