"""FlagSimple-class cloth family: world edges, acceleration targets, rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mgn_tpu.data.pipeline import load_dataset
from mgn_tpu.data.prep import common_buckets, prepare_trajectory
from mgn_tpu.data.synthetic import write_flag_dataset
from mgn_tpu.models.mgn_multi import init_mgn_multi
from mgn_tpu.train.cloth import (ClothConfig, cloth_model_config,
                                 make_cloth_norm_state, make_cloth_rollout,
                                 make_cloth_trainer)
from mgn_tpu.train.common import FieldSpec, TrainState


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("flag")
    write_flag_dataset(str(d), nx=6, ny=4, tl=12, n_train=1, n_valid=1, n_test=1)
    ds = load_dataset(str(d), is_training=True)
    spec = FieldSpec.from_meta(ds.meta)
    nb, eb = common_buckets([ds.trajectory(0)], ds.meta)
    prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec, nb, eb)
    mcfg = cloth_model_config(ds.meta, latent=16, hidden_layers=1, mps=2)
    # radius reaches the un-triangulated quad diagonals (0.283 at rest)
    # so the world-edge set is non-empty on this mesh
    cfg = ClothConfig(model=mcfg, world_radius=0.3, world_capacity=256,
                      noise_stddev=0.0, norm_steps=2)
    opt = optax.adam(3e-3)
    params = init_mgn_multi(jax.random.PRNGKey(0), mcfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       norm=make_cloth_norm_state(cfg),
                       step=jnp.zeros((), jnp.int32))
    return ds, prep, cfg, opt, state


def test_cloth_model_dims(setup):
    ds, prep, cfg, opt, state = setup
    assert cfg.model.node_input_dim == 3 + 7
    assert cfg.model.edge_input_dims == (7, 4)
    assert cfg.model.output_dim == 3


def test_cloth_training_reduces_loss(setup):
    ds, prep, cfg, opt, state = setup
    trainer = jax.jit(make_cloth_trainer(cfg, opt))
    wp = prep.fields["world_pos"]
    rng = np.random.default_rng(0)
    hist = []
    for it in range(25):
        perm = jnp.asarray(1 + rng.permutation(prep.num_steps - 2), jnp.int32)
        state, losses = trainer(state, prep.template, wp, prep.times, perm,
                                jax.random.PRNGKey(it))
        hist.append(float(np.asarray(losses).mean()))
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.5, hist
    # normalizers accumulated for all quantities incl world edges
    assert float(state.norm.edge["world"].num_accumulations) > 0
    assert float(state.norm.output["acceleration"].num_accumulations) > 0


def test_cloth_rollout_shapes_and_handles(setup):
    ds, prep, cfg, opt, state = setup
    rollout = jax.jit(make_cloth_rollout(cfg))
    wp = prep.fields["world_pos"]
    pred = rollout(state.params, state.norm, prep.template, wp, prep.times)
    assert pred.shape == wp.shape
    # handle nodes (type 3, not updated) track ground truth exactly
    handles = np.asarray(prep.template.node_type) == 3
    assert np.allclose(np.asarray(pred)[:, handles], np.asarray(wp)[:, handles],
                       atol=1e-5)
    assert np.isfinite(np.asarray(pred)).all()
