"""FlagSimple example — cloth with 3-D world dynamics and dynamic world edges
(BASELINE.json config 3).  Uses the cloth family: two edge sets (mesh + world),
acceleration targets, semi-implicit rollout (mgn_tpu.train.cloth).

    python flag_simple.py train <ds_path> <cp_path>
    python flag_simple.py rollout <ds_path> <cp_path>

Generate synthetic data with
``mgn_tpu.data.synthetic.write_flag_dataset(ds_path)``.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mgn_tpu.checkpoint.manager import CheckpointManager
from mgn_tpu.data.pipeline import load_dataset
from mgn_tpu.data.prep import common_buckets, prepare_trajectory
from mgn_tpu.models.mgn_multi import init_mgn_multi
from mgn_tpu.train.cloth import (ClothConfig, cloth_model_config,
                                 jit_cloth_rollout, jit_cloth_trainer,
                                 make_cloth_norm_state, make_cloth_rollout,
                                 make_cloth_trainer)
from mgn_tpu.train.common import FieldSpec, TrainState
from mgn_tpu.utils.metrics import MetricsLogger


def main():
    mode, ds_path, cp_path = sys.argv[1], sys.argv[2], sys.argv[3]
    log = MetricsLogger()
    ds = load_dataset(ds_path, is_training=(mode == "train"))
    meta = ds.meta
    spec = FieldSpec.from_meta(meta)
    mcfg = cloth_model_config(meta, latent=128, hidden_layers=2, mps=15)
    we = meta.get("world_edges", {})
    cfg = ClothConfig(model=mcfg,
                      world_radius=float(we.get("radius", 0.05)),
                      world_capacity=2048, noise_stddev=0.003,
                      norm_steps=1000)
    opt = optax.adam(1e-4)
    params = init_mgn_multi(jax.random.PRNGKey(0), mcfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       norm=make_cloth_norm_state(cfg),
                       step=jnp.zeros((), jnp.int32))
    ckpt = CheckpointManager(cp_path)
    restored = ckpt.restore(state)
    if restored is not None:
        state, _ = restored

    nb, eb = common_buckets([ds.trajectory(0)], meta)
    rng = np.random.default_rng(0)

    if mode == "train":
        trainer = jit_cloth_trainer(cfg, opt)
        for epoch in range(100):
            for i in range(ds.num_trajectories):
                prep = prepare_trajectory(ds.trajectory(i), meta, spec, nb, eb)
                perm = jnp.asarray(1 + rng.permutation(prep.num_steps - 2),
                                   jnp.int32)
                state, losses = trainer(state, prep.template,
                                        prep.fields["world_pos"], prep.times,
                                        perm, jax.random.PRNGKey(epoch))
                log.log("train", step=int(state.step),
                        loss=float(np.asarray(losses).mean()))
            ckpt.save(state, float(np.asarray(losses).mean()))
    else:
        rollout = jit_cloth_rollout(cfg)
        for i in range(ds.num_trajectories):
            prep = prepare_trajectory(ds.trajectory(i), meta, spec, nb, eb)
            pred = rollout(state.params, state.norm, prep.template,
                           prep.fields["world_pos"], prep.times)
            err = float(jnp.mean((pred - prep.fields["world_pos"]) ** 2))
            log.log("rollout", trajectory=i, mse=err)


if __name__ == "__main__":
    main()
