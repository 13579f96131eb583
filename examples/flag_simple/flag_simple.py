"""FlagSimple example — cloth with 3-D world dynamics and dynamic world edges
(BASELINE.json config 3).  Uses the cloth family: two edge sets (mesh + world),
acceleration targets, semi-implicit rollout (mgn_tpu.train.cloth).

    python flag_simple.py train <ds_path> <cp_path> [--graph-parallel N]
    python flag_simple.py rollout <ds_path> <cp_path> [--graph-parallel N]

``--graph-parallel N`` shards the graph over N devices (power of two) via
the sharded multi-edge-set path (mgn_tpu.parallel.cloth): mesh edges are
receiver-partitioned by coordinate bisection and world edges are rebuilt
per shard each frame from an all-gathered position table.

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
    graph_parallel = 0
    if "--graph-parallel" in sys.argv:
        graph_parallel = int(sys.argv[sys.argv.index("--graph-parallel") + 1])
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

    if graph_parallel:
        _run_graph_parallel(mode, ds, meta, spec, cfg, opt, state, ckpt,
                            log, rng, graph_parallel)
        return

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


def _run_graph_parallel(mode, ds, meta, spec, cfg, opt, state, ckpt, log,
                        rng, num_parts):
    """Graph-parallel twin of the single-device loops above
    (mgn_tpu.parallel.cloth): one trajectory sharded over ``num_parts``
    devices on a ("graph",) mesh."""
    from jax.sharding import Mesh

    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.parallel.cloth import (cloth_static_batch,
                                        make_sharded_cloth_rollout,
                                        make_sharded_cloth_trainer,
                                        partition_cloth,
                                        partition_field_stack,
                                        unpermute_field_stack)

    mesh = Mesh(np.array(jax.devices()[:num_parts]), ("graph",))
    t_min = int(meta["features"]["node_type"]["data_min"])
    t_max = int(meta["features"]["node_type"]["data_max"])
    cap_part = max(256, cfg.world_capacity // num_parts)

    def shard(traj):
        s, r = cells_to_edges(np.asarray(traj.cells))
        pt = partition_cloth(np.asarray(traj.mesh_pos),
                             np.asarray(traj.node_type).reshape(-1),
                             s, r, num_parts, type_min=t_min, type_max=t_max)
        wp = jnp.asarray(partition_field_stack(
            pt, np.asarray(traj.fields["world_pos"], np.float32)))
        return pt, cloth_static_batch(pt), wp, jnp.asarray(traj.times)

    if mode == "train":
        trainer = make_sharded_cloth_trainer(mesh, cfg, opt, cap_part)
        for epoch in range(100):
            for i in range(ds.num_trajectories):
                pt, batch, wp, times = shard(ds.trajectory(i))
                perm = jnp.asarray(1 + rng.permutation(wp.shape[0] - 2),
                                   jnp.int32)
                state, losses = trainer(state, batch, wp, times, perm,
                                        jax.random.PRNGKey(epoch))
                log.log("train", step=int(state.step),
                        loss=float(np.asarray(losses).mean()))
            ckpt.save(state, float(np.asarray(losses).mean()))
    else:
        rollout = make_sharded_cloth_rollout(mesh, cfg, cap_part)
        for i in range(ds.num_trajectories):
            traj = ds.trajectory(i)
            pt, batch, wp, times = shard(traj)
            pred = rollout(state.params, state.norm, batch, wp, times)
            pred = unpermute_field_stack(pt, np.asarray(pred),
                                         traj.num_nodes)
            err = float(np.mean(
                (pred - np.asarray(traj.fields["world_pos"])) ** 2))
            log.log("rollout", trajectory=i, mse=err)


if __name__ == "__main__":
    main()
