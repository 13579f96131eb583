"""Graph-parallel multi-edge-set (cloth/world-edge) family vs single device.

Closes the round-4 "known limit" (docs/parity.md §2.3): world edges are
dynamic per frame, so the sharded path builds them per shard from an
all-gathered position table (parallel/cloth.py).  Every test checks the
sharded result against the single-device train/cloth path on the same data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from mgn_tpu.core.graph import build_world_edges, cells_to_edges
from mgn_tpu.data.pipeline import load_dataset
from mgn_tpu.data.prep import common_buckets, prepare_trajectory
from mgn_tpu.data.synthetic import write_flag_dataset
from mgn_tpu.models.mgn_multi import init_mgn_multi
from mgn_tpu.parallel.cloth import (build_world_edges_sharded,
                                    cloth_static_batch,
                                    make_sharded_cloth_rollout,
                                    make_sharded_cloth_trainer,
                                    partition_cloth, partition_field_stack,
                                    unpermute_field_stack)
from mgn_tpu.parallel.spmd import _global_ids
from mgn_tpu.train.cloth import (ClothConfig, cloth_model_config,
                                 make_cloth_norm_state, make_cloth_rollout,
                                 make_cloth_trainer)
from mgn_tpu.train.common import FieldSpec, TrainState

NUM_PARTS = 4


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("flag_par")
    write_flag_dataset(str(d), nx=8, ny=6, tl=12, n_train=1, n_valid=1,
                       n_test=1)
    ds = load_dataset(str(d), is_training=True)
    spec = FieldSpec.from_meta(ds.meta)
    nb, eb = common_buckets([ds.trajectory(0)], ds.meta)
    prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec, nb, eb)
    traj = ds.trajectory(0)
    pos = np.asarray(traj.mesh_pos, np.float32)
    nt = np.asarray(traj.node_type).reshape(-1).astype(np.int32)
    s, r = cells_to_edges(np.asarray(traj.cells))
    t_min = int(ds.meta["features"]["node_type"]["data_min"])
    t_max = int(ds.meta["features"]["node_type"]["data_max"])
    pt = partition_cloth(pos, nt, s, r, NUM_PARTS, type_min=t_min,
                         type_max=t_max, part_node_bucket=24,
                         part_edge_bucket=160)
    wp = np.asarray(traj.fields["world_pos"], np.float32)  # (T, N, 3) raw

    mcfg = cloth_model_config(ds.meta, latent=16, hidden_layers=1, mps=2)
    cfg = ClothConfig(model=mcfg, world_radius=0.3, world_capacity=1024,
                      noise_stddev=0.0, norm_steps=2)
    opt = optax.adam(3e-3)
    params = init_mgn_multi(jax.random.PRNGKey(0), mcfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       norm=make_cloth_norm_state(cfg),
                       step=jnp.zeros((), jnp.int32))
    mesh = Mesh(np.array(jax.devices()[:NUM_PARTS]), ("graph",))
    return ds, prep, pt, wp, cfg, opt, state, mesh, (pos, nt, s, r)


def _sharded_world_union(pt, mesh, wp_frame, radius, capacity):
    """Run the per-shard builder under shard_map; return the union of real
    edges mapped back to ORIGINAL node ids."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    batch = cloth_static_batch(pt)
    wp_parts = partition_field_stack(pt, wp_frame[None])[0]  # (P, N_p, 3)

    def local(wp_l, mask_l, sg, rl):
        ws, wr, wm = build_world_edges_sharded(
            wp_l[0], mask_l[0], radius, capacity, "graph",
            exclude_senders=sg[0], exclude_receivers=rl[0])
        return ws[None], wr[None], wm[None]

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("graph"), P("graph"), P("graph"), P("graph")),
                   out_specs=(P("graph"), P("graph"), P("graph")),
                   check_vma=False)
    ws, wr, wm = jax.jit(fn)(jnp.asarray(wp_parts), batch["node_mask"],
                             batch["sg"], batch["rl"])
    ws, wr, wm = map(np.asarray, (ws, wr, wm))
    n = wp_frame.shape[0]
    gids = _global_ids(pt, n)
    inv = np.full(pt.num_parts * pt.part_nodes, -1, np.int64)
    inv[gids] = np.arange(n)
    edges = set()
    n_p = pt.part_nodes
    for p in range(pt.num_parts):
        k = int(wm[p].sum())
        so = inv[ws[p, :k]]
        ro = inv[p * n_p + wr[p, :k]]
        assert (so >= 0).all() and (ro >= 0).all()
        edges.update(zip(so.tolist(), ro.tolist()))
    return edges


def test_world_edges_sharded_match_single(setup):
    ds, prep, pt, wp, cfg, opt, state, mesh, (pos, nt, s, r) = setup
    frame = wp[3]
    n = frame.shape[0]
    ss, rr, mm = build_world_edges(
        jnp.asarray(frame), jnp.ones((n,), bool), cfg.world_radius, 1024,
        exclude_senders=jnp.asarray(s), exclude_receivers=jnp.asarray(r))
    ss, rr, mm = map(np.asarray, (ss, rr, mm))
    single = set(zip(ss[mm].tolist(), rr[mm].tolist()))
    assert 0 < len(single) < 1024  # non-empty, no capacity overflow
    sharded = _sharded_world_union(pt, mesh, frame, cfg.world_radius, 256)
    assert sharded == single


def test_sharded_cloth_trainer_matches_single_device(setup):
    ds, prep, pt, wp, cfg, opt, state, mesh, _ = setup
    rng = np.random.default_rng(0)
    perms = [jnp.asarray(1 + rng.permutation(wp.shape[0] - 2), jnp.int32)
             for _ in range(2)]

    single = jax.jit(make_cloth_trainer(cfg, opt))
    st_s = state
    losses_s = []
    for i, perm in enumerate(perms):
        st_s, ls = single(st_s, prep.template, prep.fields["world_pos"],
                          prep.times, perm, jax.random.PRNGKey(i))
        losses_s.append(np.asarray(ls))

    sharded = make_sharded_cloth_trainer(mesh, cfg, opt,
                                         world_capacity_part=256)
    batch = cloth_static_batch(pt)
    wp_parts = jnp.asarray(partition_field_stack(pt, wp))
    st_p = state
    losses_p = []
    for i, perm in enumerate(perms):
        st_p, ls = sharded(st_p, batch, wp_parts, jnp.asarray(prep.times),
                           perm, jax.random.PRNGKey(i))
        losses_p.append(np.asarray(ls))

    np.testing.assert_allclose(np.concatenate(losses_p),
                               np.concatenate(losses_s),
                               rtol=2e-3, atol=1e-6)
    # params agree after 2 windows of updates (f32, zero noise)
    flat_s = jax.tree.leaves(st_s.params)
    flat_p = jax.tree.leaves(st_p.params)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-5)
    # normalizer statistics crossed the mesh correctly
    np.testing.assert_allclose(
        float(st_p.norm.output["acceleration"].num_accumulations),
        float(st_s.norm.output["acceleration"].num_accumulations), rtol=1e-6)


def test_sharded_cloth_rollout_matches_single_device(setup):
    ds, prep, pt, wp, cfg, opt, state, mesh, _ = setup
    # a couple of training windows so the normalizers are non-trivial
    rng = np.random.default_rng(1)
    single = jax.jit(make_cloth_trainer(cfg, opt))
    st = state
    for i in range(2):
        perm = jnp.asarray(1 + rng.permutation(wp.shape[0] - 2), jnp.int32)
        st, _ = single(st, prep.template, prep.fields["world_pos"],
                       prep.times, perm, jax.random.PRNGKey(10 + i))

    pred_s = np.asarray(jax.jit(make_cloth_rollout(cfg))(
        st.params, st.norm, prep.template, prep.fields["world_pos"],
        prep.times))

    rollout = make_sharded_cloth_rollout(mesh, cfg, world_capacity_part=256)
    batch = cloth_static_batch(pt)
    wp_parts = jnp.asarray(partition_field_stack(pt, wp))
    pred_p = rollout(st.params, st.norm, batch, wp_parts,
                     jnp.asarray(prep.times))
    n = wp.shape[1]
    pred_p = unpermute_field_stack(pt, np.asarray(pred_p), n)

    np.testing.assert_allclose(pred_p, pred_s[:, :n], rtol=1e-3, atol=2e-4)
    assert np.isfinite(pred_p).all()
