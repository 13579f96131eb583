"""Sharded (graph-parallel) cloth training-step cost on TPU at mesh (1,).

Round-4 capability close-out: `parallel/cloth.py` removes the "multi-edge-set
models are single-device-only" limit with an all-gather schedule (per-round
latent all-gather serves both edge sets' sender gathers; world edges built per
shard from an all-gathered position table).  Real multi-chip hardware is not
available here, so — like SPMD_r0{3,4}.json for the mesh-only family — this
records the honest (1,)-mesh cost of the sharded step next to the unsharded
single-device paths on the same chip, plus the host-computed comm-volume
table for P=2/4/8 (bytes per round are P·N_p·L·2 B latents + one position
gather per frame; cloth meshes are small, so the wire cost is ICI noise).

Writes benchmarks/results/CLOTH_SPMD_{ROUND}.json.
Run detached: nohup timeout 1800 python benchmarks/cloth_spmd_tpu.py &
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

ROUND = os.environ.get("MGN_BENCH_ROUND", "r04")
WINDOW = int(os.environ.get("MGN_BENCH_WINDOW", "32"))
NX = int(os.environ.get("MGN_BENCH_NX", "50"))
NY = int(os.environ.get("MGN_BENCH_NY", "32"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import write_flag_dataset
    from mgn_tpu.models.mgn_multi import init_mgn_multi
    from mgn_tpu.parallel.cloth import (cloth_static_batch,
                                        make_sharded_cloth_trainer,
                                        partition_cloth,
                                        partition_field_stack)
    from mgn_tpu.train.cloth import (ClothConfig, cloth_model_config,
                                     jit_cloth_trainer,
                                     make_cloth_norm_state)
    from mgn_tpu.train.common import FieldSpec, TrainState

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    results = {"backend": backend, "round": ROUND, "window": WINDOW}

    ds_path = f"/tmp/mgn_flag_bench_{NX}x{NY}"
    if not os.path.isfile(os.path.join(ds_path, "meta.json")):
        write_flag_dataset(ds_path, nx=NX, ny=NY, tl=WINDOW + 3,
                           n_train=1, n_valid=1, n_test=1)
    ds = load_dataset(ds_path, is_training=True)
    spec = FieldSpec.from_meta(ds.meta)
    opt = optax.adam(1e-4)
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    latent = 128

    def timed(fn, reps=3, samples=4):
        # trusted tunnel timing: chained state, device_get, min over samples
        jax.device_get(fn())
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            last = None
            for _ in range(reps):
                last = fn()
            jax.device_get(last)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # --- unsharded single-device baselines (unfused + fused fast path) -----
    for name, over in (("unsharded_unfused", dict()),
                       ("unsharded_fused",
                        dict(fused=True, fused_backward=True))):
        if over.get("fused") and not on_tpu:
            continue
        mcfg = cloth_model_config(ds.meta, latent=latent, hidden_layers=2,
                                  mps=15, compute_dtype=cdt, **over)
        cfg = ClothConfig(model=mcfg, world_radius=0.05, world_capacity=2048,
                          noise_stddev=0.003, norm_steps=0)
        prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec,
                                  spatial_reorder=True)
        trainer = jit_cloth_trainer(cfg, opt)
        params = init_mgn_multi(jax.random.PRNGKey(0), mcfg)
        st = TrainState(params=params, opt_state=opt.init(params),
                        norm=make_cloth_norm_state(cfg),
                        step=jnp.zeros((), jnp.int32))
        perm = jnp.asarray(1 + np.arange(WINDOW), jnp.int32)
        wp, tj = prep.fields["world_pos"], prep.times

        def run():
            nonlocal st
            st, losses = trainer(st, prep.template, wp, tj, perm,
                                 jax.random.PRNGKey(0))
            return losses

        dt = timed(run) / WINDOW
        results[name] = {"ms_per_step": round(dt * 1e3, 4),
                         "steps_per_sec": round(1 / dt, 1)}
        print(name, results[name], flush=True)

    # --- sharded step at mesh (1,) -----------------------------------------
    traj = ds.trajectory(0)
    s, r = cells_to_edges(np.asarray(traj.cells))
    t_min = int(ds.meta["features"]["node_type"]["data_min"])
    t_max = int(ds.meta["features"]["node_type"]["data_max"])
    mcfg = cloth_model_config(ds.meta, latent=latent, hidden_layers=2,
                              mps=15, compute_dtype=cdt)
    cfg = ClothConfig(model=mcfg, world_radius=0.05, world_capacity=2048,
                      noise_stddev=0.003, norm_steps=0)
    pt = partition_cloth(np.asarray(traj.mesh_pos),
                         np.asarray(traj.node_type).reshape(-1), s, r, 1,
                         type_min=t_min, type_max=t_max)
    mesh = Mesh(np.array(jax.devices()[:1]), ("graph",))
    trainer = make_sharded_cloth_trainer(mesh, cfg, opt, 2048)
    params = init_mgn_multi(jax.random.PRNGKey(0), mcfg)
    st = TrainState(params=params, opt_state=opt.init(params),
                    norm=make_cloth_norm_state(cfg),
                    step=jnp.zeros((), jnp.int32))
    batch = cloth_static_batch(pt)
    wp = jnp.asarray(partition_field_stack(
        pt, np.asarray(traj.fields["world_pos"], np.float32)))
    tj = jnp.asarray(traj.times)
    perm = jnp.asarray(1 + np.arange(WINDOW), jnp.int32)
    results["mesh"] = {"nodes": int(pt.node_mask.sum()),
                       "n_p": pt.part_nodes,
                       "e_p": int(pt.senders_global.shape[1])}

    def run_sharded():
        nonlocal st
        st, losses = trainer(st, batch, wp, tj, perm, jax.random.PRNGKey(0))
        return losses

    dt = timed(run_sharded) / WINDOW
    results["spmd_mesh1"] = {"ms_per_step": round(dt * 1e3, 4),
                             "steps_per_sec": round(1 / dt, 1)}
    print("spmd_mesh1", results["spmd_mesh1"], flush=True)
    if "unsharded_unfused" in results:
        results["spmd_overhead_vs_unfused"] = round(
            results["spmd_mesh1"]["ms_per_step"]
            / results["unsharded_unfused"]["ms_per_step"], 3)

    # --- host-side comm-volume table for P=2/4/8 ---------------------------
    n = int(pt.node_mask.sum())
    comm = {}
    for p in (2, 4, 8):
        n_p = -(-n // p)
        # per-device WIRE traffic of a tiled all-gather is (P-1) shards in,
        # not the P-shard gathered-table size (round-4 advisor finding 2:
        # the old P*N_p numbers were the constant table size)
        lat_wire = (p - 1) * n_p * latent * 2     # bf16 latent all-gather
        pos_wire = (p - 1) * n_p * 3 * 4          # f32 position gather/frame
        comm[f"P{p}"] = {
            "latent_allgather_wire_bytes_per_round_per_device": lat_wire,
            "position_allgather_wire_bytes_per_frame_per_device": pos_wire,
            "gathered_latent_table_bytes": p * n_p * latent * 2,
            "rounds_per_step": mcfg.message_passing_steps,
        }
    results["comm_volume"] = comm

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"CLOTH_SPMD_{ROUND}.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
