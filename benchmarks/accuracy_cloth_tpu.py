"""Cloth (FlagSimple-class) convergence run on the real chip (round 4).

Completes the per-family convergence evidence (cylinder ACCURACY_r04, 10k
class ACCURACY_big, NeuralODE ACCURACY_solver): trains the multi-edge-set
cloth model (world edges rebuilt per step, second-order targets,
native-backward fused path via ``jit_cloth_trainer``) on a synthetic waving
flag with FIXED wave frequency (the field is then exactly harmonic —
acc = -(2 pi f)^2 displacement — so the dynamics are Markovian in
(position, velocity); see data/synthetic.make_flag_trajectory), then rolls
out and compares world-position RMSE against a hold-last-frame persistence
baseline.

Artifact: benchmarks/results/ACCURACY_cloth_r04.json
"""

import json
import os
import sys
import time

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORK = os.environ.get("MGN_CLOTH_ACC_WORK", "/tmp/mgn_acc_cloth_r04")
NX = int(os.environ.get("MGN_CLOTH_ACC_NX", 50))
NY = int(os.environ.get("MGN_CLOTH_ACC_NY", 32))
TL = int(os.environ.get("MGN_CLOTH_ACC_TL", 200))
STEPS = int(os.environ.get("MGN_CLOTH_ACC_STEPS", 40_000))
WINDOW = 32
HORIZONS = tuple(dict.fromkeys(
    h for h in (30, 60, 120, TL - 3) if 0 < h < TL - 1))
N_TRAIN, N_TEST = 8, 2
DT = 0.02
RESULT = os.path.join(HERE, "results", "ACCURACY_cloth_r04.json")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    import optax

    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import write_flag_dataset
    from mgn_tpu.models.mgn_multi import init_mgn_multi
    from mgn_tpu.rollout.evaluate import rollout_error_report
    from mgn_tpu.train.cloth import (ClothConfig, cloth_model_config,
                                     jit_cloth_rollout, jit_cloth_trainer,
                                     make_cloth_norm_state)
    from mgn_tpu.train.common import FieldSpec, TrainState

    on_tpu = jax.default_backend() == "tpu"
    ds_path = os.path.join(WORK, "ds")
    if not os.path.isfile(os.path.join(ds_path, "meta.json")):
        write_flag_dataset(ds_path, nx=NX, ny=NY, tl=TL, n_train=N_TRAIN,
                           n_valid=1, n_test=N_TEST, dt=DT,
                           amp=0.15, freq=2.7)
    ds = load_dataset(ds_path, is_training=True)
    spec = FieldSpec.from_meta(ds.meta)
    cc = ClothConfig(
        model=cloth_model_config(
            ds.meta, latent=128, hidden_layers=2, mps=15,
            compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            fused=on_tpu, fused_backward=on_tpu),
        world_radius=0.05, world_capacity=2048, noise_stddev=0.003,
        norm_steps=1000)
    opt = optax.adam(1e-4)
    trainer = jit_cloth_trainer(cc, opt)
    params = init_mgn_multi(jax.random.PRNGKey(0), cc.model)
    st = TrainState(params=params, opt_state=opt.init(params),
                    norm=make_cloth_norm_state(cc),
                    step=jnp.zeros((), jnp.int32))

    preps = [prepare_trajectory(ds.trajectory(i), ds.meta, spec,
                                spatial_reorder=True)
             for i in range(N_TRAIN)]
    rng = np.random.default_rng(0)
    t0 = time.time()
    curve = []
    while int(st.step) < STEPS:
        prep = preps[int(st.step) // WINDOW % N_TRAIN]
        perm = jnp.asarray(
            1 + rng.permutation(TL - 2)[:WINDOW], jnp.int32)
        st, losses = trainer(st, prep.template, prep.fields["world_pos"],
                             prep.times, perm, jax.random.PRNGKey(
                                 rng.integers(2**31)))
        if (int(st.step) // WINDOW) % 50 == 0:
            l = float(np.asarray(losses).mean())
            curve.append([int(st.step), l])
            print(json.dumps({"step": int(st.step), "loss": l}), flush=True)
    wall = time.time() - t0
    sps = int(st.step) / wall
    print(f"TRAIN done: {int(st.step)} steps, {wall:.1f}s, "
          f"{sps:.1f} steps/s", flush=True)

    # rollout on the test split vs persistence (hold frame 1)
    rollout = jit_cloth_rollout(cc)
    ds_t = load_dataset(ds_path, is_training=False)
    reports, persist = [], []
    for i in range(N_TEST):
        prep = prepare_trajectory(ds_t.trajectory(i), ds_t.meta, spec,
                                  spatial_reorder=True)
        gt_p = np.asarray(prep.fields["world_pos"])  # padded (T, N_pad, 3)
        pred = np.asarray(rollout(st.params, st.norm, prep.template,
                                  jnp.asarray(gt_p), prep.times))
        nreal = prep.num_nodes
        pred_u = prep.unpermute(pred)
        gt_u = prep.unpermute(gt_p)
        reports.append(rollout_error_report(pred_u, gt_u, nreal, HORIZONS))
        hold = np.repeat(gt_u[1:2], gt_u.shape[0], axis=0)
        persist.append(rollout_error_report(hold, gt_u, nreal, HORIZONS))

    per_h = {}
    for h in HORIZONS:
        m = float(np.mean([r["horizons"][h]["cum_rmse"] for r in reports]))
        p = float(np.mean([r["horizons"][h]["cum_rmse"] for r in persist]))
        per_h[str(h)] = {"model_cum_rmse": m, "persistence_cum_rmse": p,
                         "improvement_x": round(p / max(m, 1e-12), 1)}
    result = {
        "workload": (f"synthetic waving flag {NX}x{NY} ({NX*NY} nodes), "
                     f"fixed amp 0.15 / freq 2.7, tl={TL}, dt={DT}, "
                     f"{N_TRAIN} train / {N_TEST} test, world edges "
                     f"radius 0.05 cap 2048"),
        "config": {"mps": 15, "latent": 128, "noise": 0.003,
                   "steps": STEPS, "fused_native_bwd": on_tpu},
        "train": {"steps": int(st.step), "wall_s": round(wall, 1),
                  "sustained_steps_per_s": round(sps, 1),
                  "loss_curve": curve},
        "eval": {"per_horizon": per_h,
                 "final_rmse_model": float(np.mean(
                     [r["final_rmse"] for r in reports])),
                 "final_rmse_persistence": float(np.mean(
                     [r["final_rmse"] for r in persist]))},
    }
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    print("ACCURACY_CLOTH", json.dumps(per_h), flush=True)


if __name__ == "__main__":
    main()
