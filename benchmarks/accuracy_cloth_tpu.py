"""Cloth (FlagSimple-class) convergence run on the real chip (round 5).

Round-5 changes vs the r04 artifact:

* goes through the UNIFIED entry points ``train_network`` / ``eval_network``
  (api_cloth.py dispatch on the meta.json ``world_edges`` key) — the same
  orchestration every family uses, with the in-training validation sweep and
  best-valid checkpoint stream (round-5 verdict missing items 1-3);
* the dataset is actually diverse: 64 trajectories with per-trajectory
  random phase and amplitude at FIXED frequency (still exactly Markovian —
  acc = -(2 pi f)^2 * displacement; round 4 unknowingly trained on 8
  byte-identical trajectories, the root cause of its marginal full-horizon
  number — see data/synthetic.make_flag_trajectory);
* 200k steps by default (round-5 verdict weak item 3 asks >=3x persistence
  at the full h~197 horizon).

Resumable: dataset write is idempotent, train_network resumes from the
latest checkpoint.  Artifact: benchmarks/results/ACCURACY_cloth_r05.json
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

WORK = os.environ.get("MGN_CLOTH_ACC_WORK", "/tmp/mgn_acc_cloth_r05")
NX = int(os.environ.get("MGN_CLOTH_ACC_NX", 50))
NY = int(os.environ.get("MGN_CLOTH_ACC_NY", 32))
TL = int(os.environ.get("MGN_CLOTH_ACC_TL", 200))
STEPS = int(os.environ.get("MGN_CLOTH_ACC_STEPS", 200_000))
NOISE = float(os.environ.get("MGN_CLOTH_ACC_NOISE", 0.003))
CKPT = int(os.environ.get("MGN_CLOTH_ACC_CKPT", 20_000))
N_TRAIN = int(os.environ.get("MGN_CLOTH_ACC_NTRAIN", 64))
N_TEST = 2
FREQ = 2.7
DT = 0.02
HORIZONS = tuple(dict.fromkeys(
    h for h in (30, 60, 120, TL - 3) if 0 < h < TL - 1))
RESULT = os.path.join(HERE, "results",
                      os.environ.get("MGN_CLOTH_ACC_RESULT",
                                     "ACCURACY_cloth_r05.json"))
TRAIN_LOG = os.path.join(WORK, "train_metrics.jsonl")

HYPERS = dict(mps=15, layer_size=128, hidden_layers=2, norm_steps=1000,
              types_updated=(0,), types_noisy=(0,), compute_dtype="bfloat16")


def parse_train_log():
    curves, valid, sessions = [], [], []
    cur, last_t = None, None
    if not os.path.exists(TRAIN_LOG):
        return curves, valid, sessions
    with open(TRAIN_LOG) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("kind") == "train":
                t, step = rec["t"], rec["step"]
                if last_t is None or t < last_t:
                    if cur is not None:
                        sessions.append(cur)
                    cur = [t, t, step, step]
                cur[1], cur[3] = t, step
                last_t = t
                curves.append((step, rec["loss"]))
            elif rec.get("kind") == "valid":
                valid.append((rec["step"], rec["loss"]))
    if cur is not None:
        sessions.append(cur)
    return curves, valid, sessions


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from mgn_tpu import eval_network, train_network
    from mgn_tpu.data.synthetic import write_flag_dataset
    from mgn_tpu.rollout.evaluate import rollout_error_report
    from mgn_tpu.utils.metrics import MetricsLogger

    ds_path = os.path.join(WORK, "ds")
    cp_path = os.path.join(WORK, "cp")
    out_path = os.path.join(WORK, "out")
    if not os.path.isfile(os.path.join(ds_path, "meta.json")):
        # fixed freq (Markovian), per-trajectory random amp + phase
        write_flag_dataset(ds_path, nx=NX, ny=NY, tl=TL, n_train=N_TRAIN,
                           n_valid=2, n_test=N_TEST, dt=DT, freq=FREQ)
    log = MetricsLogger(path=TRAIN_LOG)
    t0 = time.time()
    state, min_valid = train_network(
        NOISE, optax.adam(1e-4), ds_path, cp_path, metrics=log,
        steps=STEPS, checkpoint=CKPT, num_rollouts=N_TEST, **HYPERS)
    wall = time.time() - t0
    print(f"TRAIN done: step={int(state.step)} wall={wall:.1f}s "
          f"min_valid={min_valid:.3e}", flush=True)

    reports = eval_network(ds_path, cp_path, out_path, mse_steps=HORIZONS,
                           num_rollouts=N_TEST, metrics=log, **HYPERS)

    # persistence baseline: hold frame 1 (the rollout's first free frame)
    persist = []
    with h5py.File(os.path.join(ds_path, "test.h5"), "r") as f:
        for i in sorted(f.keys(), key=int)[:N_TEST]:
            wp = np.asarray(f[i]["world_pos"])
            hold = np.repeat(wp[1:2], wp.shape[0], axis=0)
            persist.append(rollout_error_report(hold, wp, wp.shape[1],
                                                HORIZONS))

    curves, valid_curve, sessions = parse_train_log()
    stride = max(1, len(curves) // 300)
    sess = [{"wall_s": round(s[1] - s[0], 1), "steps": s[3] - s[2],
             "steps_per_s": round((s[3] - s[2]) / max(s[1] - s[0], 1e-9), 1)}
            for s in sessions]
    total_steps = sum(s["steps"] for s in sess)
    total_wall = sum(s["wall_s"] for s in sess)

    per_h = {}
    for h in HORIZONS:
        m = float(np.mean([r["horizons"][h]["cum_rmse"] for r in reports
                           if h in r["horizons"]]))
        p = float(np.mean([r["horizons"][h]["cum_rmse"] for r in persist
                           if h in r["horizons"]]))
        per_h[str(h)] = {"model_cum_rmse": m, "persistence_cum_rmse": p,
                         "improvement_x": round(p / max(m, 1e-12), 1)}
    result = {
        "workload": (f"synthetic waving flag {NX}x{NY} ({NX*NY} nodes), "
                     f"fixed freq {FREQ}, random amp+phase per trajectory, "
                     f"tl={TL}, dt={DT}, {N_TRAIN} train / 2 valid / "
                     f"{N_TEST} test, world edges radius 0.05"),
        "config": dict(HYPERS, noise=NOISE, steps=STEPS, checkpoint=CKPT,
                       lr=1e-4, entry="train_network/eval_network (unified)"),
        "train": {"final_step": int(state.step),
                  "min_valid_loss": float(min_valid),
                  "sessions": sess,
                  "sustained_steps_per_s": round(
                      total_steps / max(total_wall, 1e-9), 1),
                  "loss_curve": [[int(s), float(l)]
                                 for s, l in curves[::stride]],
                  "valid_curve": [[int(s), float(l)]
                                  for s, l in valid_curve]},
        "eval": {"per_horizon": per_h,
                 "final_rmse_model": float(np.mean(
                     [r["final_rmse"] for r in reports])),
                 "final_rmse_persistence": float(np.mean(
                     [r["final_rmse"] for r in persist])),
                 "rollout_steps_per_s": float(np.mean(
                     [r["steps_per_second"] for r in reports]))},
    }
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    print("ACCURACY_CLOTH", json.dumps(per_h), flush=True)


if __name__ == "__main__":
    main()
