"""On-chip convergence artifacts for the airfoil and deforming_plate
families (round-5 verdict item 4: two of the five BASELINE workloads had
only CPU smoke tests).

Runs the standard protocol — synthetic dataset at realistic scale, full
``train_network`` orchestration (warmup, checkpoints, validation sweep,
resume), ``eval_network`` per-horizon report + trajectories.h5 — on:

* ``MGN_FAMILY=airfoil``: multi-target head (velocity 2 + density 1),
  1.9k-node channel mesh, fixed-speed advection (Markovian; trajectories
  differ by phase) with the density companion a function of speed;
* ``MGN_FAMILY=plate``: 3-D structured grid (meta ``dims`` list), damped
  relaxation dynamics (Markovian by design — see
  data/synthetic.write_plate_dataset), world_pos derivative targets plus
  the ABSOLUTE stress head, handle nodes (type 3) ground-truth forced via
  ``types_inflow``.

Artifacts: benchmarks/results/ACCURACY_airfoil_r05.json / _plate_r05.json.
Resumable like accuracy_tpu.py.  Reference workloads:
/root/reference/docs/src/training_data.md:45-123 (the families' meta
contract); horizon report semantics /root/reference/src/MeshGraphNets.jl:624-629.
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

FAMILY = os.environ.get("MGN_FAMILY", "airfoil")
WORK = os.environ.get("MGN_FAM_WORK", f"/tmp/mgn_acc_{FAMILY}_r05")
STEPS = int(os.environ.get("MGN_FAM_STEPS", 60_000))
CKPT = int(os.environ.get("MGN_FAM_CKPT", 10_000))
RESULT = os.path.join(HERE, "results",
                      os.environ.get("MGN_FAM_RESULT",
                                     f"ACCURACY_{FAMILY}_r05.json"))
TRAIN_LOG = os.path.join(WORK, "train_metrics.jsonl")

def _env(name, default):
    return int(os.environ.get(name, default))


if FAMILY == "airfoil":
    TL = _env("MGN_FAM_TL", 300)
    N_TRAIN, N_VALID, N_TEST = _env("MGN_FAM_NTRAIN", 32), 2, 4
    MSE_STEPS = tuple(s for s in (50, 100, TL - 1) if s < TL)
    HYPERS = dict(mps=_env("MGN_FAM_MPS", 15),
                  layer_size=_env("MGN_FAM_LATENT", 128), hidden_layers=2,
                  norm_steps=_env("MGN_FAM_NORMSTEPS", 1000),
                  types_updated=(0, 5), types_noisy=(0,),
                  compute_dtype="bfloat16", solver_valid="euler")
    NOISE = (0.02, 0.002)  # per-target (velocity, density)
    TARGETS = ("velocity", "density")
elif FAMILY == "plate":
    TL = _env("MGN_FAM_TL", 100)
    N_TRAIN, N_VALID, N_TEST = _env("MGN_FAM_NTRAIN", 32), 2, 4
    MSE_STEPS = tuple(s for s in (20, 50, TL - 1) if s < TL)
    HYPERS = dict(mps=_env("MGN_FAM_MPS", 15),
                  layer_size=_env("MGN_FAM_LATENT", 128), hidden_layers=2,
                  norm_steps=_env("MGN_FAM_NORMSTEPS", 1000),
                  types_updated=(0, 6), types_noisy=(0,),
                  types_inflow=(3,),  # handle nodes gt-forced during rollout
                  compute_dtype="bfloat16", solver_valid="euler")
    NOISE = (0.003, 0.0)  # per-target (world_pos, stress)
    TARGETS = ("world_pos", "stress")
else:
    raise SystemExit(f"unknown MGN_FAMILY {FAMILY!r}")


def ensure_dataset(ds):
    if os.path.exists(os.path.join(ds, "meta.json")):
        return
    from mgn_tpu.data import synthetic as S

    print("writing dataset ...", flush=True)
    if FAMILY == "airfoil":
        S.write_airfoil_dataset(ds, num_nodes=_env("MGN_FAM_NODES", 1900),
                                tl=TL, n_train=N_TRAIN,
                                n_valid=N_VALID, n_test=N_TEST, speed=0.83)
    else:
        S.write_plate_dataset(ds, dims=(14, 12, 8), tl=TL, n_train=N_TRAIN,
                              n_valid=N_VALID, n_test=N_TEST, dt=0.1,
                              tau=2.0)


def persistence_report(ds, mse_steps):
    from mgn_tpu.rollout.evaluate import rollout_error_report

    reports = []
    with h5py.File(os.path.join(ds, "test.h5"), "r") as f:
        for i in sorted(f.keys(), key=int)[:N_TEST]:
            gt = np.concatenate(
                [np.asarray(f[i][t]).reshape(TL, -1, 1)
                 if np.asarray(f[i][t]).ndim == 2
                 else np.asarray(f[i][t]) for t in TARGETS], -1)
            hold = np.repeat(gt[:1], gt.shape[0], axis=0)
            reports.append(rollout_error_report(hold, gt, gt.shape[1],
                                                mse_steps))
    return reports


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
    from mgn_tpu.utils.metrics import MetricsLogger

    ds, cp, out = (os.path.join(WORK, d) for d in ("ds", "cp", "out"))
    ensure_dataset(ds)
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    log = MetricsLogger(path=TRAIN_LOG)
    t0 = time.time()
    state, min_valid = train_network(
        NOISE, optax.adam(1e-4), ds, cp, metrics=log, steps=STEPS,
        checkpoint=CKPT, num_rollouts=N_TEST, **HYPERS)
    wall = time.time() - t0
    print(f"TRAIN done: step={int(state.step)} wall={wall:.1f}s "
          f"min_valid={min_valid:.3e}", flush=True)

    reports = eval_network(ds, cp, out, solver="euler", mse_steps=MSE_STEPS,
                           num_rollouts=N_TEST, metrics=log, **HYPERS)
    persist = persistence_report(ds, MSE_STEPS)

    curves, valid_curve, sessions = parse_train_log()
    stride = max(1, len(curves) // 300)
    sess = [{"wall_s": round(s[1] - s[0], 1), "steps": s[3] - s[2],
             "steps_per_s": round((s[3] - s[2]) / max(s[1] - s[0], 1e-9), 1)}
            for s in sessions]
    total_steps = sum(s["steps"] for s in sess)
    total_wall = sum(s["wall_s"] for s in sess)

    per_h = {}
    for h in MSE_STEPS:
        m = [r["horizons"][h]["cum_rmse"] for r in reports
             if h in r["horizons"]]
        p = [r["horizons"][h]["cum_rmse"] for r in persist
             if h in r["horizons"]]
        if m and p:
            per_h[str(h)] = {
                "model_cum_rmse": float(np.mean(m)),
                "persistence_cum_rmse": float(np.mean(p)),
                "improvement_x": round(float(np.mean(p))
                                       / max(float(np.mean(m)), 1e-12), 1)}
    result = {
        "workload": (f"{FAMILY} family, tl={TL}, {N_TRAIN} train / "
                     f"{N_VALID} valid / {N_TEST} test "
                     + ("(1900-node mesh, multi-target velocity+density, "
                        "fixed speed 0.83)" if FAMILY == "airfoil" else
                        "(14x12x8 grid, damped relaxation + absolute "
                        "stress head, handle forced)")),
        "config": dict(HYPERS, steps=STEPS, checkpoint=CKPT, noise=NOISE,
                       lr=1e-4),
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
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"ACCURACY_{FAMILY.upper()}", json.dumps(per_h), flush=True)


if __name__ == "__main__":
    main()
