"""Convergence/accuracy run on the real chip (round-4 verdict item 1).

Trains the cylinder-class flagship config (1.9k-node triangulated channel,
15 MP rounds, latent 128, bf16 compute) to convergence on a synthetic
advection field with a FIXED wave speed (so du/dt is a deterministic function
of the state and the field is exactly learnable — see
mgn_tpu/data/synthetic.py:make_trajectory), then evaluates rollout RMSE at
horizons 50/100/300/599 against a persistence baseline.  This is the
end-to-end systems proof (data pipeline x noise x normalizer warmup x
checkpoint cadence x LRU eviction x validation sweeps x rollout) that the
math-level parity tests cannot give, mirroring the reference's de-facto
validation workflow (/root/reference/examples/cylinder_flow/cylinder_flow.jl:53-93
and the horizon report of /root/reference/src/MeshGraphNets.jl:624-629).

Resumable: the dataset write is idempotent and train_network resumes from the
latest checkpoint, so a backlog-runner retry continues rather than restarts.

Artifact: benchmarks/results/ACCURACY_r04.json
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
_STRAT_DEFAULT = os.environ.get("MGN_ACCURACY_STRATEGY", "derivative")
# per-strategy default work dir: a shared dir would make a shooting run
# RESUME from derivative checkpoints and interleave metric logs
WORK = os.environ.get(
    "MGN_ACCURACY_WORK", f"/tmp/mgn_accuracy_r04b_{_STRAT_DEFAULT}")
DS = os.path.join(WORK, "ds")
CP = os.path.join(WORK, "cp")
OUT = os.path.join(WORK, "out")
TRAIN_LOG = os.path.join(WORK, "train_metrics.jsonl")
RESULT = None  # set in main() from RESULT_NAME (defined below)

def _env(name, default):
    return int(os.environ.get(name, default))


NUM_NODES = _env("MGN_ACCURACY_NODES", 1900)
TL = _env("MGN_ACCURACY_TL", 600)
N_TRAIN, N_VALID, N_TEST = _env("MGN_ACCURACY_NTRAIN", 32), 2, 4
DT = 0.01
STEPS = _env("MGN_ACCURACY_STEPS", 200_000)
# incommensurate wave speed: period = 1/(speed*dt) ~ 120.5 frames, so no
# report horizon (50/100/300/599) lands on a multiple of the period — at
# speed 1.0 the field returns exactly to frame 0 every 100 frames and the
# persistence baseline gets a spuriously tiny POINT error at h=100/300
SPEED = float(os.environ.get("MGN_ACCURACY_SPEED", 0.83))
# "advection" (fixed-speed traveling wave, rounds 2-4) or "ns": incompressible
# Navier-Stokes vortex shedding from mgn_tpu/data/ns.py — the nonlinear
# north-star physics (round-5 verdict item 1)
FIELD = os.environ.get("MGN_ACCURACY_FIELD", "advection")
CHECKPOINT_EVERY = _env("MGN_ACCURACY_CKPT", 10_000)
MSE_STEPS = tuple(s for s in (50, 100, 300, 599) if s < TL)
# "derivative" (default) or "shooting": the NeuralODE MultipleShooting
# convergence run (backprop through the solver, windows from ground-truth
# initial conditions — /root/reference/src/strategies.jl:312-383 semantics)
STRATEGY = os.environ.get("MGN_ACCURACY_STRATEGY", "derivative")
RESULT_NAME = os.environ.get("MGN_ACCURACY_RESULT", "ACCURACY_r04.json")

HYPERS = dict(
    mps=15, layer_size=128, hidden_layers=2,
    norm_steps=_env("MGN_ACCURACY_NORMSTEPS", 1000),
    types_updated=(0, 5), types_noisy=(0,),
    compute_dtype="bfloat16", solver_valid="euler",
)


def ensure_dataset():
    if os.path.exists(os.path.join(DS, "meta.json")):
        return
    print("writing dataset ...", flush=True)
    if FIELD == "ns":
        from mgn_tpu.data.ns import write_ns_dataset

        write_ns_dataset(DS, num_nodes=NUM_NODES, tl=TL, n_train=N_TRAIN,
                         n_valid=N_VALID, n_test=N_TEST, dt=DT)
    else:
        from mgn_tpu.data.synthetic import write_synthetic_dataset

        write_synthetic_dataset(DS, num_nodes=NUM_NODES, tl=TL,
                                n_train=N_TRAIN, n_valid=N_VALID,
                                n_test=N_TEST, dt=DT, speed=SPEED)


def persistence_report(mse_steps):
    """Persistence baseline: hold frame 0 for the whole horizon."""
    from mgn_tpu.rollout.evaluate import rollout_error_report

    reports = []
    with h5py.File(os.path.join(DS, "test.h5"), "r") as f:
        for i in sorted(f.keys(), key=int)[:N_TEST]:
            vel = np.asarray(f[i]["velocity"])  # (T, N, 2)
            persist = np.repeat(vel[:1], vel.shape[0], axis=0)
            reports.append(rollout_error_report(persist, vel, vel.shape[1],
                                                mse_steps))
    return reports


def frozen_advection_report(mse_steps):
    """Frozen-advection oracle: translate the frame-0 field downstream at the
    trajectory's mean flow speed (linear interpolation of frame 0 at
    x - s*t*dt, clamped to the domain).  On a pure advection field this
    baseline is near-perfect; on vortex shedding it misses the self-excited
    wake dynamics — beating it is the evidence the model learned *nonlinear*
    physics, not translation (round-5 verdict item 1)."""
    from scipy.interpolate import LinearNDInterpolator

    from mgn_tpu.rollout.evaluate import rollout_error_report

    reports = []
    with h5py.File(os.path.join(DS, "test.h5"), "r") as f:
        for i in sorted(f.keys(), key=int)[:N_TEST]:
            vel = np.asarray(f[i]["velocity"])      # (T, N, 2)
            pos = np.asarray(f[i]["mesh_pos"])      # (N, 2)
            nt = np.asarray(f[i]["node_type"]).ravel()
            fluid = nt == 0
            s = float(vel[0, fluid, 0].mean())      # mean streamwise speed
            itp = LinearNDInterpolator(pos, vel[0], fill_value=0.0)
            T = vel.shape[0]
            pred = np.empty_like(vel)
            for t in range(T):
                q = pos.copy()
                q[:, 0] = np.clip(q[:, 0] - s * t * DT, pos[:, 0].min(),
                                  pos[:, 0].max())
                pred[t] = itp(q)
            pred[:, ~fluid] = vel[:, ~fluid]        # boundary nodes forced
            reports.append(rollout_error_report(pred, vel, vel.shape[1],
                                                mse_steps))
    return reports


def mean_horizons(reports, key):
    out = {}
    for s in MSE_STEPS:
        vals = [r["horizons"][s][key] for r in reports if s in r["horizons"]]
        if vals:
            out[str(s)] = float(np.mean(vals))
    return out


def parse_train_log():
    """Loss/valid curves + per-session sustained steps/s from the JSONL."""
    curves, valid, sessions = [], [], []
    cur = None  # [t_first, t_last, step_first, step_last]
    if not os.path.exists(TRAIN_LOG):
        return curves, valid, sessions
    last_t = None
    with open(TRAIN_LOG) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("kind") == "train":
                t, step = rec["t"], rec["step"]
                if last_t is None or t < last_t:  # new session (t resets)
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
    global RESULT
    RESULT = os.path.join(HERE, "results", RESULT_NAME)
    ensure_dataset()
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from mgn_tpu import (DerivativeTraining, MultipleShooting, eval_network,
                         train_network)
    from mgn_tpu.utils.metrics import MetricsLogger

    if STRATEGY == "shooting":
        # MGN_ACCURACY_SOLVER=tsit5_adaptive selects the differentiable
        # bounded-budget adaptive RK training path (round-5 verdict item 8;
        # the role of /root/reference/src/strategies.jl:247-263)
        strategy = MultipleShooting(
            tstart=0.0, dt=DT, tstop=(TL - 1) * DT,
            interval_size=_env("MGN_ACCURACY_INTERVAL", 25),
            solver=os.environ.get("MGN_ACCURACY_SOLVER", "euler"),
            adaptive_substeps=_env("MGN_ACCURACY_SUBSTEPS", 4))
        noise = 0.0  # solver strategies are noise-free (reference parity)
    else:
        strategy = DerivativeTraining()
        noise = 0.02

    log = MetricsLogger(path=TRAIN_LOG)
    t0 = time.time()
    state, min_valid = train_network(
        noise, optax.adam(1e-4), DS, CP, metrics=log,
        training_strategy=strategy,
        steps=STEPS, checkpoint=CHECKPOINT_EVERY, num_rollouts=N_TEST,
        **HYPERS)
    train_wall = time.time() - t0
    final_step = int(state.step)
    print(f"TRAIN done: step={final_step} wall={train_wall:.1f}s "
          f"min_valid={min_valid:.3e}", flush=True)

    reports = eval_network(DS, CP, OUT, solver="euler", mse_steps=MSE_STEPS,
                           num_rollouts=N_TEST, metrics=log, **HYPERS)
    persist = persistence_report(MSE_STEPS)
    oracle = frozen_advection_report(MSE_STEPS) if FIELD == "ns" else None

    curves, valid_curve, sessions = parse_train_log()
    # downsample the loss curve to <=300 points for the artifact
    stride = max(1, len(curves) // 300)
    # sustained steps/s INCLUDING the data pipeline, per training session
    # (a resumed run has several); overall = total steps / total wall
    sess = [{"wall_s": round(s[1] - s[0], 1), "steps": s[3] - s[2],
             "steps_per_s": round((s[3] - s[2]) / max(s[1] - s[0], 1e-9), 1)}
            for s in sessions]
    total_steps = sum(s["steps"] for s in sess)
    total_wall = sum(s["wall_s"] for s in sess)

    per_horizon = {}
    m_rmse = mean_horizons(reports, "cum_rmse")
    p_rmse = mean_horizons(persist, "cum_rmse")
    m_mse = mean_horizons(reports, "mse")
    p_mse = mean_horizons(persist, "mse")
    o_rmse = mean_horizons(oracle, "cum_rmse") if oracle else {}
    o_mse = mean_horizons(oracle, "mse") if oracle else {}
    for s in m_rmse:
        per_horizon[s] = {
            "model_cum_rmse": m_rmse[s], "persistence_cum_rmse": p_rmse[s],
            "model_point_rmse": float(np.sqrt(m_mse[s])),
            "persistence_point_rmse": float(np.sqrt(p_mse[s])),
            "improvement_x": round(p_rmse[s] / max(m_rmse[s], 1e-12), 1),
        }
        if s in o_rmse:
            per_horizon[s]["oracle_cum_rmse"] = o_rmse[s]
            per_horizon[s]["oracle_point_rmse"] = float(np.sqrt(o_mse[s]))
            per_horizon[s]["improvement_vs_oracle_x"] = round(
                o_rmse[s] / max(m_rmse[s], 1e-12), 1)

    field_desc = ("incompressible NS vortex shedding (projection solver, "
                  "Re~125-180, random phase)" if FIELD == "ns"
                  else f"advection wave (fixed speed {SPEED})")
    result = {
        "workload": (f"synthetic cylinder-class channel, {NUM_NODES} nodes, "
                     f"{field_desc}, tl={TL}, "
                     f"dt={DT}, "
                     f"{N_TRAIN} train / {N_VALID} valid / {N_TEST} test"),
        "config": dict(HYPERS, steps=STEPS, checkpoint=CHECKPOINT_EVERY,
                       noise=noise, lr=1e-4, strategy=STRATEGY, field=FIELD,
                       train_solver=os.environ.get("MGN_ACCURACY_SOLVER",
                                                   "euler")),
        "train": {
            "final_step": final_step,
            "min_valid_loss": float(min_valid),
            "sessions": sess,
            "sustained_steps_per_s": round(total_steps / max(total_wall, 1e-9), 1),
            "loss_curve": [[int(s), float(l)] for s, l in curves[::stride]],
            "valid_curve": [[int(s), float(l)] for s, l in valid_curve],
        },
        "eval": {
            "solver": "euler",
            "num_rollouts": len(reports),
            "per_horizon": per_horizon,
            "final_rmse_model": float(np.mean(
                [r["final_rmse"] for r in reports])),
            "final_rmse_persistence": float(np.mean(
                [r["final_rmse"] for r in persist])),
            "rollout_steps_per_s": float(np.mean(
                [r["steps_per_second"] for r in reports])),
        },
    }
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    print("ACCURACY", json.dumps(result["eval"]["per_horizon"]), flush=True)


if __name__ == "__main__":
    main()
