"""Full-scale TPU regression + kernel-backend matrix (machine-readable).

Records into benchmarks/results/BENCH_matrix_r{NN}.json:

- forward edges/s for every aggregation backend x dtype (kernel matrix —
  justifies the auto-selection in ops/segment.py with recorded data),
- end-to-end derivative-training optimizer steps/s on the full-size
  synthetic cylinder (flagship config),
- rollout steps/s (full-trajectory Euler) and the rollout RMSE regression
  anchor after a short fixed training budget.

Run detached: nohup timeout 1100 python benchmarks/matrix_tpu.py &
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

ROUND = os.environ.get("MGN_BENCH_ROUND", "r03")
DS = os.environ.get("MGN_BENCH_DS", "/tmp/mgn_fullscale_ds")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from mgn_tpu import eval_network, train_network
    from mgn_tpu.core.graph import MeshGraph, build_template
    from mgn_tpu.data.synthetic import (make_channel_mesh, make_trajectory,
                                        write_synthetic_dataset)
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn
    from mgn_tpu.utils.metrics import MetricsLogger

    backend = jax.default_backend()
    results = {"backend": backend, "round": ROUND}

    # ---- forward kernel matrix ---------------------------------------------
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    n = len(pos)
    extent = pos.max(0) - pos.min(0)
    axes_ = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes_)))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    pos_o, nt_o, cells_o = pos[order], node_type[order], inv[cells].astype(np.int32)
    template = build_template(pos_o, nt_o, cells=cells_o)
    e_real = int(np.asarray(template.edge_mask).sum())
    results["mesh"] = {"nodes": n, "edges": e_real,
                      "n_pad": template.num_nodes, "e_pad": template.num_edges}

    vel = make_trajectory(pos_o, nt_o, tl=1, dt=0.01, seed=0)[0]
    nf = np.zeros((template.num_nodes, 9), np.float32)
    nf[:n, :2] = vel
    nf[:, 2:] = np.asarray(template.node_type_onehot)
    graph = MeshGraph(node_features=jnp.asarray(nf),
                      edge_features=template.mesh_edge_features,
                      senders=template.senders, receivers=template.receivers,
                      node_mask=template.node_mask, edge_mask=template.edge_mask)
    iters = 50 if backend == "tpu" else 2
    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=15)

    def fwd_time(cfg, **kw):
        params = init_mgn(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def loop(g):
            def body(_, g):
                out = apply_mgn(params, g, cfg, **kw)
                return g.replace(node_features=g.node_features.at[:, 0].add(
                    0.0 * out[:, 0]))

            return jax.lax.fori_loop(0, iters, body, g)

        # device_get (not block_until_ready) — the remote-tunnel future can
        # resolve before execution finishes; min-of-5 guards the additive
        # fetch jitter (see spmd_tpu.timed)
        jax.device_get(loop(graph).node_features)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(loop(graph).node_features)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    matrix = {}
    cases = [
        ("xla_f32", dict(compute_dtype=jnp.float32, aggregation_backend="xla"),
         dict()),
        ("xla_bf16", dict(compute_dtype=jnp.bfloat16, aggregation_backend="xla"),
         dict()),
        ("banded_bf16", dict(compute_dtype=jnp.bfloat16,
                             aggregation_backend="banded", unroll=True),
         dict(row_offsets=template.row_offsets)),
        ("pallas_bf16", dict(compute_dtype=jnp.bfloat16,
                             aggregation_backend="pallas"),
         dict(row_offsets=template.row_offsets)),
        ("fused_bf16", dict(compute_dtype=jnp.bfloat16, fused=True),
         dict(fused_plan=template.fused_plan)),
        ("fused_f32", dict(compute_dtype=jnp.float32, fused=True),
         dict(fused_plan=template.fused_plan)),
    ]
    for name, over, kw in cases:
        if "fused" in name and template.fused_plan is None:
            continue
        if "pallas" in name and backend != "tpu":
            continue
        try:
            dt = fwd_time(MGNConfig(**base, **over), **kw)
            matrix[name] = {"ms_per_fwd": round(dt * 1e3, 4),
                            "edges_per_sec": round(e_real * 15 / dt, 1)}
            print(f"{name}: {matrix[name]}", flush=True)
        except Exception as ex:  # record failures instead of dying
            matrix[name] = {"error": str(ex)[:300]}
            print(f"{name}: FAILED {ex}", flush=True)
    results["forward_matrix"] = matrix

    # ---- full-scale train + eval -------------------------------------------
    if not os.path.isfile(os.path.join(DS, "meta.json")):
        print("writing full-scale synthetic dataset...", flush=True)
        write_synthetic_dataset(DS, num_nodes=1900, tl=120, n_train=4,
                                n_valid=1, n_test=1)
    steps = 1200 if backend == "tpu" else 30
    cp = os.path.join(DS, f"cp_{ROUND}")
    t0 = time.time()
    state, min_valid = train_network(
        0.02, optax.adam(1e-4), DS, cp,
        mps=15, layer_size=128, hidden_layers=2,
        compute_dtype="bfloat16" if backend == "tpu" else "float32",
        spatial_reorder=True, fused=(backend == "tpu"),
        fused_backward=(backend == "tpu"),
        steps=steps, checkpoint=steps // 2, norm_steps=100,
        solver_valid="euler", seed=0, metrics=MetricsLogger(quiet=True))
    train_wall = time.time() - t0
    results["train"] = {
        "steps": int(state.step),
        "wall_seconds_incl_compile": round(train_wall, 2),
        "steps_per_sec": round(int(state.step) / train_wall, 2),
        "min_valid_loss": float(min_valid),
        "config": "mps=15 latent=128 bf16 fused fwd+bwd kernels spatial_reorder",
        # device-level step rate, measured separately (jitted window, warm):
        # banded+unroll 179 steps/s; fused fwd + XLA bwd 103; fused fwd+bwd
        # kernels 451 steps/s (2.22 ms/optimizer step)
    }
    print(f"train: {results['train']}", flush=True)

    reports = eval_network(
        DS, cp, os.path.join(DS, f"out_{ROUND}"), solver="euler",
        mps=15, layer_size=128, hidden_layers=2,
        compute_dtype="bfloat16" if backend == "tpu" else "float32",
        spatial_reorder=True, fused=(backend == "tpu"),
        num_rollouts=1, mse_steps=(10, 50, 100), seed=0,
        metrics=MetricsLogger(quiet=True))
    r = reports[0]
    results["rollout"] = {
        "final_rmse": float(r["final_rmse"]),
        "horizons": {str(k): v for k, v in r["horizons"].items()},
    }

    # dedicated rollout throughput (best-of-3; the eval report's one-shot
    # number is subject to tunnel-latency noise)
    from mgn_tpu.api import build_model_config
    from mgn_tpu.config import Args
    from mgn_tpu.core import normalizers as Nz
    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.rollout.evaluate import make_rollout_fn
    from mgn_tpu.train.common import NormState

    ds = load_dataset(DS, is_training=True)
    for fused in ((True, False) if backend == "tpu" else (False,)):
        args = Args(mps=15, layer_size=128, hidden_layers=2,
                    compute_dtype="bfloat16" if backend == "tpu" else "float32",
                    fused=fused, unroll=not fused, spatial_reorder=True)
        cfg, spec2 = build_model_config(ds.meta, args)
        prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec2,
                                  spatial_reorder=True)
        params = init_mgn(jax.random.PRNGKey(0), cfg)
        _, e_nm, n_nm, o_nm = Nz.normalizers_from_meta(ds.meta, 1e6)
        norm = NormState(edge=e_nm, node=n_nm, output=o_nm)
        fn = jax.jit(make_rollout_fn(cfg, spec2, solver="euler"))
        jax.device_get(fn(params, norm, prep.template, prep.fields,
                          prep.times))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(fn(params, norm, prep.template, prep.fields,
                              prep.times))
            best = min(best, time.perf_counter() - t0)
        key = "steps_per_sec_fused" if fused else "steps_per_sec_unfused"
        results["rollout"][key] = round((prep.times.shape[0] - 1) / best, 1)
    print(f"rollout: {results['rollout']}", flush=True)

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    # fold in sibling per-family artifacts recorded this round, if present
    for key, fname in (("cloth", f"CLOTH_{ROUND}.json"),
                       ("spmd", f"SPMD_{ROUND}.json")):
        p = os.path.join(out_dir, fname)
        if os.path.isfile(p):
            with open(p) as f:
                results[key] = json.load(f)
    out_path = os.path.join(out_dir, f"BENCH_matrix_{ROUND}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
