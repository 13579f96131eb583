"""Union-batched TRAINING throughput (real TPU): samples/s vs batchsize.

``batchsize=B`` concatenates B prepared trajectories into one disjoint-union
graph (data/union.py); one optimizer step then consumes B frames.  The fused
kernel's per-op overhead amortizes over the B-times-larger edge set, so
samples/s should rise with B until VMEM residency runs out (the union plan
keeps single-graph bands because per-graph edge buckets are chunk-aligned).

Reports, per B in MGN_UNION_BATCHES (default 1,2,4): fused forward ms +
M edges/s on the union graph, and full training-step (fwd+bwd+Adam)
optimizer steps/s + samples/s.

Run detached: nohup timeout 1500 python benchmarks/unionbatch_tpu.py &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                      os.environ.get("MGN_UNION_RESULT", "UNIONBATCH_r05.json"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from mgn_tpu.core.graph import MeshGraph
    from mgn_tpu.data.meta import load_meta
    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import write_synthetic_dataset
    from mgn_tpu.data.union import union_prepared
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn
    from mgn_tpu.train.common import FieldSpec

    num_nodes = int(os.environ.get("MGN_UNION_NODES", "1900"))
    mps = int(os.environ.get("MGN_UNION_MPS", "15"))
    ds = f"/tmp/mgn_union_ds_{num_nodes}"
    if not os.path.isdir(ds):
        write_synthetic_dataset(ds, num_nodes=num_nodes, tl=8, n_train=4,
                                n_valid=1, n_test=1)
    meta = load_meta(ds)
    data = load_dataset(ds, is_training=True)
    spec = FieldSpec(fields=("velocity",), target_fields=("velocity",),
                     field_dims=(2,), target_dims=(2,))

    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=mps,
                compute_dtype=jnp.bfloat16)
    params = init_mgn(jax.random.PRNGKey(0), MGNConfig(**base))
    iters = 50

    batches = tuple(int(b) for b in os.environ.get(
        "MGN_UNION_BATCHES", "1,2,4").split(","))
    rows = []
    preps_all = [prepare_trajectory(data.trajectory(i), meta, spec,
                                    spatial_reorder=True)
                 for i in range(max(batches))]

    for B in batches:
        template, fields, _, info = union_prepared(preps_all[:B])
        n_pad, e_pad = template.num_nodes, template.num_edges
        e_real = int(np.asarray(template.edge_mask).sum())
        plan = template.fused_plan
        print(f"--- B={B}: n_pad={n_pad} e_pad={e_pad} "
              f"plan={'yes' if plan is not None else 'NO'}"
              + (f" chunk={plan.chunk} bands=({plan.band_s},{plan.band_r})"
                 if plan is not None else ""), flush=True)
        if plan is None:
            continue
        cfg = MGNConfig(**base, fused=True, fused_backward=True)
        nf = jnp.concatenate(
            [fields["velocity"][0], template.node_type_onehot], axis=-1)
        graph = MeshGraph(node_features=nf,
                          edge_features=template.mesh_edge_features,
                          senders=template.senders,
                          receivers=template.receivers,
                          node_mask=template.node_mask,
                          edge_mask=template.edge_mask)

        @jax.jit
        def fwd_loop(graph):
            def body(_, g):
                out = apply_mgn(params, g, cfg, fused_plan=plan)
                return g.replace(node_features=g.node_features.at[:, 0].add(
                    0.0 * out[:, 0]))
            return jax.lax.fori_loop(0, iters, body, graph)

        t0 = time.perf_counter()
        fwd_loop(graph).node_features.block_until_ready()
        print(f"B={B} fwd: compile {time.perf_counter()-t0:.1f}s", flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            fwd_loop(graph).node_features.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"B={B} fwd: {best*1e3:.3f} ms "
              f"{e_real*mps/best/1e6:.1f} M edges/s", flush=True)
        row = {"B": B, "n_pad": int(n_pad), "e_pad": int(e_pad),
               "e_real": int(e_real), "fwd_ms": round(best * 1e3, 3),
               "fwd_medges_per_s": round(e_real * mps / best / 1e6, 1)}

        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        tgt = jnp.asarray(np.random.default_rng(0).normal(
            size=(n_pad, 2)), jnp.float32)

        def loss_fn(p, g):
            return jnp.mean((apply_mgn(p, g, cfg, fused_plan=plan)
                             - tgt) ** 2)

        @jax.jit
        def step_loop(p, s, g):
            def body(_, carry):
                p, s = carry
                grads = jax.grad(loss_fn)(p, g)
                upd, s = opt.update(grads, s, p)
                return (optax.apply_updates(p, upd), s)
            return jax.lax.fori_loop(0, iters, body, (p, s))

        t0 = time.perf_counter()
        jax.block_until_ready(step_loop(params, opt_state, graph))
        print(f"B={B} train: compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(step_loop(params, opt_state, graph))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"B={B} train: {best*1e3:.3f} ms/step {1/best:.1f} steps/s "
              f"{B/best:.1f} samples/s", flush=True)
        row.update(train_ms_per_step=round(best * 1e3, 3),
                   opt_steps_per_s=round(1 / best, 1),
                   samples_per_s=round(B / best, 1))
        rows.append(row)

    if rows:
        base_sps = rows[0]["samples_per_s"]
        result = {
            "workload": f"{num_nodes}-node cylinder-class union batching, "
                        f"mps={mps}, bf16 fused fwd+bwd",
            "rows": rows,
            "samples_per_s_speedup_vs_B1": {
                str(r["B"]): round(r["samples_per_s"] / base_sps, 3)
                for r in rows},
            "note": "batchsize implemented via disjoint-union graphs "
                    "(data/union.py) — the reference's unimplemented flag, "
                    "/root/reference/src/MeshGraphNets.jl:224",
        }
        os.makedirs(os.path.dirname(RESULT), exist_ok=True)
        with open(RESULT, "w") as f:
            json.dump(result, f, indent=1)
        print("UNIONBATCH", json.dumps(result["samples_per_s_speedup_vs_B1"]),
              flush=True)


main()
