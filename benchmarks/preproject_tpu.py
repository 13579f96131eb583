"""TPU A/B: fused forward with vs without first-layer pre-projection.

Pre-projection hoists the vs/vr first-layer weight multiplies out of the
chunk loop (gather commutes with the right-multiply): per round, 2 full
(N,L)@(L,L) matmuls replace 2 per-chunk (chunk,L)@(L,L) partial matmuls —
~16% of round FLOPs on cylinder (docs/performance.md bisection).

Run detached (erratic tunnel): nohup timeout 1100 python benchmarks/preproject_tpu.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import mgn_tpu.ops.fused as F
    from mgn_tpu.core.graph import MeshGraph, build_template
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn

    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    n = len(pos)
    extent = pos.max(0) - pos.min(0)
    axes = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes)))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    pos, node_type, cells = pos[order], node_type[order], inv[cells].astype(np.int32)

    template = build_template(pos, node_type, cells=cells)
    e_real = int(np.asarray(template.edge_mask).sum())
    plan = template.fused_plan
    assert plan is not None
    print(f"n_pad={template.num_nodes} e_pad={template.num_edges} "
          f"band_s={plan.band_s} band_r={plan.band_r}", flush=True)

    compute_dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    vel = make_trajectory(pos, node_type, tl=1, dt=0.01, seed=0)[0]
    nf = np.zeros((template.num_nodes, 9), np.float32)
    nf[:n, :2] = vel
    nf[:, 2:] = np.asarray(template.node_type_onehot)
    graph = MeshGraph(
        node_features=jnp.asarray(nf),
        edge_features=template.mesh_edge_features,
        senders=template.senders,
        receivers=template.receivers,
        node_mask=template.node_mask,
        edge_mask=template.edge_mask,
    )
    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=15,
                compute_dtype=compute_dtype)
    cfg = MGNConfig(**base, fused=True)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    iters = 200 if backend == "tpu" else 3

    ref = None

    def bench(name):
        nonlocal ref
        F._make_fused.cache_clear()

        out = np.asarray(jax.jit(lambda g: apply_mgn(
            params, g, cfg, fused_plan=plan))(graph))
        if ref is None:
            ref = out
        else:
            print(f"{name}: max|out-ref| = {np.abs(out[:n]-ref[:n]).max():.6f}",
                  flush=True)

        @jax.jit
        def loop(graph):
            def body(_, g):
                o = apply_mgn(params, g, cfg, fused_plan=plan)
                nf = g.node_features.at[:, 0].add(0.0 * o[:, 0])
                return g.replace(node_features=nf)

            return jax.lax.fori_loop(0, iters, body, graph)

        t0 = time.perf_counter()
        loop(graph).node_features.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            loop(graph).node_features.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        eps = e_real * cfg.message_passing_steps / best
        print(f"{name}: {best*1e3:.3f} ms/fwd  {eps/1e6:.1f} M edges/s",
              flush=True)

    F._FORCE_PREPROJECT = False
    bench("plain")
    F._FORCE_PREPROJECT = True
    bench("preproject")
    F._FORCE_PREPROJECT = None


if __name__ == "__main__":
    main()
