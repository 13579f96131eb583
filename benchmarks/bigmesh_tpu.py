"""Big-mesh benchmark (real TPU): banded vs fused across mesh sizes.

Covers the residency regimes of the fused kernels under the 56 MB VMEM
planning budget (ops/fused._VMEM_BUDGET):

- 10k nodes / ~59k edges: forward fully VMEM-resident (was edge-streaming
  under the old 15 MB budget); backward residuals stream from HBM.
- 20k nodes / ~122k edges: forward edge-streaming (the (E, L) carry no
  longer fits); previously fell back to banded entirely.

For each size: forward ms + M edges/s (banded / fused-auto / fused with the
edge-streaming kernel pinned, as the resident-vs-stream A/B), and a full
training step (fwd+bwd+Adam) fused vs banded.

Run detached (erratic tunnel): nohup timeout 1500 python benchmarks/bigmesh_tpu.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    import mgn_tpu.ops.fused as F
    from mgn_tpu.core.graph import MeshGraph, build_template
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn

    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=15,
                compute_dtype=jnp.bfloat16)

    def run_size(num_nodes):
        pos, cells, node_type = make_channel_mesh(num_nodes, seed=0)
        n = len(pos)
        extent = pos.max(0) - pos.min(0)
        axes = np.argsort(-extent)
        order = np.lexsort(tuple(pos[:, a] for a in reversed(axes)))
        inv = np.empty(n, np.int64); inv[order] = np.arange(n)
        pos, node_type = pos[order], node_type[order]
        cells = inv[cells].astype(np.int32)
        template = build_template(pos, node_type, cells=cells)
        e_real = int(np.asarray(template.edge_mask).sum())
        n_pad, e_pad = template.num_nodes, template.num_edges
        print(f"--- {num_nodes}: n_pad={n_pad} e_pad={e_pad} e_real={e_real} "
              f"plan={'yes' if template.fused_plan is not None else 'NO'}",
              flush=True)
        if template.fused_plan is None:
            return
        p = template.fused_plan
        print(f"chunk={p.chunk} band_s={p.band_s} band_r={p.band_r} "
              f"fits_fwd={F.fused_fits(n_pad, e_pad, 128, jnp.bfloat16)} "
              f"fits_bwd={F.fused_fits(n_pad, e_pad, 128, jnp.bfloat16, kernel_bwd=True)}",
              flush=True)

        vel = make_trajectory(pos, node_type, tl=1, dt=0.01, seed=0)[0]
        nf = np.zeros((n_pad, 9), np.float32)
        nf[:n, :2] = vel
        nf[:, 2:] = np.asarray(template.node_type_onehot)
        graph = MeshGraph(node_features=jnp.asarray(nf),
                          edge_features=template.mesh_edge_features,
                          senders=template.senders,
                          receivers=template.receivers,
                          node_mask=template.node_mask,
                          edge_mask=template.edge_mask)
        params = init_mgn(jax.random.PRNGKey(0), MGNConfig(**base))
        iters = 100

        out_ref = None

        def bench_fwd(name, cfg, **kw):
            nonlocal out_ref
            out = np.asarray(jax.jit(
                lambda g: apply_mgn(params, g, cfg, **kw))(graph))
            if out_ref is None:
                out_ref = out
            else:
                d = np.abs(out[:n] - out_ref[:n])
                print(f"{name}: max|out-ref|={d.max():.5f} "
                      f"rms={np.sqrt((d**2).mean()):.6f}", flush=True)

            @jax.jit
            def loop(graph):
                def body(_, g):
                    o = apply_mgn(params, g, cfg, **kw)
                    nf = g.node_features.at[:, 0].add(0.0 * o[:, 0])
                    return g.replace(node_features=nf)
                return jax.lax.fori_loop(0, iters, body, graph)

            t0 = time.perf_counter()
            loop(graph).node_features.block_until_ready()
            print(f"{name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                loop(graph).node_features.block_until_ready()
                best = min(best, (time.perf_counter() - t0) / iters)
            print(f"{name}: {best*1e3:.3f} ms/fwd "
                  f"{e_real*15/best/1e6:.1f} M edges/s", flush=True)

        def bench_train(name, cfg, **kw):
            opt = optax.adam(1e-4)
            opt_state = opt.init(params)
            tgt = jnp.asarray(
                np.random.default_rng(0).normal(size=(n_pad, 2)), jnp.float32)

            def loss_fn(p, g):
                out = apply_mgn(p, g, cfg, **kw)
                return jnp.mean((out - tgt) ** 2)

            @jax.jit
            def step_loop(p, opt_state, g):
                def body(_, carry):
                    p, s = carry
                    grads = jax.grad(loss_fn)(p, g)
                    upd, s = opt.update(grads, s, p)
                    return (optax.apply_updates(p, upd), s)
                return jax.lax.fori_loop(0, 50, body, (p, opt_state))

            t0 = time.perf_counter()
            jax.block_until_ready(step_loop(params, opt_state, graph))
            print(f"{name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(step_loop(params, opt_state, graph))
                best = min(best, (time.perf_counter() - t0) / 50)
            print(f"{name}: {best*1e3:.3f} ms/step {1/best:.1f} steps/s",
                  flush=True)

        bench_fwd("banded", MGNConfig(**base, gather_backend="banded",
                                      unroll=True),
                  row_offsets=template.row_offsets)
        bench_fwd("fused-auto", MGNConfig(**base, fused=True),
                  fused_plan=template.fused_plan)
        if os.environ.get("MGN_BIGMESH_UNROLL_AB"):
            # A/B the rolled chunk loop (shipped default past
            # _UNROLL_CHUNKS_MAX chunks) against a fully unrolled trace
            # (compile is slow at this size — that is the point of the cap)
            saved_cap = F._UNROLL_CHUNKS_MAX
            F._UNROLL_CHUNKS_MAX = 1 << 30
            F._make_fused.cache_clear()
            try:
                bench_fwd("fused-unrolled(pinned)",
                          MGNConfig(**base, fused=True),
                          fused_plan=template.fused_plan)
            finally:
                F._UNROLL_CHUNKS_MAX = saved_cap
                F._make_fused.cache_clear()
        b = 2  # bf16
        auto_stream_e = (n_pad * 128 * (b + 4) + e_pad * 128 * b
                         + 2 * 2 * 9 * 128 * 128 * 4) > F._VMEM_BUDGET
        if not auto_stream_e:
            F._FORCE_STREAM_EDGES = True
            F._make_fused.cache_clear()
            try:
                bench_fwd("fused-estream(pinned)", MGNConfig(**base, fused=True),
                          fused_plan=template.fused_plan)
            finally:
                F._FORCE_STREAM_EDGES = None
                F._make_fused.cache_clear()
        bench_train("train-banded", MGNConfig(**base, gather_backend="banded",
                                              unroll=True),
                    row_offsets=template.row_offsets)
        if F.fused_fits(n_pad, e_pad, 128, jnp.bfloat16, kernel_bwd=True):
            bench_train("train-fused", MGNConfig(**base, fused=True,
                                                 fused_backward=True),
                        fused_plan=template.fused_plan)

    sizes = tuple(int(s) for s in os.environ.get(
        "MGN_BIGMESH_SIZES", "10000,20000").split(","))
    for num_nodes in sizes:
        run_size(num_nodes)


main()
