"""TPU experiment: fused round kernel vs unfused forward (cylinder size).

Run detached (erratic tunnel): nohup timeout 1100 python benchmarks/fused_tpu.py &
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
    from mgn_tpu.core.graph import MeshGraph, build_template
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn

    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    n = len(pos)

    # spatial sweep order (data.prep spatial_reorder) for narrow bands
    extent = pos.max(0) - pos.min(0)
    axes = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes)))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    pos = pos[order]
    node_type = node_type[order]
    cells = inv[cells].astype(np.int32)

    template = build_template(pos, node_type, cells=cells)
    e_real = int(np.asarray(template.edge_mask).sum())
    plan = template.fused_plan
    print(f"nodes={n} n_pad={template.num_nodes} edges={e_real} "
          f"e_pad={template.num_edges}", flush=True)
    if plan is None:
        print("NO PLAN (bands too wide)", flush=True)
        return
    print(f"plan: band_s={plan.band_s} band_r={plan.band_r} "
          f"chunks={plan.rel_s.shape[0]}", flush=True)

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

    iters = 100 if backend == "tpu" else 3

    def bench(name, cfg, **kw):
        params = init_mgn(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def loop(graph):
            def body(_, g):
                out = apply_mgn(params, g, cfg, **kw)
                nf = g.node_features.at[:, 0].add(0.0 * out[:, 0])
                return g.replace(node_features=nf)

            return jax.lax.fori_loop(0, iters, body, graph)

        t0 = time.perf_counter()
        loop(graph).node_features.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        loop(graph).node_features.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        eps = e_real * cfg.message_passing_steps / dt
        print(f"{name}: {dt*1e3:.3f} ms/fwd  {eps/1e6:.1f} M edges/s",
              flush=True)
        return eps

    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=15,
                compute_dtype=compute_dtype)
    cfg_ref = MGNConfig(**base, unroll=True)
    bench("unfused-unroll", cfg_ref, row_offsets=template.row_offsets)

    from mgn_tpu.ops.fused import build_fused_plan

    params = init_mgn(jax.random.PRNGKey(0), MGNConfig(**base))
    ref_out = np.asarray(jax.jit(lambda g: apply_mgn(
        params, g, cfg_ref, row_offsets=template.row_offsets))(graph))

    s_np = np.asarray(template.senders)
    r_np = np.asarray(template.receivers)
    for chunk in (512, 1024):
        p = build_fused_plan(s_np, r_np, template.num_nodes, chunk=chunk,
                             max_band_s=4096)
        if p is None or p.chunk != chunk:
            print(f"chunk={chunk}: no plan", flush=True)
            continue
        print(f"chunk={chunk}: band_s={p.band_s} band_r={p.band_r}",
              flush=True)
        cfg_f = MGNConfig(**base, fused=True)
        out = np.asarray(jax.jit(lambda g: apply_mgn(
            params, g, cfg_f, fused_plan=p))(graph))
        err = np.abs(out[:n] - ref_out[:n]).max()
        print(f"chunk={chunk}: max|fused-ref| = {err:.5f}", flush=True)
        bench(f"fused-c{chunk}", cfg_f, fused_plan=p)


if __name__ == "__main__":
    main()
