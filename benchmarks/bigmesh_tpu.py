"""Big-mesh forward benchmark (real TPU): banded vs fused edge-streaming.

10k-node channel mesh — the size class whose (E, L) edge latents do not fit
VMEM, so the fused forward takes the HBM edge-carry streaming kernel
(``ops/fused._make_kernel_stream_e``).  Run ONE jax process at a time;
measured numbers recorded in docs/performance.md.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from mgn_tpu.core.graph import MeshGraph, build_template
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn

    pos, cells, node_type = make_channel_mesh(10000, seed=0)
    n = len(pos)
    extent = pos.max(0) - pos.min(0)
    axes = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes)))
    inv = np.empty(n, np.int64); inv[order] = np.arange(n)
    pos, node_type, cells = pos[order], node_type[order], inv[cells].astype(np.int32)
    template = build_template(pos, node_type, cells=cells)
    e_real = int(np.asarray(template.edge_mask).sum())
    print(f"n_pad={template.num_nodes} e_pad={template.num_edges} e_real={e_real} "
          f"plan={'yes' if template.fused_plan is not None else 'NO'}", flush=True)
    if template.fused_plan is not None:
        p = template.fused_plan
        print(f"chunk={p.chunk} band_s={p.band_s} band_r={p.band_r}", flush=True)

    vel = make_trajectory(pos, node_type, tl=1, dt=0.01, seed=0)[0]
    nf = np.zeros((template.num_nodes, 9), np.float32)
    nf[:n, :2] = vel
    nf[:, 2:] = np.asarray(template.node_type_onehot)
    graph = MeshGraph(node_features=jnp.asarray(nf),
                      edge_features=template.mesh_edge_features,
                      senders=template.senders, receivers=template.receivers,
                      node_mask=template.node_mask, edge_mask=template.edge_mask)
    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=15,
                compute_dtype=jnp.bfloat16)
    params = init_mgn(jax.random.PRNGKey(0), MGNConfig(**base))
    iters = 100

    out_ref = None
    def bench(name, cfg, **kw):
        nonlocal out_ref
        out = np.asarray(jax.jit(lambda g: apply_mgn(params, g, cfg, **kw))(graph))
        if out_ref is None:
            out_ref = out
        else:
            d = np.abs(out[:n] - out_ref[:n])
            print(f"{name}: max|out-ref|={d.max():.5f} rms={np.sqrt((d**2).mean()):.6f}",
                  flush=True)
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
        print(f"{name}: {best*1e3:.3f} ms/fwd {e_real*15/best/1e6:.1f} M edges/s",
              flush=True)

    bench("banded", MGNConfig(**base, gather_backend="banded", unroll=True),
          row_offsets=template.row_offsets)
    bench("fused-streamed", MGNConfig(**base, fused=True),
          fused_plan=template.fused_plan)

main()
