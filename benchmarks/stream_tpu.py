"""TPU validation + timing for the HBM-streaming fused backward.

The streaming path triggers when the per-round residual windows no longer fit
VMEM (ops/fused.residuals_resident): cylinder-size f32 and airfoil-size bf16
both stream naturally.  Checks gradient equivalence against the unfused XLA
path at both sizes and times the training step fused-vs-banded.

Run detached (erratic tunnel): nohup timeout 1100 python benchmarks/stream_tpu.py &
"""

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from mgn_tpu.core.graph import MeshGraph, build_template
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn
    from mgn_tpu.ops.fused import residuals_resident

    backend = jax.default_backend()
    print("backend:", backend, flush=True)

    def build(num_nodes):
        pos, cells, node_type = make_channel_mesh(num_nodes, seed=0)
        n = len(pos)
        extent = pos.max(0) - pos.min(0)
        axes_ = np.argsort(-extent)
        order = np.lexsort(tuple(pos[:, a] for a in reversed(axes_)))
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        template = build_template(pos[order], node_type[order],
                                  cells=inv[cells].astype(np.int32))
        vel = make_trajectory(pos[order], node_type[order], tl=1, dt=0.01,
                              seed=0)[0]
        nf = np.zeros((template.num_nodes, 9), np.float32)
        nf[:n, :2] = vel
        nf[:, 2:] = np.asarray(template.node_type_onehot)
        graph = MeshGraph(node_features=jnp.asarray(nf),
                          edge_features=template.mesh_edge_features,
                          senders=template.senders,
                          receivers=template.receivers,
                          node_mask=template.node_mask,
                          edge_mask=template.edge_mask)
        e_real = int(np.asarray(template.edge_mask).sum())
        return template, graph, e_real

    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=15)
    tgt_key = jax.random.PRNGKey(1)

    def loss_fn(params, graph, cfg, tgt, **kw):
        out = apply_mgn(params, graph, cfg, **kw)
        return jnp.mean((out - tgt) ** 2)

    def gradcheck(name, template, graph, dtype, tol):
        n_pad, e_pad = template.num_nodes, template.num_edges
        print(f"{name}: n={n_pad} e={e_pad} resident="
              f"{residuals_resident(n_pad, e_pad, 128, dtype)}", flush=True)
        params = init_mgn(jax.random.PRNGKey(0),
                          MGNConfig(**base, compute_dtype=dtype))
        tgt = jax.random.normal(tgt_key, (n_pad, 2), jnp.float32)
        cfg_f = MGNConfig(**base, compute_dtype=dtype, fused=True,
                          fused_backward=True)
        cfg_r = MGNConfig(**base, compute_dtype=dtype,
                          aggregation_backend="xla")
        g_f = jax.jit(jax.grad(loss_fn), static_argnums=(2,))(
            params, graph, cfg_f, tgt, fused_plan=template.fused_plan)
        g_r = jax.jit(jax.grad(loss_fn), static_argnums=(2,))(
            params, graph, cfg_r, tgt)
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            scale = np.abs(b).max() + 1e-8
            err = np.abs(a - b).max() / scale
            worst = max(worst, err)
        status = "OK" if worst < tol else "FAIL"
        print(f"{name}: grad rel-err worst={worst:.2e} tol={tol} {status}",
              flush=True)
        return status == "OK"

    def train_time(name, template, graph, dtype, fused):
        cfg = MGNConfig(**base, compute_dtype=dtype, fused=fused,
                        fused_backward=fused,
                        aggregation_backend=None if fused else "banded",
                        unroll=not fused)
        kw = (dict(fused_plan=template.fused_plan) if fused
              else dict(row_offsets=template.row_offsets))
        params = init_mgn(jax.random.PRNGKey(0), cfg)
        tgt = jax.random.normal(tgt_key, (template.num_nodes, 2), jnp.float32)
        opt = optax.adam(1e-4)
        ostate = opt.init(params)
        iters = 100 if jax.default_backend() == "tpu" else 2

        @jax.jit
        def window(params, ostate, graph):
            def body(_, c):
                p, os_ = c
                g = jax.grad(loss_fn)(p, graph, cfg, tgt, **kw)
                up, os_ = opt.update(g, os_, p)
                return (optax.apply_updates(p, up), os_)

            return jax.lax.fori_loop(0, iters, body, (params, ostate))

        out = window(params, ostate, graph)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(window(params, ostate, graph))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name}: {best*1e3:.3f} ms/step  {1/best:.1f} steps/s",
              flush=True)
        return best

    # --- cylinder size, f32: residuals stream (resident f32 overflowed r2) ---
    tpl_c, g_c, _ = build(1900)
    ok = gradcheck("cyl_f32_stream", tpl_c, g_c, jnp.float32, 5e-2)

    # --- airfoil size, bf16: residual windows stream naturally ---------------
    tpl_a, g_a, e_a = build(5300)
    ok &= gradcheck("airfoil_bf16_stream", tpl_a, g_a, jnp.bfloat16, 2e-1)

    if backend == "tpu":
        train_time("cyl_bf16_fused(resident)", tpl_c, g_c, jnp.bfloat16, True)
        train_time("cyl_f32_fused(stream)", tpl_c, g_c, jnp.float32, True)
        t_f = train_time("airfoil_bf16_fused(stream)", tpl_a, g_a,
                         jnp.bfloat16, True)
        t_b = train_time("airfoil_bf16_banded", tpl_a, g_a, jnp.bfloat16,
                         False)
        print(f"airfoil fused/banded speedup: {t_b/t_f:.2f}x", flush=True)

    print("ALL OK" if ok else "GRAD CHECK FAILED", flush=True)


if __name__ == "__main__":
    main()
