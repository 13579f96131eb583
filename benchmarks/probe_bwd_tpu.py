"""Perf bisection of the fused reverse-round BACKWARD kernel (cylinder size,
bf16, mps=15).

The training step is backward-dominated (~1.4 ms bwd vs ~0.6 ms fwd); this
decomposes backward-kernel time into: recompute gathers | recompute MLP |
adjoint MLP matmuls | weight-grad accumulation | cotangent flow (dagg gather
+ dv/de scatters) | node stage — using ``ops.fused._PROBE`` timing-only hooks
(outputs are numerically wrong for the probe variants; only baseline is real).

Run detached: nohup timeout 1100 python benchmarks/probe_bwd_tpu.py &
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

    import mgn_tpu.ops.fused as F
    from mgn_tpu.core.graph import build_template
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.ops.fused import build_fused_plan, fused_process

    print("backend:", jax.default_backend(), flush=True)

    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    n = len(pos)
    extent = pos.max(0) - pos.min(0)
    axes_ = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes_)))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    template = build_template(pos[order], node_type[order],
                              cells=inv[cells].astype(np.int32))
    e_real = int(np.asarray(template.edge_mask).sum())
    n_pad, e_pad = template.num_nodes, template.num_edges
    s_np = np.asarray(template.senders)
    r_np = np.asarray(template.receivers)
    mps, latent = 15, 128
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=latent, hidden_layers=2,
                    message_passing_steps=mps, compute_dtype=jnp.bfloat16)
    proc = init_mgn(jax.random.PRNGKey(0), cfg)["processor"]
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=(n_pad, latent)), jnp.bfloat16)
    e0 = jnp.asarray(rng.normal(size=(e_pad, latent)), jnp.bfloat16)
    ev = jnp.ones((e_pad, 1), jnp.bfloat16)
    sj, rj = jnp.asarray(s_np), jnp.asarray(r_np)
    plan = build_fused_plan(s_np, r_np, n_pad)
    print(f"plan: band_s={plan.band_s} band_r={plan.band_r} "
          f"chunks={plan.rel_s.shape[0]} chunk={plan.chunk}", flush=True)
    iters = 100

    default_limit = F._VMEM_LIMIT

    def bench(name, probe=None, fwd_only=False, vmem_limit="default",
              defer=None):
        F._PROBE = probe
        F._VMEM_LIMIT = default_limit if vmem_limit == "default" \
            else vmem_limit
        F._FORCE_DEFER = defer
        F._make_fused.cache_clear()

        if fwd_only:
            @jax.jit
            def loop(v0, e0):
                def body(_, v):
                    out = fused_process(proc, v, e0, plan, sj, rj, ev, mps,
                                        kernel_bwd=True)
                    return v + 0.0 * out
                return jax.lax.fori_loop(0, iters, body, v0)
        else:
            grad = jax.grad(lambda v, e_: jnp.sum(fused_process(
                proc, v, e_, plan, sj, rj, ev, mps, kernel_bwd=True) ** 2))

            @jax.jit
            def loop(v0, e0):
                def body(_, v):
                    return v + 0.0 * grad(v, e0)
                return jax.lax.fori_loop(0, iters, body, v0)

        try:
            loop(v0, e0).block_until_ready()
        except Exception as ex:  # e.g. scoped-vmem OOM on a probe variant
            F._PROBE = None
            F._VMEM_LIMIT = default_limit
            F._FORCE_DEFER = None
            F._make_fused.cache_clear()
            print(f"{name}: FAILED ({type(ex).__name__})", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(v0, e0).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        F._PROBE = None
        F._VMEM_LIMIT = default_limit
        F._FORCE_DEFER = None
        F._make_fused.cache_clear()
        print(f"{name}: {best*1e3:.3f} ms", flush=True)
        return best

    # NOTE: the _PROBE bisection hooks live in the NON-deferred chunk body
    # (edge_chunk_bwd), so the bisection pins defer=False; the defer A/B at
    # the bottom measures the shipped default against it.
    t_fwd = bench("fwd only (no grad, kernel_bwd path)", fwd_only=True)
    t_base = bench("fwd+bwd baseline (defer=False)", defer=False)
    t_node = bench("bwd_skip_node (no node-stage backward)", "bwd_skip_node",
                   defer=False)
    t_gath = bench("bwd_skip_gather (no vs/vr recompute gathers)",
                   "bwd_skip_gather", defer=False)
    t_rec = bench("bwd_skip_recompute (no gathers, no MLP recompute)",
                  "bwd_skip_recompute", vmem_limit=32 << 20, defer=False)
    t_mlpb = bench("bwd_skip_mlpbwd (no adjoint MLP matmuls)",
                   "bwd_skip_mlpbwd", defer=False)
    t_wg = bench("bwd_skip_wgrads (no weight-grad accumulation)",
                 "bwd_skip_wgrads", defer=False)
    t_df = bench("bwd_skip_dflow (no dagg gather, no dv/de scatters)",
                 "bwd_skip_dflow", defer=False)

    tb = t_base - t_fwd
    print("--- decomposition (bwd-attributable per step) ---", flush=True)
    print(f"total bwd+save overhead: {tb*1e3:.3f} ms", flush=True)
    for name, t in [("node stage", t_node), ("recompute gathers", t_gath),
                    ("recompute total (gathers+MLP)", t_rec),
                    ("adjoint MLP matmuls", t_mlpb),
                    ("weight-grad accumulation", t_wg),
                    ("cotangent flow (dagg+scatters)", t_df)]:
        if t is None:
            print(f"{name}: (variant failed)", flush=True)
            continue
        print(f"{name}: {(t_base-t)*1e3:.3f} ms "
              f"({100*(t_base-t)/tb:.0f}% of bwd)", flush=True)

    # A/B: the deferred first-layer backward vs the direct one
    bench("fwd+bwd defer_first=False", defer=False)
    bench("fwd+bwd defer_first=True", defer=True)

    # sanity: does a raised Mosaic scoped-vmem cap change the real kernel?
    bench("baseline with vmem_limit=32MB", vmem_limit=32 << 20)
    bench("baseline with vmem_limit=100MB", vmem_limit=100 << 20)


if __name__ == "__main__":
    main()
