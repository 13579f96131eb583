"""Perf bisection of the fused round kernel (cylinder size, bf16, mps=15).

Decomposes round time into: one-hot VPU build | gather MXU matmuls | band
scaling | everything else — to pick the right next optimization.  Uses the
``ops.fused._PROBE`` timing-only hook (outputs are numerically wrong for the
probe variants; only the baseline is real).

Run detached: nohup timeout 1100 python benchmarks/probe_fused_tpu.py &
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

    backend = jax.default_backend()
    print("backend:", backend, flush=True)

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
    iters = 100

    def widen(plan, band_s=None, band_r=None):
        """Artificially widen a plan's bands (starts re-clamped, rel shifted)."""
        def wax(starts, rel, band):
            starts = np.asarray(starts)
            rel = np.asarray(rel)
            idx = rel + starts[:, None]
            ns = np.minimum(starts, n_pad - band).astype(np.int32)
            return jnp.asarray(ns), jnp.asarray((idx - ns[:, None]).astype(np.int32))
        p = plan
        if band_s:
            st, rl = wax(p.starts_s, p.rel_s, band_s)
            p = p.replace(starts_s=st, rel_s=rl, band_s=band_s)
        if band_r:
            st, rl = wax(p.starts_r, p.rel_r, band_r)
            p = p.replace(starts_r=st, rel_r=rl, band_r=band_r)
        return p

    plan = build_fused_plan(s_np, r_np, n_pad)
    print(f"plan: band_s={plan.band_s} band_r={plan.band_r} "
          f"chunks={plan.rel_s.shape[0]} chunk={plan.chunk}", flush=True)

    def bench(name, plan, probe=None):
        F._PROBE = probe
        F._make_fused.cache_clear()

        @jax.jit
        def loop(v0, e0):
            def body(_, v):
                out = fused_process(proc, v, e0, plan, sj, rj, ev, mps)
                return v + 0.0 * out
            return jax.lax.fori_loop(0, iters, body, v0)

        loop(v0, e0).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(v0, e0).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        F._PROBE = None
        F._make_fused.cache_clear()
        eps = e_real * mps / best
        print(f"{name}: {best*1e3:.3f} ms/fwd  {eps/1e6:.1f} M edges/s",
              flush=True)
        return best

    t_base = bench("baseline", plan)
    t_const = bench("const_oh (no per-chunk oh build)", plan, "const_oh")
    t_skip = bench("skip_gather (no oh, no gather matmuls)", plan,
                   "skip_gather")
    t_mlp = bench("skip_mlp (identity message MLP)", plan, "skip_mlp")
    t_sc = bench("skip_scatter (no agg scatter-add)", plan, "skip_scatter")
    t_ws = bench("band_s widened 384->512", widen(plan, band_s=512))
    t_wr = bench("band_r widened 128->256", widen(plan, band_r=256))

    print("--- decomposition (per fwd) ---", flush=True)
    print(f"one-hot build cost: {(t_base-t_const)*1e3:.3f} ms "
          f"({100*(t_base-t_const)/t_base:.0f}%)", flush=True)
    print(f"gather total (build+matmul): {(t_base-t_skip)*1e3:.3f} ms "
          f"({100*(t_base-t_skip)/t_base:.0f}%)", flush=True)
    print(f"edge MLP: {(t_base-t_mlp)*1e3:.3f} ms "
          f"({100*(t_base-t_mlp)/t_base:.0f}%)", flush=True)
    print(f"scatter-add: {(t_base-t_sc)*1e3:.3f} ms "
          f"({100*(t_base-t_sc)/t_base:.0f}%)", flush=True)
    print(f"d t / d band_s (per 128): {(t_ws-t_base)*1e3:.3f} ms", flush=True)
    print(f"d t / d band_r (per 128): {(t_wr-t_base)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
