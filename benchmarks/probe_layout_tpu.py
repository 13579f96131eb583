"""Layout probe for the fused BACKWARD kernel: are the transposed-operand
matmuls (adjoint ``dh @ wᵀ`` as a (1,1) contraction, weight-grad ``pᵀ @ dh``
as (0,0)) paying a Mosaic layout/transpose penalty?

Timing-only probes (``ops.fused._PROBE``, numerics wrong by design):

- ``bwd_adj10``  — adjoint contractions switched to (1,0): shape-identical
  for square (L,L) weights, so the delta is pure operand-layout cost.
- ``bwd_wg10``   — weight-grad contraction replaced by an untransposed
  matmul of the same FLOPs against a fake (L,chunk) operand.
- ``bwd_skip_vpu`` — LN-backward + relu-mask elementwise work removed
  (bounds the non-matmul VPU share).

Probes compose via "+" (e.g. "bwd_adj10+bwd_wg10").  Runs on the shipped
default path (deferred first-layer backward when it applies).

Run detached: nohup timeout 1100 python benchmarks/probe_layout_tpu.py &
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

    def bench(name, probe=None, wt=None, wgb=None, saveh=None):
        F._PROBE = probe
        F._FORCE_WT = wt
        F._FORCE_WGB = wgb
        F._FORCE_SAVEH = saveh
        F._make_fused.cache_clear()
        grad = jax.grad(lambda v, e_: jnp.sum(fused_process(
            proc, v, e_, plan, sj, rj, ev, mps, kernel_bwd=True) ** 2))

        @jax.jit
        def loop(v0, e0):
            def body(_, v):
                return v + 0.0 * grad(v, e0)
            return jax.lax.fori_loop(0, iters, body, v0)

        try:
            loop(v0, e0).block_until_ready()
        except Exception as ex:
            F._PROBE = None
            F._FORCE_WT = None
            F._FORCE_WGB = None
            F._FORCE_SAVEH = None
            F._make_fused.cache_clear()
            print(f"{name}: FAILED ({type(ex).__name__})", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(v0, e0).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        F._PROBE = None
        F._FORCE_WT = None
        F._FORCE_WGB = None
        F._FORCE_SAVEH = None
        F._make_fused.cache_clear()
        print(f"{name}: {best*1e3:.3f} ms", flush=True)
        return best

    t_base = bench("fwd+bwd baseline (shipped defaults)")
    t_adj = bench("bwd_adj10 (adjoint matmuls untransposed)", "bwd_adj10")
    t_wg = bench("bwd_wg10 (wgrad matmuls untransposed-fake)", "bwd_wg10")
    t_both = bench("bwd_adj10+bwd_wg10", "bwd_adj10+bwd_wg10")
    t_vpu = bench("bwd_skip_vpu (no LN-bwd/relu-mask VPU work)",
                  "bwd_skip_vpu")
    # REAL (numerically exact) candidates
    t_wt = bench("FORCE_WT (real per-round transposed adjoint weights)",
                 wt=True)
    t_wgb = bench("FORCE_WGB (real per-round batched weight grads)",
                  wgb=True)
    t_wtgb = bench("FORCE_WT+WGB (both)", wt=True, wgb=True)
    t_sh = bench("FORCE_SAVEH (real saved-activation backward)", saveh=True)
    t_all = bench("FORCE_WT+WGB+SAVEH (all three)",
                  wt=True, wgb=True, saveh=True)

    print("--- layout-cost attribution (vs baseline) ---", flush=True)
    for name, t in [("adjoint transposed-W cost", t_adj),
                    ("wgrad transposed-A cost", t_wg),
                    ("both", t_both),
                    ("LN-bwd/relu VPU cost", t_vpu),
                    ("FORCE_WT real gain", t_wt),
                    ("FORCE_WGB real gain", t_wgb),
                    ("FORCE_WT+WGB real gain", t_wtgb),
                    ("FORCE_SAVEH real gain", t_sh),
                    ("all three real gain", t_all)]:
        if t is None or t_base is None:
            continue
        print(f"{name}: {(t_base-t)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
