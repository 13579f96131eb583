"""Inter-round software-pipelining go/no-go probe (round-2 verdict item 4).

docs/performance.md names "breaking the inter-round serialization" as the
last ~2x single-chip lever.  Before building a skewed kernel, measure the
best case it could reach: ``ops.fused._PROBE = "round_indep"`` makes every
round's edge stage read a round-0 snapshot of v (and double-buffers agg), so
round k+1's edge work has NO data dependency on round k's node stage.  If
Mosaic/the hardware queues exploit that freedom, the independent variant runs
faster than the baseline by the overlappable amount; if it times the same,
the instruction stream is issue-bound and a real pipelined restructure
(which can only interleave the same ops) has no headroom.

Timing-only (outputs are wrong under the probe).  Writes
benchmarks/results/ROUNDPIPE_probe.json.

Run detached: nohup timeout 1800 python benchmarks/probe_roundpipe_tpu.py &
"""

import json
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
    from mgn_tpu.ops.fused import fused_process

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
    plan = template.fused_plan
    e_real = int(np.asarray(template.edge_mask).sum())
    n_pad, e_pad = template.num_nodes, template.num_edges
    mps, latent = 15, 128
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=latent, hidden_layers=2,
                    message_passing_steps=mps, compute_dtype=jnp.bfloat16)
    proc = init_mgn(jax.random.PRNGKey(0), cfg)["processor"]
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=(n_pad, latent)), jnp.bfloat16)
    e0 = jnp.asarray(rng.normal(size=(e_pad, latent)), jnp.bfloat16)
    ev = jnp.ones((e_pad, 1), jnp.bfloat16)
    sj = jnp.asarray(np.asarray(template.senders))
    rj = jnp.asarray(np.asarray(template.receivers))
    iters = 200

    def bench(name, probe):
        F._PROBE = probe
        F._make_fused.cache_clear()

        @jax.jit
        def loop(v0, e0):
            def body(_, v):
                out = fused_process(proc, v, e0, plan, sj, rj, ev, mps)
                return v + 0.0 * out

            return jax.lax.fori_loop(0, iters, body, v0)

        jax.device_get(loop(v0, e0))  # compile + force
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(loop(v0, e0))
            best = min(best, (time.perf_counter() - t0) / iters)
        F._PROBE = None
        F._make_fused.cache_clear()
        eps = e_real * mps / best
        rec = {"ms_per_fwd": round(best * 1e3, 4),
               "medges_per_sec": round(eps / 1e6, 1)}
        print(name, rec, flush=True)
        return rec

    results = {"backend": backend, "iters": iters,
               "mesh": {"nodes": n, "edges": e_real,
                        "chunk": plan.chunk, "band_s": plan.band_s,
                        "band_r": plan.band_r}}
    try:
        results["baseline"] = bench("baseline", None)
        results["round_indep"] = bench("round_indep", "round_indep")
        results["overlap_headroom"] = round(
            results["baseline"]["ms_per_fwd"]
            / results["round_indep"]["ms_per_fwd"], 3)
        print("headroom:", results["overlap_headroom"], flush=True)
    except Exception as ex:
        results["error"] = str(ex)[:2000]
        print("FAILED", str(ex)[:800], flush=True)

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "ROUNDPIPE_probe.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
