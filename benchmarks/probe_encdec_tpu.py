"""Probe: what would folding the encoder/decoder into the fused kernel buy?

Round-4 verdict item 9 — the last unprobed single-chip structure change.
The fused forward is  encoder MLPs (XLA) -> fused_process (one Pallas call,
15 rounds) -> decoder MLP (XLA), i.e. two extra HBM round trips of the
(N, L) node latents plus one of the (E, L) edge latents.  Before any kernel
surgery, measure the CEILING of the fold: full forward time minus the
fused_process-only time IS the encoder+decoder+round-trip cost — folding
can never win more than that slice (it can only hide the HBM traffic and
fuse the small MLPs; the FLOPs remain).

Writes benchmarks/results/ENCDEC_probe.json with the decomposition at the
cylinder design point (1.9k nodes, latent 128, bf16, chunk 1024).
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

REPS = int(os.environ.get("MGN_PROBE_REPS", 30))
NODES = int(os.environ.get("MGN_PROBE_NODES", 1900))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    from mgn_tpu.core.graph import build_template
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.models.mgn import MGNConfig, MeshGraph, apply_mgn, init_mgn
    from mgn_tpu.models.mlp import apply_mlp
    from mgn_tpu.ops.fused import fused_process

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    pos, cells, node_type = make_channel_mesh(NODES, seed=0)
    # spatial order for the fused plan
    extent = pos.max(0) - pos.min(0)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(np.argsort(-extent))))
    inv = np.empty(len(pos), np.int64)
    inv[order] = np.arange(len(pos))
    pos, node_type = pos[order], node_type[order]
    cells = inv[cells].astype(np.int32)
    t = build_template(pos, node_type, cells=cells)
    assert t.fused_plan is not None, "no fused plan on this template"

    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=128, hidden_layers=2,
                    message_passing_steps=15, compute_dtype=dt, fused=True)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    nf = rng.standard_normal((t.num_nodes, 9)).astype(np.float32)
    graph = MeshGraph(node_features=jnp.asarray(nf),
                      edge_features=t.mesh_edge_features,
                      senders=t.senders, receivers=t.receivers,
                      node_mask=t.node_mask, edge_mask=t.edge_mask)
    edge_valid = graph.edge_mask.astype(dt)[:, None]
    interpret = not on_tpu

    def timed(fn, args, chain):
        """State-chained timing with a real device_get (trusted tunnel
        methodology, see spmd_tpu.timed)."""
        out = jax.device_get(fn(*args))  # compile
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            a = args
            for _ in range(REPS):
                o = fn(*a)
                a = chain(a, o)
            jax.device_get(o)
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best, out

    # (a) full forward
    full = jax.jit(lambda p, g: apply_mgn(p, g, cfg,
                                          fused_plan=t.fused_plan))
    import dataclasses as _dc

    def chain_full(args, o):
        p, g = args
        g2 = _dc.replace(g, node_features=g.node_features
                         + 1e-6 * o.sum())
        return (p, g2)

    t_full, _ = timed(full, (params, graph), chain_full)

    # (b) fused_process only (pre-encoded latents)
    v0 = apply_mlp(params["node_encoder"], graph.node_features, dt)
    e0 = apply_mlp(params["edge_encoder"], graph.edge_features, dt) * edge_valid
    proc = jax.jit(lambda pp, v, e: fused_process(
        pp, v, e, t.fused_plan, graph.senders, graph.receivers, edge_valid,
        cfg.message_passing_steps, interpret=interpret))
    t_proc, _ = timed(proc, (params["processor"], v0, e0),
                      lambda a, o: (a[0], a[1] + 1e-6 * o, a[2]))

    # (c) encoder+decoder alone
    encdec = jax.jit(lambda p, g, v: (
        apply_mlp(p["node_encoder"], g.node_features, dt),
        apply_mlp(p["edge_encoder"], g.edge_features, dt),
        apply_mlp(p["decoder"], v, dt)))
    t_ed, _ = timed(encdec, (params, graph, v0),
                    lambda a, o: (a[0], a[1], a[2] + 1e-6 * o[0]))

    ceiling = t_full - t_proc
    results = {
        "backend": jax.default_backend(),
        "ms_full_forward": round(t_full * 1e3, 4),
        "ms_fused_process_only": round(t_proc * 1e3, 4),
        "ms_encdec_isolated": round(t_ed * 1e3, 4),
        "ms_fold_ceiling": round(ceiling * 1e3, 4),
        "fold_ceiling_fraction": round(ceiling / t_full, 4),
        "note": ("fold_ceiling = full - process_only: the most an "
                 "encoder/decoder fold could remove (their MLP FLOPs stay "
                 "either way; only launch overhead + HBM round trips of the "
                 "(N,L)/(E,L) latents are removable)."),
    }
    print(json.dumps(results), flush=True)
    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ENCDEC_probe.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote ENCDEC_probe.json", flush=True)


if __name__ == "__main__":
    main()
