"""Benchmark: message-passing throughput of the flagship MGN on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md): edges/sec/chip through the full
Encode-Process-Decode forward pass on a cylinder-flow-sized mesh (~1.9k nodes,
~11k edges, 15 message-passing rounds, latent 128).  edges/sec counts every
edge update + scatter-add across all rounds.  Iterations run inside one jitted
fori_loop so device time, not tunnel latency, is measured.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # persistent compilation cache: repeated bench runs skip the (remote,
    # sometimes very slow) compile entirely
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from mgn_tpu.core.graph import MeshGraph, build_template, cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, apply_mgn, init_mgn

    backend = jax.default_backend()
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    n = len(pos)

    # spatial sweep ordering -> narrow banding plan for the fused round kernel
    extent = pos.max(0) - pos.min(0)
    axes = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes)))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    pos, node_type, cells = pos[order], node_type[order], inv[cells].astype(np.int32)

    template = build_template(pos, node_type, cells=cells)
    e_real = int(np.asarray(template.edge_mask).sum())
    use_fused = template.fused_plan is not None and backend == "tpu"

    compute_dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=128, hidden_layers=2, message_passing_steps=15,
                    compute_dtype=compute_dtype,
                    unroll=(backend == "tpu" and not use_fused),
                    fused=use_fused)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
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
    row_offsets = template.row_offsets

    iters = 200 if backend == "tpu" else 5

    @jax.jit
    def loop(graph):
        def body(_, g):
            out = apply_mgn(params, g, cfg, row_offsets=row_offsets,
                            fused_plan=template.fused_plan if use_fused else None)
            # feed a hash of the output back in so XLA cannot elide iterations
            nf = g.node_features.at[:, 0].add(0.0 * out[:, 0])
            return g.replace(node_features=nf)

        return jax.lax.fori_loop(0, iters, body, graph)

    # device_get, not block_until_ready: through the remote tunnel the
    # latter can resolve before execution finishes (round-3 finding,
    # docs/benchmarks.md); min-of-5 guards the fetch jitter
    jax.device_get(loop(graph).node_features)  # compile + force
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(loop(graph).node_features)
        dt = min(dt, (time.perf_counter() - t0) / iters)

    edges_per_sec = e_real * cfg.message_passing_steps / dt

    vs_baseline = 1.0
    try:  # compare to the ROUND-1 record: vs_baseline is cumulative-vs-
        # original (BENCH_r02 recorded 3.32x against r01's 88.7 M; keeping
        # the oldest anchor preserves that meaning across rounds)
        prior = sorted(p for p in os.listdir(".") if p.startswith("BENCH_r")
                       and p.endswith(".json"))
        if prior:
            with open(prior[0]) as f:
                rec = json.load(f)
            rec = rec.get("parsed", rec)  # driver wraps the JSON line
            if rec.get("unit") == "edges/sec" and rec.get("value"):
                vs_baseline = edges_per_sec / float(rec["value"])
    except Exception:
        pass

    print(json.dumps({
        "metric": "mgn_message_passing_edges_per_sec_per_chip",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(vs_baseline, 4),
    }))


def _await_tunnel(max_wait_s: int = 900) -> None:
    """When this host routes jax to the remote axon TPU, a dead relay makes
    ``import jax`` hang forever.  Probe the relay port first and wait up to
    ``max_wait_s`` for it; exit with a clear error instead of hanging."""
    if not os.path.isdir("/root/.axon_site"):
        return
    import socket

    deadline = time.time() + max_wait_s
    while True:
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", 8083))
            return
        except OSError:
            if time.time() > deadline:
                raise SystemExit(
                    "axon TPU tunnel relay (127.0.0.1:8083) is down; "
                    "refusing to import jax (it would hang)")
            time.sleep(30)
        finally:
            s.close()


if __name__ == "__main__":
    # The remote-TPU tunnel is occasionally flaky (transient connection
    # refusals / compile-service drops); retry a couple of times so one
    # hiccup doesn't lose the round's benchmark record.
    _await_tunnel()
    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            import traceback
            traceback.print_exc(file=sys.stderr)
            print(f"bench attempt {attempt + 1} failed; retrying in 60s",
                  file=sys.stderr, flush=True)
            time.sleep(60)
