"""Graph-parallel scaling harness: edges/s vs number of chips.

Measures the sharded forward pass (mgn_tpu.parallel.halo) on 1, 2, 4, ...
devices over the available mesh and reports per-chip throughput and scaling
efficiency vs 1 device (the BASELINE.md >=80% target), plus the per-round
communication volume of both exchange modes (all-gather vs boundary halo).

On real multi-chip hardware this is the headline scaling measurement; on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu) it validates the machinery and reports comm volumes only
(CPU timings are not meaningful).

    python benchmarks/scaling.py [num_nodes] [mps]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(globals().get("__file__", "benchmarks/x")))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.parallel.halo import apply_mgn_sharded
    from mgn_tpu.parallel.partition import add_halo_plan, partition_template
    from mgn_tpu.parallel.spmd import make_device_mesh

    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mps = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    backend = jax.default_backend()
    n_dev = len(jax.devices())

    pos, cells, node_type = make_channel_mesh(num_nodes, seed=0)
    s, r = cells_to_edges(cells)
    n = len(pos)
    e = len(s)
    latent = 128
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=latent, hidden_layers=2,
                    message_passing_steps=mps,
                    compute_dtype=jnp.bfloat16 if backend == "tpu"
                    else jnp.float32,
                    aggregation_backend="xla")
    params = init_mgn(jax.random.PRNGKey(0), cfg)

    results = []
    p_sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= n_dev]
    base_eps = None
    for p_count in p_sizes:
        pt = partition_template(pos, node_type, s, r, max(p_count, 1))
        pt = add_halo_plan(pt)
        mesh = make_device_mesh(1, p_count)
        rng = np.random.default_rng(0)
        nfp = rng.normal(size=(pt.num_parts, pt.part_nodes, 9)).astype(np.float32)

        def make_fn(mode):
            def f(nf_s, ef_s, sg, rl, nm, em, hs, sh, roi, rob):
                kw = {}
                if mode in ("halo", "halo-split"):
                    kw = dict(halo_serve=hs[0], senders_halo=sh[0])
                if mode == "halo-split":
                    kw.update(boundary_start=pt.boundary_start,
                              row_offsets_int=roi[0], row_offsets_bnd=rob[0])
                out = apply_mgn_sharded(params, nf_s[0], ef_s[0], sg[0], rl[0],
                                        nm[0], em[0], cfg, axis_name="graph",
                                        **kw)
                return out[None]

            return jax.jit(shard_map(f, mesh=mesh, in_specs=(P("graph"),) * 10,
                                     out_specs=P("graph"), check_vma=False))

        zeros = jnp.zeros((pt.num_parts, 1), jnp.int32)
        args = (jnp.asarray(nfp), jnp.asarray(pt.mesh_edge_features),
                jnp.asarray(pt.senders_global), jnp.asarray(pt.receivers_local),
                jnp.asarray(pt.node_mask), jnp.asarray(pt.edge_mask),
                jnp.asarray(pt.halo_serve), jnp.asarray(pt.senders_halo),
                jnp.asarray(pt.row_offsets_int) if pt.boundary_start is not None else zeros,
                jnp.asarray(pt.row_offsets_bnd) if pt.boundary_start is not None else zeros)
        modes = ["allgather", "halo"]
        if pt.boundary_start is not None:
            modes.append("halo-split")
        timings = {}
        for mode in modes:
            fn = make_fn(mode)
            # warm (compile) + a real host fetch; block_until_ready alone is
            # NOT trusted through the remote-TPU tunnel (see spmd_tpu.timed)
            jax.device_get(fn(*args))
            iters = 50 if backend == "tpu" else 2
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.device_get(out)  # in-order execution: forces all prior
            timings[mode] = (time.perf_counter() - t0) / iters
        dt = timings.get("halo-split", timings["halo"])
        eps = e * mps / dt
        if base_eps is None:
            base_eps = eps
        bytes_halo = p_count * pt.halo_size * latent * 2 * mps
        bytes_ag = p_count * pt.part_nodes * latent * 2 * mps
        rec = {
            "devices": p_count,
            "edges_per_sec": round(eps, 1),
            "per_chip": round(eps / p_count, 1),
            "efficiency_vs_1": round(eps / (base_eps * p_count), 3),
            "ms_per_fwd": {m: round(t * 1e3, 3) for m, t in timings.items()},
            "halo_bytes_per_fwd_per_chip": bytes_halo,
            "allgather_bytes_per_fwd_per_chip": bytes_ag,
            "halo_comm_fraction": round(bytes_halo / bytes_ag, 3),
            "boundary_start": pt.boundary_start,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    summary = {"backend": backend, "nodes": n, "edges": e, "mps": mps,
               "timing_meaningful": backend == "tpu"}
    print(json.dumps({"summary": summary}))
    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    rnd = os.environ.get("MGN_BENCH_ROUND", "r03")
    path = os.path.join(out_dir, f"SCALING_{backend}_{rnd}.json")
    with open(path, "w") as fh:
        json.dump({"summary": summary, "records": results}, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
