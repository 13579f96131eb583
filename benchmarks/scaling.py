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
    if os.environ.get("MGN_SCALING_ROOFLINE_ONLY"):
        p_sizes = []  # plan-based accounting + roofline only (big meshes:
        #               CPU shard_map timings are meaningless and slow)
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

    # ---- ICI-bandwidth roofline (round-4 verdict item 5) -------------------
    # Real multi-chip is unavailable in this environment, so predict the
    # multi-chip edges/s efficiency from (a) the MEASURED single-chip fused
    # throughput, (b) the exact per-P comm volumes of the halo plans built
    # above, and (c) public v5e interconnect figures.  Assumptions recorded
    # in the artifact; both exchange schedules modeled:
    #   per-round: mps exchanges of the 1-ring halo each forward,
    #   deep k=mps: ONE exchange of the mps-deep halo + redundant ghost
    #   compute (n_ext/n_p per chip).
    from mgn_tpu.parallel.partition import add_deep_halo_plan

    eps_chip = float(os.environ.get("MGN_EPS_CHIP", 287.6e6))  # BENCH_r03
    ici_gbs = float(os.environ.get("MGN_ICI_GBS", 100.0))  # per-chip eff. GB/s
    lat_us = float(os.environ.get("MGN_ICI_LAT_US", 5.0))  # per collective
    bpf = 2  # bf16 latent bytes
    # measured (1,1) sharding-machinery overhead per schedule, read from the
    # SPMD_r{NN}.json measurement when present (the per-round path measured
    # 2.5x the unsharded step in r03 — launches + per-round glue; the deep
    # schedule exists to delete that tax): the roofline must charge each
    # schedule its own measured glue, not assume free sharding
    glue = {"per_round": 2.5, "deep": None, "glue_source": "r03 default"}
    for rnd_try in ("r04", "r03"):
        p = os.path.join(_HERE, "results", f"SPMD_{rnd_try}.json")
        if os.path.exists(p):
            with open(p) as fh:
                sp = json.load(fh)
            base_ms = sp.get("unsharded", {}).get("fused", {}).get(
                "ms_per_step")
            pr_ms = sp.get("spmd_mesh11", {}).get("fused_rounds", {}).get(
                "ms_per_step")
            dk = min((v for k_, v in sp.get("spmd_mesh11", {}).items()
                      if k_.startswith("deep_k") and "ms_per_step" in v),
                     key=lambda v: v["ms_per_step"], default=None)
            if base_ms and pr_ms:
                glue = {"per_round": round(pr_ms / base_ms, 3),
                        "deep": (round(dk["ms_per_step"] / base_ms, 3)
                                 if dk else None),
                        "glue_source": p}
                break
    deep_glue = glue["deep"] if glue["deep"] else 1.0
    roofline = {"assumptions": {
        "measured_single_chip_edges_per_s": eps_chip,
        "ici_effective_GBps_per_chip": ici_gbs,
        "per_collective_latency_us": lat_us,
        "measured_mesh11_glue_factor": glue,
        "note": ("efficiency = ideal_compute / (glue*compute + exposed "
                 "comm); overlap column assumes perfect comm/compute "
                 "overlap (max instead of sum).  Deep schedule pays "
                 "redundant ghost compute (edge table ratio) but a single "
                 "exchange; per-round pays its measured per-round "
                 "launch/glue tax.")}}
    preds = []
    for p_count in [p for p in (2, 4, 8) if p <= n_dev]:
        pt = add_halo_plan(partition_template(pos, node_type, s, r, p_count,
                                              spatial_order=True))
        t_comp_ideal = (e / p_count) * mps / eps_chip
        # per-round schedule (charged its measured (1,1) glue tax)
        bytes_ex = (p_count - 1) * pt.halo_size * latent * bpf
        t_comm = mps * (bytes_ex / (ici_gbs * 1e9) + lat_us * 1e-6)
        t_comp_pr = t_comp_ideal * glue["per_round"]
        rec_p = {"schedule": "per_round", "devices": p_count,
                 "halo": pt.halo_size, "exchanges": mps,
                 "bytes_per_forward": mps * bytes_ex,
                 "glue_factor": glue["per_round"],
                 "eff_no_overlap": round(
                     t_comp_ideal / (t_comp_pr + t_comm), 3),
                 "eff_full_overlap": round(
                     t_comp_ideal / max(t_comp_pr, t_comm), 3)}
        preds.append(rec_p)
        # deep k=mps schedule (glue measured once SPMD_r04 lands; 1.0 until)
        dp = add_deep_halo_plan(pt, pos, s, r, mps, mps, build_fused=False)
        redun = dp.edge_mask.sum(1).max() / max(pt.edge_mask.sum(1).max(), 1)
        t_comp_d = t_comp_ideal * float(redun) * deep_glue
        bytes_d = (p_count - 1) * dp.halo_size * latent * bpf
        t_comm_d = bytes_d / (ici_gbs * 1e9) + lat_us * 1e-6
        preds.append({
            "schedule": f"deep_k{mps}", "devices": p_count,
            "halo": dp.halo_size, "exchanges": 1,
            "bytes_per_forward": bytes_d,
            "ghost_compute_ratio": round(float(redun), 3),
            "glue_factor": deep_glue,
            "eff_no_overlap": round(
                t_comp_ideal / (t_comp_d + t_comm_d), 3),
            "eff_full_overlap": round(
                t_comp_ideal / max(t_comp_d, t_comm_d), 3)})
        print(json.dumps(preds[-2]), flush=True)
        print(json.dumps(preds[-1]), flush=True)
    best = {}
    for rec in preds:
        d = rec["devices"]
        if d not in best or rec["eff_no_overlap"] > best[d]["eff_no_overlap"]:
            best[d] = rec
    meets = {d: bool(r["eff_no_overlap"] >= 0.8) for d, r in best.items()}

    summary = {"backend": backend, "nodes": n, "edges": e, "mps": mps,
               "timing_meaningful": backend == "tpu",
               "predicted_efficiency_best": {
                   str(d): {"schedule": r["schedule"],
                            "eff_no_overlap": r["eff_no_overlap"],
                            "eff_full_overlap": r["eff_full_overlap"]}
                   for d, r in best.items()},
               "meets_80pct_target": meets}
    print(json.dumps({"summary": summary}))
    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    rnd = os.environ.get("MGN_BENCH_ROUND", "r03")
    # the virtual-mesh run is the canonical roofline artifact (P>1 records
    # need >1 device); a single-chip TPU run keeps its own file so the two
    # never clobber each other
    suffix = rnd if backend == "cpu" else f"{backend}_{rnd}"
    path = os.path.join(out_dir, f"SCALING_{suffix}.json")
    with open(path, "w") as fh:
        json.dump({"summary": summary, "records": results,
                   "roofline": roofline | {"predictions": preds}}, fh,
                  indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
