"""TPU HLO-schedule proof that the halo-split overlap actually overlaps.

Round-2 verdict weak item 5: the interior/boundary split makes comm/compute
overlap *possible* (data-dependence test:
tests/test_parallel.py::test_halo_split_decouples_collective_from_interior_compute),
but nothing checked that XLA:TPU actually schedules the ``all-to-all``
asynchronously.  This compiles the split-halo sharded forward for the TPU
backend (remote compile is enough — no multi-chip execution needed; the HLO
schedule is a compile-time artifact), walks the scheduled while-body, and
records whether

1. the collective is split into ``all-to-all-start`` / ``all-to-all-done``
   (async pair present), and
2. at least one interior MLP fusion (a dot-carrying fusion with no data
   dependence on the collective) is scheduled BETWEEN start and done —
   i.e. the MXU works while the exchange is in flight.

Writes benchmarks/results/OVERLAP_r{NN}.json.

Run detached: nohup timeout 900 python benchmarks/overlap_hlo_tpu.py &
"""

import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

ROUND = os.environ.get("MGN_BENCH_ROUND", "r03")
NODES = int(os.environ.get("MGN_BENCH_NODES", "1900"))


def analyze(txt: str) -> dict:
    """Parse the scheduled HLO module text; return the overlap verdict."""
    blocks = re.findall(r"^(%?[\w.\-]+) \([^)]*\)[^{]*\{(.*?)^\}", txt,
                        re.S | re.M)
    bodies = [b for _, b in blocks if "all-to-all" in b]
    if not bodies:
        return {"ok": False, "reason": "no all-to-all in compiled module"}
    body = max(bodies, key=len)

    # instruction list in SCHEDULE order (TPU HLO text is scheduled)
    names, deps, kind = [], {}, {}
    for line in body.splitlines():
        m = re.match(r"\s*(%[\w.\-]+) = (.*)", line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        names.append(name)
        deps[name] = set(re.findall(r"%[\w.\-]+", rhs))
        if "all-to-all-start(" in rhs:
            kind[name] = "start"
        elif "all-to-all-done(" in rhs:
            kind[name] = "done"
        elif "all-to-all(" in rhs:
            kind[name] = "sync_a2a"
        elif rhs.lstrip("( ").startswith(("f32", "bf16", "s32", "pred",
                                          "u32")) and "fusion(" in rhs:
            kind[name] = "fusion"
        else:
            kind[name] = "other"

    starts = [n for n in names if kind[n] == "start"]
    dones = [n for n in names if kind[n] == "done"]
    if not starts or not dones:
        return {"ok": False,
                "reason": "collective not async (no start/done pair)",
                "sync_all_to_all": sum(kind[n] == "sync_a2a" for n in names)}

    def transitive(name, seen):
        for d in deps.get(name, ()):
            if d in seen or d not in deps:
                continue
            seen.add(d)
            transitive(d, seen)
        return seen

    idx = {n: i for i, n in enumerate(names)}
    s0, d0 = starts[0], dones[0]
    between = [n for n in names
               if idx[s0] < idx[n] < idx[d0] and kind[n] == "fusion"]
    # interior = scheduled between start/done AND independent of the exchange
    interior = [n for n in between if s0 not in transitive(n, set())]
    return {
        "ok": bool(interior),
        "async_pairs": min(len(starts), len(dones)),
        "fusions_between_start_done": len(between),
        "independent_fusions_between": len(interior),
    }


def main():
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.parallel.halo import apply_mgn_sharded
    from mgn_tpu.parallel.partition import add_halo_plan, partition_template
    from mgn_tpu.parallel.spmd import make_device_mesh

    backend = jax.default_backend()
    results = {"backend": backend, "round": ROUND, "nodes": NODES}

    pos, cells, node_type = make_channel_mesh(NODES, seed=0)
    s, r = cells_to_edges(cells)
    pt = add_halo_plan(partition_template(pos, node_type, s, r, 1))
    assert pt.boundary_start is not None
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=128, hidden_layers=2, message_passing_steps=15,
                    compute_dtype=jnp.bfloat16 if backend == "tpu"
                    else jnp.float32,
                    aggregation_backend="xla")
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    mesh = make_device_mesh(1, 1)

    def f(nf_s, ef_s, sg, rl, nm, em, hs, sh, roi, rob):
        out = apply_mgn_sharded(params, nf_s[0], ef_s[0], sg[0], rl[0],
                                nm[0], em[0], cfg, axis_name="graph",
                                halo_serve=hs[0], senders_halo=sh[0],
                                boundary_start=pt.boundary_start,
                                row_offsets_int=roi[0], row_offsets_bnd=rob[0])
        return out[None]

    fn = jax.jit(shard_map(f, mesh=mesh, in_specs=(P("graph"),) * 10,
                           out_specs=P("graph"), check_vma=False))
    rng = np.random.default_rng(0)
    nfp = rng.normal(size=(pt.num_parts, pt.part_nodes, 9)).astype(np.float32)
    args = (jnp.asarray(nfp), jnp.asarray(pt.mesh_edge_features),
            jnp.asarray(pt.senders_global), jnp.asarray(pt.receivers_local),
            jnp.asarray(pt.node_mask), jnp.asarray(pt.edge_mask),
            jnp.asarray(pt.halo_serve), jnp.asarray(pt.senders_halo),
            jnp.asarray(pt.row_offsets_int), jnp.asarray(pt.row_offsets_bnd))
    print("compiling split-halo forward for", backend, flush=True)
    txt = fn.lower(*args).compile().as_text()
    results["schedule"] = analyze(txt)
    print(json.dumps(results["schedule"]), flush=True)

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"OVERLAP_{ROUND}.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
