"""SPMD training-step cost vs the unsharded trainer (machine-readable).

Round-2 verdict weak item 2/3: the sharded step's performance was asserted,
never measured.  This records into benchmarks/results/SPMD_r{NN}.json:

- unsharded fused/banded derivative-trainer ms per optimizer step (the
  single-device flagship path, window-scan dispatch),
- the SPMD step at mesh (1,1) — same model, same mesh, partitioned over ONE
  device — for each exchange mode (all-gather, boundary halo, halo-split,
  per-round fused kernels).  On one chip the collectives are degenerate, so
  the delta IS the sharding machinery's overhead: per-round kernel launches,
  weight re-streams, halo gathers (BASELINE.md scaling north-star artifact,
  single-chip half).
- a P=1 scaling.py-style forward record for the same mesh.

Both paths scan a 32-frame window per dispatch so host/tunnel latency is
amortized identically.

Run detached: nohup timeout 1100 python benchmarks/spmd_tpu.py &
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

ROUND = os.environ.get("MGN_BENCH_ROUND", "r03")
WINDOW = int(os.environ.get("MGN_BENCH_WINDOW", "32"))
NODES = int(os.environ.get("MGN_BENCH_NODES", "1900"))
MPS = int(os.environ.get("MGN_BENCH_MPS", "15"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from mgn_tpu.core import normalizers as N
    from mgn_tpu.core.graph import build_template, cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.parallel.partition import (add_fused_plans, add_halo_plan,
                                            partition_template)
    from mgn_tpu.parallel.spmd import (batch_from_partitioned,
                                       device_put_batch, make_device_mesh,
                                       make_spmd_derivative_step)
    from mgn_tpu.train.common import FieldSpec, NormState, TrainState
    from mgn_tpu.train.derivative import (DerivativeTrainerConfig,
                                          make_derivative_trainer)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    results = {"backend": backend, "round": ROUND, "window": WINDOW}

    pos, cells, node_type = make_channel_mesh(NODES, seed=0)
    # spatial order (the fused kernels' layout)
    extent = pos.max(0) - pos.min(0)
    axes_ = np.argsort(-extent)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(axes_)))
    inv = np.empty(len(pos), np.int64)
    inv[order] = np.arange(len(pos))
    pos, node_type = pos[order], node_type[order]
    cells = inv[cells].astype(np.int32)
    n = len(pos)
    s, r = cells_to_edges(cells)
    e_real = len(s)
    tl = WINDOW + 2
    vel = make_trajectory(pos, node_type, tl=tl, dt=0.01, seed=0)
    times = np.arange(tl, dtype=np.float32) * 0.01
    spec = FieldSpec(fields=("velocity",), target_fields=("velocity",),
                     field_dims=(2,), target_dims=(2,))
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base = dict(node_input_dim=9, edge_input_dim=3, output_dim=2,
                latent_size=128, hidden_layers=2, message_passing_steps=MPS,
                compute_dtype=dtype)
    mps = base["message_passing_steps"]
    results["mesh"] = {"nodes": n, "edges": e_real}
    opt = optax.adam(1e-4)

    def fresh_state(cfg):
        params = init_mgn(jax.random.PRNGKey(0), cfg)
        return TrainState(
            params=params, opt_state=opt.init(params),
            norm=NormState(edge=N.Online.create(3),
                           node={"velocity": N.Online.create(2),
                                 "node_type": N.OfflineMinMax.create(0.0, 1.0)},
                           output={"velocity": N.Online.create(2)}),
            step=jnp.zeros((), jnp.int32))

    def timed(fn, reps=3, samples=4):
        """Time ``reps`` state-chained dispatches of ``fn() -> losses``,
        min over ``samples`` repeats.

        ``fn`` must thread its own state so consecutive dispatches have a
        true data dependency, and the final ``jax.device_get`` pulls real
        bytes back through the tunnel — ``block_until_ready`` alone measured
        0.03 ms/step for a 32-frame window here (physically impossible; the
        remote-runtime future resolves before execution finishes), so only a
        concrete host fetch is trusted.  The min-over-samples guards against
        the tunnel's additive fetch jitter (measured up to ~50 s on a cold
        path).
        """
        jax.device_get(fn())  # warm / compile
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            last = None
            for _ in range(reps):
                last = fn()
            jax.device_get(last)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # ---- unsharded flagship trainer (fused on TPU, banded fallback) --------
    unsharded = {}
    for name, over in (("fused", dict(fused=True, fused_backward=True)),
                       ("banded", dict(aggregation_backend="banded",
                                       unroll=True))):
        if name == "fused" and not on_tpu:
            continue
        cfg = MGNConfig(**base, **over)
        template = build_template(pos, node_type, cells=cells)
        if name == "fused" and template.fused_plan is None:
            unsharded[name] = {"error": "no fused plan"}
            continue
        print(f"unsharded {name}: compiling/timing...", flush=True)
        velp = np.zeros((tl, template.num_nodes, 2), np.float32)
        velp[:, :n] = vel
        tcfg = DerivativeTrainerConfig(model=cfg, spec=spec,
                                       noise_stddevs=(0.02,), norm_steps=0)
        trainer = jax.jit(make_derivative_trainer(tcfg, opt))
        st = fresh_state(cfg)
        perm = jnp.arange(WINDOW, dtype=jnp.int32)
        fields = {"velocity": jnp.asarray(velp)}
        tj = jnp.asarray(times)

        def run():
            nonlocal st
            st, losses = trainer(st, template, fields, tj, perm,
                                 jax.random.PRNGKey(0))
            return losses

        dt = timed(run) / WINDOW
        unsharded[name] = {"ms_per_step": round(dt * 1e3, 4),
                           "steps_per_sec": round(1 / dt, 1)}
        print(f"unsharded {name}: {unsharded[name]}", flush=True)
    results["unsharded"] = unsharded

    # ---- SPMD step at mesh (1,1) -------------------------------------------
    mesh = make_device_mesh(1, 1)
    spmd = {}

    def spmd_time(pt, cfg, boundary_start, fused_static, deep_static=None):
        batch, bs, fs = batch_from_partitioned(
            [pt], [{"velocity": vel}], [times])
        tree = device_put_batch(mesh, batch.tree())
        step = make_spmd_derivative_step(
            mesh, cfg, spec, opt, noise_stddevs=(0.02,), norm_steps=0,
            boundary_start=boundary_start, fused_static=fused_static,
            deep_static=deep_static)
        st = fresh_state(cfg)
        perms = jnp.arange(WINDOW, dtype=jnp.int32)[:, None]

        def run():
            nonlocal st
            st, losses = step(st, tree, perms, jax.random.PRNGKey(0))
            return losses

        return timed(run) / WINDOW

    cases = []
    pt_plain = partition_template(pos, node_type, s, r, 1)
    cases.append(("allgather", pt_plain, MGNConfig(**base), None, None, None))
    pt_halo = add_halo_plan(partition_template(pos, node_type, s, r, 1))
    cases.append(("halo_split", pt_halo, MGNConfig(**base),
                  pt_halo.boundary_start, None, None))
    if on_tpu:
        ptf = add_fused_plans(add_halo_plan(
            partition_template(pos, node_type, s, r, 1,
                               spatial_order=True),
            boundary_multiple=512))
        if ptf.fused_rel_s is not None:
            fstat = (ptf.fused_band_s, ptf.fused_band_r, ptf.fused_chunk,
                     ptf.ext_nodes)
            cases.append(("fused_rounds", ptf,
                          MGNConfig(**base, fused=True, fused_backward=True),
                          ptf.boundary_start, fstat, None))
        # k-deep ghost zones (round-4: cut the per-round launch/glue tax;
        # k=mps is one exchange + the monolithic fused kernel per shard)
        import dataclasses as _dc

        from mgn_tpu.parallel.partition import add_deep_halo_plan
        from mgn_tpu.parallel.spmd import deep_static_of

        pt_sp = partition_template(pos, node_type, s, r, 1,
                                   spatial_order=True)
        deep_cases = [(MPS, 512, None), (MPS, 1024, None)]
        if MPS % 5 == 0 and MPS != 5:
            deep_cases.append((5, 512, None))
        if MPS == 15:
            # telescoped stages at P=1 have NO ghost to shrink — the delta
            # vs deep_k15 isolates the pure stage overhead (extra launches +
            # remap gathers), the quantity the scaling roofline charges
            deep_cases.append((MPS, 1024, (5, 5, 5)))
        for k, ch, tel in deep_cases:
            name = (f"deep_k{k}" + ("" if ch == 512 else f"_c{ch}")
                    + ("" if tel is None else f"_tel{len(tel)}"))
            try:
                dp = add_deep_halo_plan(pt_sp, pos, s, r, k, MPS, chunk=ch,
                                        telescope=tel)
            except ValueError as ex:
                spmd[name] = {"error": str(ex)[:200]}
                continue
            if dp.frel_s is None:
                spmd[name] = {"error": "no fused deep plan (bands)"}
                continue
            ptd = _dc.replace(pt_sp, deep=dp)
            cases.append((name, ptd,
                          MGNConfig(**base, fused=True, fused_backward=True),
                          None, None, deep_static_of(ptd)))
    for name, pt, cfg, bs_, fs_, ds_ in cases:
        print(f"spmd(1,1) {name}: compiling/timing...", flush=True)
        try:
            dt = spmd_time(pt, cfg, bs_, fs_, ds_)
            spmd[name] = {"ms_per_step": round(dt * 1e3, 4),
                          "steps_per_sec": round(1 / dt, 1)}
            print(f"spmd(1,1) {name}: {spmd[name]}", flush=True)
        except Exception as ex:
            spmd[name] = {"error": str(ex)[:300]}
            print(f"spmd(1,1) {name}: FAILED {ex}", flush=True)
    results["spmd_mesh11"] = spmd

    ref = unsharded.get("fused", unsharded.get("banded", {}))
    best_spmd = min((v["ms_per_step"] for v in spmd.values()
                     if "ms_per_step" in v), default=None)
    if best_spmd and "ms_per_step" in ref:
        results["spmd_overhead_vs_unsharded"] = round(
            best_spmd / ref["ms_per_step"], 3)
        print("overhead:", results["spmd_overhead_vs_unsharded"], flush=True)

    # host-side comm accounting at P=4 (the real multi-chip shape): deep
    # halos collapse exchange ROUNDS mps -> mps/k; total bytes stay
    # comparable (depth-D halo ~ D one-rings), recorded per round-4 item 2
    from mgn_tpu.parallel.partition import add_deep_halo_plan as _adhp

    pt4 = partition_template(pos, node_type, s, r, 4, spatial_order=True)
    pr4 = add_halo_plan(pt4)
    acc = {"per_round": {"halo": pr4.halo_size, "exchanges": mps}}
    for k in (mps, 5, 3):
        if mps % k:
            continue
        d4 = _adhp(pt4, pos, s, r, k, mps, build_fused=False)
        acc[f"deep_k{k}"] = {
            "halo": d4.halo_size, "exchanges": mps // k, "depth": d4.depth,
            "n_ext": d4.n_ext, "n_p": pt4.part_nodes,
            "bytes_ratio_vs_per_round": round(
                (mps // k) * d4.halo_size / (mps * pr4.halo_size), 3)}
    results["deep_comm_p4"] = acc

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"SPMD_{ROUND}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
