"""Bisect the REAL make_spmd_derivative_step via parallel.spmd._PROBE_SKIP.

A hand-rolled step with the same forward, grad, psums, adam, noise, and tiny
per-step psums runs at 9.4 ms/step (probe_spmd_step_tpu.py), but the real
builder measures 59.6 (SPMD_r03.json, allgather mode).  This times the real
builder with individual stages skipped (timing-only; outputs wrong) to find
the pathological one.  Writes benchmarks/results/SPMD_REAL_probe.json.

Run detached: nohup timeout 3000 python benchmarks/probe_spmd_real_tpu.py &
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

WINDOW = 32


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mgn_tpu.core import normalizers as N
    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.parallel import spmd as S
    from mgn_tpu.parallel.partition import partition_template
    from mgn_tpu.parallel.spmd import (batch_from_partitioned,
                                       device_put_batch, make_device_mesh,
                                       make_spmd_derivative_step)
    from mgn_tpu.train.common import FieldSpec, NormState, TrainState

    backend = jax.default_backend()
    results = {"backend": backend, "window": WINDOW}
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    s, r = cells_to_edges(cells)
    tl = WINDOW + 2
    vel = make_trajectory(pos, node_type, tl=tl, dt=0.01, seed=0)
    times = np.arange(tl, dtype=np.float32) * 0.01
    spec = FieldSpec(fields=("velocity",), target_fields=("velocity",),
                     field_dims=(2,), target_dims=(2,))
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=128, hidden_layers=2, message_passing_steps=15,
                    compute_dtype=dtype)
    opt = optax.adam(1e-4)
    mesh = make_device_mesh(1, 1)
    pt = partition_template(pos, node_type, s, r, 1)
    batch, bs, fs = batch_from_partitioned([pt], [{"velocity": vel}], [times])
    tree = device_put_batch(mesh, batch.tree())
    perms = jnp.arange(WINDOW, dtype=jnp.int32)[:, None]

    def fresh_state():
        params = init_mgn(jax.random.PRNGKey(0), cfg)
        return TrainState(
            params=params, opt_state=opt.init(params),
            norm=NormState(edge=N.Online.create(3),
                           node={"velocity": N.Online.create(2),
                                 "node_type": N.OfflineMinMax.create(0.0, 1.0)},
                           output={"velocity": N.Online.create(2)}),
            step=jnp.zeros((), jnp.int32))

    def timed(fn, st, reps=3, samples=4):
        # min over samples: tunnel fetch jitter is additive-positive and can
        # reach tens of seconds (smoke test: 49 s for one scalar), so any
        # single sample may be arbitrarily inflated
        jax.device_get(fn(st, tree, perms, jax.random.PRNGKey(0))[1])
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                st, out = fn(st, tree, perms, jax.random.PRNGKey(0))
            jax.device_get(out)
            best = min(best, (time.perf_counter() - t0) / reps / WINDOW)
        return best

    combos = [
        ("none", frozenset()),
        ("skip_norm", frozenset({"norm"})),
        ("skip_noise", frozenset({"noise"})),
        ("skip_sel", frozenset({"sel"})),
        ("skip_cnt_psum", frozenset({"cnt_psum"})),
        ("skip_all", frozenset({"norm", "noise", "sel", "cnt_psum"})),
    ]
    only = os.environ.get("MGN_PROBE_ONLY")
    if only:
        keep = set(only.split(","))
        combos = [c for c in combos if c[0] in keep]
    cases = {}
    for name, skip in combos:
        S._PROBE_SKIP = skip
        print(name, "compiling/timing...", flush=True)
        try:
            step = make_spmd_derivative_step(mesh, cfg, spec, opt,
                                             noise_stddevs=(0.02,),
                                             norm_steps=0)
            dt = timed(step, fresh_state())
            cases[name] = {"ms_per_step": round(dt * 1e3, 4)}
            print(name, cases[name], flush=True)
        except Exception as ex:
            cases[name] = {"error": str(ex)[:300]}
            print(name, "FAILED", str(ex)[:200], flush=True)
    S._PROBE_SKIP = frozenset()
    results["cases"] = cases

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "SPMD_REAL_probe.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
