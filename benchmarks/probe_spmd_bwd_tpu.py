"""Bisect the SPMD training step's 35x overhead (SPMD_r03.json).

The sharded forward is fine (2.85 ms at P=1, benchmarks/scaling.py), so the
cost hides in the backward.  Suspects:

A. the VJP of ``jnp.take(v, senders)`` — an UNSORTED scatter-add that
   XLA:TPU may serialize (the unsharded trainers never differentiate a raw
   take: banded/fused backends carry custom VJPs),
B. ``banded_segment_sum`` on the partitioned per-region CSR (halo-split's
   two-region aggregation) being slower than expected,
C. the step wrapper itself (lax.map over the local batch, normalizer psums).

Times each in isolation on the real chip; writes
benchmarks/results/SPMD_BWD_probe.json.

Run detached: nohup timeout 1500 python benchmarks/probe_spmd_bwd_tpu.py &
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
    import jax.numpy as jnp

    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.parallel.partition import add_halo_plan, partition_template

    backend = jax.default_backend()
    results = {"backend": backend}
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    s, r = cells_to_edges(cells)
    pt = add_halo_plan(partition_template(pos, node_type, s, r, 1))
    n_p = pt.part_nodes
    e_p = pt.senders_global.shape[1]
    L = 128
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(n_p, L)), jnp.bfloat16)
    cot = jnp.asarray(rng.normal(size=(e_p, L)), jnp.bfloat16)
    senders = jnp.asarray(pt.senders_global[0])  # unsorted (receiver-major)
    senders_sorted = jnp.asarray(np.sort(pt.senders_global[0]))
    receivers = jnp.asarray(pt.receivers_local[0])  # sorted
    roi = jnp.asarray(pt.row_offsets_int[0])
    rob = jnp.asarray(pt.row_offsets_bnd[0])
    bs = pt.boundary_start
    print(f"n_p={n_p} e_p={e_p} boundary_start={bs}", flush=True)

    ITERS = 100 if backend == "tpu" else 2

    def timed(fn, *args):
        jax.device_get(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        jax.device_get(out)
        return (time.perf_counter() - t0) / ITERS

    def loop(body):
        @jax.jit
        def f(v):
            def it(_, acc):
                return acc + body(v)

            return jax.lax.fori_loop(0, 10, it, jnp.zeros((), jnp.float32))

        return f

    cases = {}

    # A. gather VJP (unsorted scatter-add transpose)
    def grad_take_unsorted(v):
        g = jax.grad(lambda vv: jnp.sum(
            (jnp.take(vv, senders, axis=0) * cot).astype(jnp.float32)))(v)
        return jnp.sum(g.astype(jnp.float32))

    def grad_take_sorted(v):
        g = jax.grad(lambda vv: jnp.sum(
            (jnp.take(vv, senders_sorted, axis=0) * cot).astype(
                jnp.float32)))(v)
        return jnp.sum(g.astype(jnp.float32))

    # A'. explicit sorted-flag gather: take with indices_are_sorted hint
    def grad_take_hint(v):
        def fwd(vv):
            gathered = vv.at[senders].get(indices_are_sorted=False,
                                          unique_indices=False)
            return jnp.sum((gathered * cot).astype(jnp.float32))

        return jnp.sum(jax.grad(fwd)(v).astype(jnp.float32))

    # B. banded segment-sum over the partitioned two-region CSR (fwd+bwd)
    from mgn_tpu.ops.banded import banded_segment_sum

    msg = jnp.asarray(rng.normal(size=(e_p, L)), jnp.bfloat16)

    def banded_2region(m):
        def fwd(mm):
            a = banded_segment_sum(mm[:bs], receivers[:bs], roi, n_p,
                                   min(2048, bs))
            b = banded_segment_sum(mm[bs:], receivers[bs:], rob, n_p,
                                   min(2048, e_p - bs))
            return jnp.sum((a + b).astype(jnp.float32))

        return jnp.sum(jax.grad(fwd)(m).astype(jnp.float32))

    def xla_segsum(m):
        def fwd(mm):
            a = jax.ops.segment_sum(mm, receivers, num_segments=n_p,
                                    indices_are_sorted=True)
            return jnp.sum(a.astype(jnp.float32))

        return jnp.sum(jax.grad(fwd)(m).astype(jnp.float32))

    for name, body, arg in (
            ("grad_take_unsorted", grad_take_unsorted, v),
            ("grad_take_sorted", grad_take_sorted, v),
            ("grad_take_hint", grad_take_hint, v),
            ("banded_2region_fwdbwd", banded_2region, msg),
            ("xla_segsum_fwdbwd", xla_segsum, msg)):
        try:
            dt = timed(loop(body), arg) / 10  # 10 inner iterations
            cases[name] = {"us": round(dt * 1e6, 1)}
            print(name, cases[name], flush=True)
        except Exception as ex:
            cases[name] = {"error": str(ex)[:300]}
            print(name, "FAILED", str(ex)[:200], flush=True)

    results["cases"] = cases
    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "SPMD_BWD_probe.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
