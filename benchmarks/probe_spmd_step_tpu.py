"""Step-level bisection of the SPMD training step's 35x overhead.

benchmarks/probe_spmd_bwd_tpu.py cleared the primitives (gather VJP, banded
CSR backward: all ~45 us), and scaling.py cleared the sharded forward
(2.85 ms at P=1).  This times the sharded step structure itself at P=1,
adding one ingredient at a time inside the SAME shard_map + 32-step scan
harness the real step uses (parallel/spmd.make_spmd_derivative_step):

  fwd_loss     forward + masked loss only (no AD)
  grad         + value_and_grad
  grad_map     + lax.map over the local batch (B=1), like the real step
  grad_psum    + psum(grads) over the mesh axes
  grad_opt     + adam update + warmup select (= everything but the
                 normalizer-delta psums)

Writes benchmarks/results/SPMD_STEP_probe.json.

Run detached: nohup timeout 2400 python benchmarks/probe_spmd_step_tpu.py &
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
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.synthetic import make_channel_mesh, make_trajectory
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.parallel.halo import apply_mgn_sharded
    from mgn_tpu.parallel.mesh import compiler_options_for
    from mgn_tpu.parallel.partition import add_halo_plan, partition_template
    from mgn_tpu.parallel.spmd import make_device_mesh

    backend = jax.default_backend()
    results = {"backend": backend, "window": WINDOW}
    pos, cells, node_type = make_channel_mesh(1900, seed=0)
    s, r = cells_to_edges(cells)
    pt = add_halo_plan(partition_template(pos, node_type, s, r, 1))
    n_p = pt.part_nodes
    L = 128
    mesh = make_device_mesh(1, 1)
    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=L, hidden_layers=2, message_passing_steps=15,
                    compute_dtype=jnp.bfloat16 if backend == "tpu"
                    else jnp.float32,
                    aggregation_backend="xla")
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    tl = WINDOW + 2
    vel = make_trajectory(pos, node_type, tl=tl, dt=0.01, seed=0)
    stack = np.zeros((1, tl, n_p, 2), np.float32)  # (B=1, T, N_p, d)
    stack[0, :, :vel.shape[1]] = vel
    nto = np.zeros((1, n_p, 7), np.float32)
    nto[0, :pt.node_type_onehot.shape[1]] = 0.0

    axes = ("data", "graph")

    def make_step(variant):
        def local_step(prms, ost, batch, perms):
            stacks = batch["stack"][:, 0]  # (Bl, T, N_p, d)
            nm = batch["nm"][:, 0]
            em = batch["em"][:, 0]
            sg = batch["sg"][:, 0]
            rl = batch["rl"][:, 0]
            mef = batch["mef"][:, 0]
            nto_b = batch["nto"][:, 0]

            def one_update(carry, pk):
                prms, ost = carry
                take = jax.vmap(lambda st, t: jax.lax.dynamic_index_in_dim(
                    st, t, 0, keepdims=False))
                u = take(stacks, pk)
                nxt = take(stacks, pk + 1)
                tgt = (nxt - u) * 100.0

                def per_traj_loss(prms, a):
                    u_b, tgt_b, nm_b, em_b, sg_b, rl_b, mef_b, nto_bb = a
                    nf = jnp.concatenate([u_b, nto_bb], -1) * nm_b[:, None]
                    ef = mef_b * em_b[:, None]
                    out = apply_mgn_sharded(prms, nf, ef, sg_b, rl_b,
                                            nm_b.astype(bool),
                                            em_b.astype(bool), cfg,
                                            axis_name="graph")
                    m = nm_b
                    return (jnp.sum(jnp.sum((out - tgt_b) ** 2, -1) * m),
                            jnp.sum(m))

                vm_args = (u, tgt, nm, em, sg, rl, mef, nto_b)

                def loss_fn(prms):
                    if variant in ("grad_map", "grad_psum", "grad_opt"):
                        sq, cnt = jax.lax.map(
                            lambda a: per_traj_loss(prms, a), vm_args)
                        return jnp.sum(sq) / jnp.maximum(jnp.sum(cnt), 1.0)
                    a = jax.tree.map(lambda x: x[0], vm_args)
                    sq, cnt = per_traj_loss(prms, a)
                    return sq / jnp.maximum(cnt, 1.0)

                if variant == "fwd_loss":
                    return (prms, ost), loss_fn(prms)
                if variant == "grad_noise":
                    kk = jax.random.fold_in(jax.random.PRNGKey(0), pk[0])
                    keys = jax.random.split(kk, 2)
                    u = u + 0.02 * jax.random.normal(keys[0], u.shape)
                loss, grads = jax.value_and_grad(loss_fn)(prms)
                if variant == "grad_normpsum":
                    # mimic accumulate_synced's per-step traffic: ~10 tiny
                    # psums of (d,)-vectors over both mesh axes
                    extra = 0.0
                    for i in range(10):
                        extra = extra + jnp.sum(jax.lax.psum(
                            jnp.sum(u * (i + 1.0), axis=(0, 1)), axes))
                    loss = loss + 1e-30 * extra  # not 0.0*x: DCE-proof
                if variant in ("grad_psum", "grad_opt"):
                    grads = jax.lax.psum(grads, axes)
                    loss = jax.lax.psum(loss, axes)
                if variant == "grad_opt":
                    updates, ost = opt.update(grads, ost, prms)
                    prms = optax.apply_updates(prms, updates)
                else:
                    # keep grads live without optimizer state
                    prms = jax.tree.map(lambda p, g: p - 0.0 * g, prms, grads)
                return (prms, ost), loss

            (prms, ost), losses = jax.lax.scan(one_update, (prms, ost), perms)
            return losses

        def step(prms, ost, batch, perms):
            specs = {k: P("data", "graph") for k in batch}
            fn = shard_map(local_step, mesh=mesh,
                           in_specs=(P(), P(), specs, P(None, "data")),
                           out_specs=P(), check_vma=False)
            return fn(prms, ost, batch, perms)

        return jax.jit(step, compiler_options=compiler_options_for(mesh))

    batch = {
        "stack": jnp.asarray(stack)[:, None],  # (B, P=1, T, N_p, d)
        "nm": jnp.asarray(pt.node_mask, jnp.float32)[None],
        "em": jnp.asarray(pt.edge_mask, jnp.float32)[None],
        "sg": jnp.asarray(pt.senders_global)[None],
        "rl": jnp.asarray(pt.receivers_local)[None],
        "mef": jnp.asarray(pt.mesh_edge_features)[None],
        "nto": jnp.asarray(nto)[:, None],
    }
    perms = jnp.arange(WINDOW, dtype=jnp.int32)[:, None]

    def timed(fn, reps=3):
        jax.device_get(fn(params, opt_state, batch, perms))
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(params, opt_state, batch, perms)
        jax.device_get(out)
        return (time.perf_counter() - t0) / reps / WINDOW

    cases = {}
    variants = ("fwd_loss", "grad", "grad_map", "grad_psum", "grad_opt",
                "grad_noise", "grad_normpsum")
    only = os.environ.get("MGN_PROBE_ONLY")
    if only:
        variants = tuple(only.split(","))
    for variant in variants:
        print(variant, "compiling/timing...", flush=True)
        try:
            dt = timed(make_step(variant))
            cases[variant] = {"ms_per_step": round(dt * 1e3, 4)}
            print(variant, cases[variant], flush=True)
        except Exception as ex:
            cases[variant] = {"error": str(ex)[:300]}
            print(variant, "FAILED", str(ex)[:200], flush=True)
    results["cases"] = cases

    out_dir = os.path.join(_HERE, "results")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "SPMD_STEP_probe.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
