"""Bisect the cloth fused-kernel compile failure (round-4).

The multi-edge-set fast path (models/mgn_multi.apply_mgn_multi) fails to
compile on real TPU hardware with a remote-compile HTTP 500 ("helper
subprocess exit code 1" — the helper crashes instead of reporting the
Mosaic error), reproducibly (CLOTH_r03 + CLOTH_r04).  The SPMD per-round
variant (mps=1, return_edges, NO node_extra) compiles and runs fine
(SPMD_r04 fused_rounds), so the suspect is the ``node_extra`` kernel
variant.  This compiles each variant in isolation at small shapes and
records which ones fail; writes benchmarks/results/CLOTH_COMPILE_probe.json.
"""

import json
import os
import sys
import traceback

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    import jax.numpy as jnp

    from mgn_tpu.core.graph import build_template
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.ops.fused import fused_process

    on_tpu = jax.default_backend() == "tpu"
    pos, cells, nt = make_channel_mesh(400, seed=0)
    extent = pos.max(0) - pos.min(0)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(np.argsort(-extent))))
    inv = np.empty(len(pos), np.int64)
    inv[order] = np.arange(len(pos))
    pos, nt = pos[order], nt[order]
    cells = inv[cells].astype(np.int32)
    t = build_template(pos, nt, cells=cells)
    assert t.fused_plan is not None
    n, e, L = t.num_nodes, t.num_edges, 128
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((n, L)), jnp.bfloat16)
    e0 = jnp.asarray(rng.standard_normal((e, L)), jnp.bfloat16)
    xtr = jnp.asarray(rng.standard_normal((n, L)), jnp.float32)
    ev = t.edge_mask.astype(jnp.bfloat16)[:, None]

    from mgn_tpu.models.mgn import MGNConfig, init_mgn

    cfg = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                    latent_size=L, hidden_layers=2, message_passing_steps=1)
    pp = init_mgn(jax.random.PRNGKey(0), cfg)["processor"]
    results = {"backend": jax.default_backend(), "variants": {}}

    def attempt(name, fn, *args):
        try:
            jax.jit(fn).lower(*args).compile()
            results["variants"][name] = {"ok": True}
            print(name, "OK", flush=True)
        except Exception as ex:
            results["variants"][name] = {"ok": False,
                                         "error": str(ex)[:600]}
            print(name, "FAILED:", str(ex)[:200], flush=True)
            traceback.print_exc(limit=3)

    ip = not on_tpu
    kb = True  # the failing trainer uses the native backward

    attempt("mps1_redges",
            lambda p, v, eo: fused_process(
                p, v, eo, t.fused_plan, t.senders, t.receivers, ev, 1,
                interpret=ip, kernel_bwd=kb, return_edges=True), pp, v0, e0)
    attempt("mps1_redges_xtr_fwd",
            lambda p, v, eo, x: fused_process(
                p, v, eo, t.fused_plan, t.senders, t.receivers, ev, 1,
                interpret=ip, kernel_bwd=kb, return_edges=True,
                node_extra=x), pp, v0, e0, xtr)

    def loss_xtr(p, v, eo, x):
        v2, e2 = fused_process(p, v, eo, t.fused_plan, t.senders,
                               t.receivers, ev, 1, interpret=ip,
                               kernel_bwd=kb, return_edges=True,
                               node_extra=x)
        return (jnp.sum(v2.astype(jnp.float32) ** 2)
                + jnp.sum(e2.astype(jnp.float32) ** 2))

    attempt("mps1_redges_xtr_grad",
            lambda p, v, eo, x: jax.grad(loss_xtr, argnums=(0, 3))(
                p, v, eo, x), pp, v0, e0, xtr)

    def loss_xtr_xla_bwd(p, v, eo, x):
        v2, e2 = fused_process(p, v, eo, t.fused_plan, t.senders,
                               t.receivers, ev, 1, interpret=ip,
                               kernel_bwd=False, return_edges=True,
                               node_extra=x)
        return (jnp.sum(v2.astype(jnp.float32) ** 2)
                + jnp.sum(e2.astype(jnp.float32) ** 2))

    attempt("mps1_redges_xtr_grad_xlabwd",
            lambda p, v, eo, x: jax.grad(loss_xtr_xla_bwd, argnums=(0, 3))(
                p, v, eo, x), pp, v0, e0, xtr)

    # exact repro: the full cloth trainer at the bench's flag shapes
    # (50x32 sheet, window 2) — isolates whether the failure needs the
    # multi-edge-set trainer context rather than the bare kernel variant
    try:
        import optax

        from mgn_tpu.data.pipeline import load_dataset
        from mgn_tpu.data.prep import prepare_trajectory
        from mgn_tpu.data.synthetic import write_flag_dataset
        from mgn_tpu.models.mgn_multi import init_mgn_multi
        from mgn_tpu.train.cloth import (ClothConfig, cloth_model_config,
                                         jit_cloth_trainer,
                                         make_cloth_norm_state,
                                         make_cloth_trainer)
        from mgn_tpu.train.common import FieldSpec, TrainState

        ds_path = "/tmp/mgn_flag_probe_50x32"
        if not os.path.isfile(os.path.join(ds_path, "meta.json")):
            write_flag_dataset(ds_path, nx=50, ny=32, tl=5, n_train=1,
                               n_valid=1, n_test=1)
        ds = load_dataset(ds_path, is_training=True)
        spec = FieldSpec.from_meta(ds.meta)
        dt_ = jnp.bfloat16 if on_tpu else jnp.float32
        mcfg = cloth_model_config(ds.meta, latent=128, hidden_layers=2,
                                  mps=15, compute_dtype=dt_, fused=True,
                                  fused_backward=True)
        ccfg = ClothConfig(model=mcfg, world_radius=0.05,
                           world_capacity=2048, noise_stddev=0.003,
                           norm_steps=0)
        prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec,
                                  spatial_reorder=True)
        opt = optax.adam(1e-4)
        trainer = jit_cloth_trainer(ccfg, opt)
        params = init_mgn_multi(jax.random.PRNGKey(0), mcfg)
        st = TrainState(params=params, opt_state=opt.init(params),
                        norm=make_cloth_norm_state(ccfg),
                        step=jnp.zeros((), jnp.int32))
        perm = jnp.asarray([1, 2], jnp.int32)
        trainer.lower(st, prep.template, prep.fields["world_pos"],
                      prep.times, perm, jax.random.PRNGKey(0)).compile()
        results["variants"]["cloth_trainer_flag50x32"] = {"ok": True}
        print("cloth_trainer_flag50x32 OK", flush=True)
    except Exception as ex:
        results["variants"]["cloth_trainer_flag50x32"] = {
            "ok": False, "error": str(ex)[:600]}
        print("cloth_trainer_flag50x32 FAILED:", str(ex)[:200], flush=True)
        traceback.print_exc(limit=3)

    out = os.path.join(_HERE, "results", "CLOTH_COMPILE_probe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
