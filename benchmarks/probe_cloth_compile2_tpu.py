"""Stage-2 bisect of the cloth fused-kernel remote-compile failure.

Stage 1 (probe_cloth_compile_tpu.py / CLOTH_COMPILE_probe.json): every bare
kernel variant incl. node_extra fwd+grad compiles at 400-node shapes; only
the FULL cloth trainer at flag 50x32 fails (helper subprocess exit 1).
This stage isolates which ingredient at the real shapes breaks it:

- multi_fwd_50x32 / multi_grad_50x32: apply_mgn_multi alone (no trainer
  scan/optimizer), fused backward on,
- multi_grad_50x32_xlabwd: same with the XLA recompute backward,
- trainer_16x12: the full trainer on a 4x smaller sheet,
- kernel_xtr_1600: the bare node_extra kernel at a 1600-node mesh (pure
  shape control).

Writes benchmarks/results/CLOTH_COMPILE2_probe.json.
"""

import json
import os
import sys
import traceback

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

results = {"variants": {}}


def attempt(name, thunk):
    import jax  # noqa

    try:
        thunk()
        results["variants"][name] = {"ok": True}
        print(name, "OK", flush=True)
    except Exception as ex:
        results["variants"][name] = {"ok": False, "error": str(ex)[:600]}
        print(name, "FAILED:", str(ex)[:200], flush=True)
        traceback.print_exc(limit=2)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    import jax.numpy as jnp
    import optax

    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import write_flag_dataset
    from mgn_tpu.models.mgn_multi import init_mgn_multi, apply_mgn_multi
    from mgn_tpu.train.cloth import (ClothConfig, build_cloth_graph,
                                         jit_cloth_trainer,
                                     cloth_model_config,
                                     make_cloth_norm_state,
                                     make_cloth_trainer)
    from mgn_tpu.train.common import FieldSpec, TrainState

    on_tpu = jax.default_backend() == "tpu"
    dt_ = jnp.bfloat16 if on_tpu else jnp.float32
    results["backend"] = jax.default_backend()

    def setup(nx, ny):
        ds_path = f"/tmp/mgn_flag_probe_{nx}x{ny}"
        if not os.path.isfile(os.path.join(ds_path, "meta.json")):
            write_flag_dataset(ds_path, nx=nx, ny=ny, tl=5, n_train=1,
                               n_valid=1, n_test=1)
        ds = load_dataset(ds_path, is_training=True)
        spec = FieldSpec.from_meta(ds.meta)
        prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec,
                                  spatial_reorder=True)
        return ds, spec, prep

    def mk_cfg(fused_backward=True):
        return lambda meta: ClothConfig(
            model=cloth_model_config(meta, latent=128, hidden_layers=2,
                                     mps=15, compute_dtype=dt_, fused=True,
                                     fused_backward=fused_backward),
            world_radius=0.05, world_capacity=2048, noise_stddev=0.003,
            norm_steps=0)

    ds, spec, prep = setup(50, 32)
    ccfg = mk_cfg(True)(ds.meta)
    params = init_mgn_multi(jax.random.PRNGKey(0), ccfg.model)
    norm = make_cloth_norm_state(ccfg)
    wp = np.asarray(prep.fields["world_pos"])
    cur = jnp.asarray(wp[1])
    vel = jnp.asarray((wp[1] - wp[0]) / (prep.times[1] - prep.times[0]))
    graph = build_cloth_graph(norm, prep.template, cur, vel, ccfg)

    attempt("multi_fwd_50x32", lambda: jax.jit(
        lambda p: apply_mgn_multi(p, graph, ccfg.model,
                                  fused_plan=prep.template.fused_plan)
    ).lower(params).compile())

    def loss(p, cfgm):
        out = apply_mgn_multi(p, graph, cfgm,
                              fused_plan=prep.template.fused_plan)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    attempt("multi_grad_50x32", lambda: jax.jit(
        jax.grad(lambda p: loss(p, ccfg.model))).lower(params).compile())
    ccfg_x = mk_cfg(False)(ds.meta)
    attempt("multi_grad_50x32_xlabwd", lambda: jax.jit(
        jax.grad(lambda p: loss(p, ccfg_x.model))).lower(params).compile())

    def trainer_at(nx, ny):
        ds2, spec2, prep2 = setup(nx, ny)
        cc = mk_cfg(True)(ds2.meta)
        opt = optax.adam(1e-4)
        tr = jit_cloth_trainer(cc, opt)
        p2 = init_mgn_multi(jax.random.PRNGKey(0), cc.model)
        st = TrainState(params=p2, opt_state=opt.init(p2),
                        norm=make_cloth_norm_state(cc),
                        step=jnp.zeros((), jnp.int32))
        perm = jnp.asarray([1, 2], jnp.int32)
        tr.lower(st, prep2.template, prep2.fields["world_pos"], prep2.times,
                 perm, jax.random.PRNGKey(0)).compile()

    attempt("trainer_16x12", lambda: trainer_at(16, 12))

    # shape control: bare node_extra kernel at a 1600-node channel mesh
    from mgn_tpu.core.graph import build_template
    from mgn_tpu.data.synthetic import make_channel_mesh
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.ops.fused import fused_process

    pos, cells, nt = make_channel_mesh(1600, seed=0)
    extent = pos.max(0) - pos.min(0)
    order = np.lexsort(tuple(pos[:, a] for a in reversed(np.argsort(-extent))))
    inv = np.empty(len(pos), np.int64)
    inv[order] = np.arange(len(pos))
    pos, nt = pos[order], nt[order]
    cells = inv[cells].astype(np.int32)
    t = build_template(pos, nt, cells=cells)
    cfg1 = MGNConfig(node_input_dim=9, edge_input_dim=3, output_dim=2,
                     latent_size=128, hidden_layers=2,
                     message_passing_steps=1)
    pp = init_mgn(jax.random.PRNGKey(0), cfg1)["processor"]
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((t.num_nodes, 128)), dt_)
    e0 = jnp.asarray(rng.standard_normal((t.num_edges, 128)), dt_)
    xtr = jnp.asarray(rng.standard_normal((t.num_nodes, 128)), jnp.float32)
    ev = t.edge_mask.astype(dt_)[:, None]

    def kloss(p, v, eo, x):
        v2, e2 = fused_process(p, v, eo, t.fused_plan, t.senders,
                               t.receivers, ev, 1, interpret=not on_tpu,
                               kernel_bwd=True, return_edges=True,
                               node_extra=x)
        return (jnp.sum(v2.astype(jnp.float32) ** 2)
                + jnp.sum(e2.astype(jnp.float32) ** 2))

    attempt("kernel_xtr_1600", lambda: jax.jit(
        jax.grad(kloss, argnums=(0, 3))).lower(pp, v0, e0, xtr).compile())

    out = os.path.join(_HERE, "results", "CLOTH_COMPILE2_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


def stage3():
    """Extra controls appended after the first run isolated the failure to
    multi_grad at 50x32 with the native backward: (a) the bare node_extra
    kernel grad at the EXACT flag template/plan, (b) the multi grad with
    fewer rounds (module-size vs shape), (c) intermediate mesh sizes."""
    import jax
    import jax.numpy as jnp

    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import write_flag_dataset
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.models.mgn_multi import init_mgn_multi, apply_mgn_multi
    from mgn_tpu.ops.fused import fused_process
    from mgn_tpu.train.cloth import (ClothConfig, build_cloth_graph,
                                         jit_cloth_trainer,
                                     cloth_model_config,
                                     make_cloth_norm_state)
    from mgn_tpu.train.common import FieldSpec

    on_tpu = jax.default_backend() == "tpu"
    dt_ = jnp.bfloat16 if on_tpu else jnp.float32

    def setup(nx, ny):
        ds_path = f"/tmp/mgn_flag_probe_{nx}x{ny}"
        if not os.path.isfile(os.path.join(ds_path, "meta.json")):
            write_flag_dataset(ds_path, nx=nx, ny=ny, tl=5, n_train=1,
                               n_valid=1, n_test=1)
        ds = load_dataset(ds_path, is_training=True)
        spec = FieldSpec.from_meta(ds.meta)
        prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec,
                                  spatial_reorder=True)
        return ds, spec, prep

    # (a) bare node_extra kernel grad at the exact flag 50x32 template
    ds, spec, prep = setup(50, 32)
    t = prep.template
    cfg1 = MGNConfig(node_input_dim=9, edge_input_dim=4, output_dim=3,
                     latent_size=128, hidden_layers=2,
                     message_passing_steps=1)
    pp = init_mgn(jax.random.PRNGKey(0), cfg1)["processor"]
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((t.num_nodes, 128)), dt_)
    e0 = jnp.asarray(rng.standard_normal((t.num_edges, 128)), dt_)
    xtr = jnp.asarray(rng.standard_normal((t.num_nodes, 128)), jnp.float32)
    ev = t.edge_mask.astype(dt_)[:, None]

    def kloss(p, v, eo, x):
        v2, e2 = fused_process(p, v, eo, t.fused_plan, t.senders,
                               t.receivers, ev, 1, interpret=not on_tpu,
                               kernel_bwd=True, return_edges=True,
                               node_extra=x)
        return (jnp.sum(v2.astype(jnp.float32) ** 2)
                + jnp.sum(e2.astype(jnp.float32) ** 2))

    attempt("kernel_xtr_flag50x32", lambda: jax.jit(
        jax.grad(kloss, argnums=(0, 3))).lower(pp, v0, e0, xtr).compile())

    # (b) multi grad at 50x32 with fewer rounds (same shapes)
    def multi_grad(nx, ny, mps):
        ds2, spec2, prep2 = setup(nx, ny)
        cc = ClothConfig(
            model=cloth_model_config(ds2.meta, latent=128, hidden_layers=2,
                                     mps=mps, compute_dtype=dt_, fused=True,
                                     fused_backward=True),
            world_radius=0.05, world_capacity=2048, noise_stddev=0.003,
            norm_steps=0)
        p = init_mgn_multi(jax.random.PRNGKey(0), cc.model)
        norm = make_cloth_norm_state(cc)
        wp = np.asarray(prep2.fields["world_pos"])
        cur = jnp.asarray(wp[1])
        vel = jnp.asarray((wp[1] - wp[0]) / (prep2.times[1] - prep2.times[0]))
        graph = build_cloth_graph(norm, prep2.template, cur, vel, cc)

        def loss(p_):
            out = apply_mgn_multi(p_, graph, cc.model,
                                  fused_plan=prep2.template.fused_plan)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        jax.jit(jax.grad(loss)).lower(p).compile()

    attempt("multi_grad_50x32_mps2", lambda: multi_grad(50, 32, 2))
    attempt("multi_grad_32x20_mps15", lambda: multi_grad(32, 20, 15))
    attempt("multi_grad_40x26_mps15", lambda: multi_grad(40, 26, 15))

    out = os.path.join(_HERE, "results", "CLOTH_COMPILE3_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)





def stage4():
    """Hypothesis: the native-backward multi compile failure is the SAME
    scoped-VMEM operand-fusion OOM round 3 measured for the SPMD fused path
    (parallel/mesh.compiler_options_for — XLA stages the backward's big
    residual-stack operand fusions in scoped VMEM under the global 16 MB
    default, and the remote compile helper turns the OOM into an opaque
    exit-1).  Re-run the failing multi_grad_50x32 native-bwd compile WITH
    the program-wide scoped-vmem cap raised to the kernels' own limit."""
    import jax
    import jax.numpy as jnp

    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import write_flag_dataset
    from mgn_tpu.models.mgn_multi import init_mgn_multi, apply_mgn_multi
    from mgn_tpu.ops import fused as _F
    from mgn_tpu.train.cloth import (ClothConfig, build_cloth_graph,
                                         jit_cloth_trainer,
                                     cloth_model_config,
                                     make_cloth_norm_state)
    from mgn_tpu.train.common import FieldSpec

    on_tpu = jax.default_backend() == "tpu"
    dt_ = jnp.bfloat16 if on_tpu else jnp.float32
    opts = ({"xla_tpu_scoped_vmem_limit_kib": int(_F._VMEM_LIMIT) >> 10}
            if on_tpu else None)

    ds_path = "/tmp/mgn_flag_probe_50x32"
    if not os.path.isfile(os.path.join(ds_path, "meta.json")):
        write_flag_dataset(ds_path, nx=50, ny=32, tl=5, n_train=1,
                           n_valid=1, n_test=1)
    ds = load_dataset(ds_path, is_training=True)
    spec = FieldSpec.from_meta(ds.meta)
    prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec,
                              spatial_reorder=True)
    cc = ClothConfig(
        model=cloth_model_config(ds.meta, latent=128, hidden_layers=2,
                                 mps=15, compute_dtype=dt_, fused=True,
                                 fused_backward=True),
        world_radius=0.05, world_capacity=2048, noise_stddev=0.003,
        norm_steps=0)
    params = init_mgn_multi(jax.random.PRNGKey(0), cc.model)
    norm = make_cloth_norm_state(cc)
    wp = np.asarray(prep.fields["world_pos"])
    cur = jnp.asarray(wp[1])
    vel = jnp.asarray((wp[1] - wp[0]) / (prep.times[1] - prep.times[0]))
    graph = build_cloth_graph(norm, prep.template, cur, vel, cc)

    def loss(p):
        out = apply_mgn_multi(p, graph, cc.model,
                              fused_plan=prep.template.fused_plan)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    attempt("multi_grad_50x32_scopedvmem", lambda: jax.jit(
        jax.grad(loss), compiler_options=opts).lower(params).compile())
    # control in the same process/session: default options must still fail
    attempt("multi_grad_50x32_default_ctrl", lambda: jax.jit(
        jax.grad(loss)).lower(params).compile())

    out = os.path.join(_HERE, "results", "CLOTH_COMPILE4_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    if os.environ.get("MGN_CLOTH_STAGE4"):
        stage4()
    elif os.environ.get("MGN_CLOTH_STAGE3"):
        stage3()
    else:
        main()
