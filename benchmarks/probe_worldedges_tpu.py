"""Decompose the cloth training step's 35 ms (round-4, CLOTH_r04.json).

The fused cloth path ties the unfused one (0.99x) and BOTH cost ~16x the
cylinder step at similar mesh size, so the bottleneck is outside the
message-passing kernels.  Suspect: ``core.graph.build_world_edges`` runs
TWICE per step (normalizer accumulation + graph build) and compacts an
(N^2,) hit mask into the fixed buffer with two 2.77M-element scatters — the
TPU scatter unit serializes those.

Measures (interleaved, trusted methodology):
- the current build_world_edges alone,
- a top_k-based compaction variant (sort-free scatter of only `capacity`
  elements),
- the full cloth one-step body with the world build replaced by constants
  (attribution), vs the real step.

Writes benchmarks/results/WORLDEDGES_probe.json.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np

N = int(os.environ.get("MGN_PROBE_N", 1664))
CAP = int(os.environ.get("MGN_PROBE_CAP", 2048))
REPS = int(os.environ.get("MGN_PROBE_REPS", 20))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(_HERE), ".jax_cache"))
    import jax.numpy as jnp

    from mgn_tpu.core.graph import build_world_edges

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    pos3 = jnp.asarray(rng.random((N, 3)) * [0.5, 0.5, 0.05], jnp.float32)
    mask = jnp.asarray(np.ones(N, bool))
    radius = 0.05

    def topk_variant(world_pos, node_mask, radius, capacity):
        n = world_pos.shape[0]
        d2 = jnp.sum((world_pos[:, None, :] - world_pos[None, :, :]) ** 2, -1)
        valid = node_mask[:, None] & node_mask[None, :]
        hit = (d2 < radius * radius) & valid & ~jnp.eye(n, dtype=bool)
        flat = hit.reshape(-1)
        # rank hits first, earliest index first: one top_k, then a
        # capacity-sized gather — no multi-million-element scatter
        key = jnp.where(flat, -jnp.arange(n * n, dtype=jnp.int32),
                        jnp.iinfo(jnp.int32).min)
        _, idx = jax.lax.top_k(key, capacity)
        got = flat[idx]
        senders = (idx // n).astype(jnp.int32)
        receivers = (idx % n).astype(jnp.int32)
        count = jnp.minimum(jnp.sum(flat), capacity)
        m = jnp.arange(capacity) < count
        return (jnp.where(m, senders, 0), jnp.where(m, receivers, 0), m)

    def timed_all(fns, args_of):
        for name, fn in fns.items():
            fns[name] = jax.jit(fn)
            jax.device_get(fns[name](*args_of(name)))  # compile
        best = {name: float("inf") for name in fns}
        for _ in range(6):
            for name, fn in fns.items():
                a = args_of(name)
                t0 = time.perf_counter()
                for _ in range(REPS):
                    o = fn(*a)
                jax.device_get(o)
                best[name] = min(best[name],
                                 (time.perf_counter() - t0) / REPS)
        return {k: round(v * 1e3, 4) for k, v in best.items()}

    def scatter_old(world_pos, node_mask, radius, capacity):
        """The pre-round-4 implementation (broadcast d2 + two N^2 scatters),
        kept inline as the A/B baseline."""
        n = world_pos.shape[0]
        d2 = jnp.sum(
            (world_pos[:, None, :] - world_pos[None, :, :]) ** 2, axis=-1)
        valid = node_mask[:, None] & node_mask[None, :]
        hit = (d2 < radius * radius) & valid & ~jnp.eye(n, dtype=bool)
        flat = hit.reshape(-1)
        pos = jnp.cumsum(flat) - 1
        slot = jnp.where(flat & (pos < capacity), pos, capacity)
        src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), n)
        dst = jnp.tile(jnp.arange(n, dtype=jnp.int32), n)
        senders = jnp.zeros((capacity + 1,), jnp.int32).at[slot].set(
            src, mode="drop")
        receivers = jnp.zeros((capacity + 1,), jnp.int32).at[slot].set(
            dst, mode="drop")
        count = jnp.minimum(jnp.sum(flat), capacity)
        mask = jnp.arange(capacity) < count
        return senders[:capacity], receivers[:capacity], mask

    fns = {
        "scatter_old": lambda p, m: scatter_old(p, m, radius, CAP),
        "current": lambda p, m: build_world_edges(p, m, radius, CAP),
        "topk": lambda p, m: topk_variant(p, m, radius, CAP),
    }
    iso = timed_all(fns, lambda name: (pos3, mask))
    # equality of the two compactions (sets of (s,r) pairs)
    s1, r1, m1 = jax.jit(lambda: scatter_old(pos3, mask, radius, CAP))()
    s2, r2, m2 = jax.jit(lambda: build_world_edges(pos3, mask, radius,
                                                   CAP))()
    set1 = {(int(a), int(b)) for a, b, mm in
            zip(np.asarray(s1), np.asarray(r1), np.asarray(m1)) if mm}
    set2 = {(int(a), int(b)) for a, b, mm in
            zip(np.asarray(s2), np.asarray(r2), np.asarray(m2)) if mm}
    # attribution at the real flag shapes: model fwd+bwd alone vs the full
    # trainer step (difference = world builds + norm accumulation + glue)
    attrib = {}
    try:
        import optax

        from mgn_tpu.data.pipeline import load_dataset
        from mgn_tpu.data.prep import prepare_trajectory
        from mgn_tpu.data.synthetic import write_flag_dataset
        from mgn_tpu.models.mgn_multi import (apply_mgn_multi,
                                              init_mgn_multi)
        from mgn_tpu.train.cloth import (ClothConfig, build_cloth_graph,
                                         jit_cloth_trainer,
                                         cloth_model_config,
                                         make_cloth_norm_state,
                                         make_cloth_trainer)
        from mgn_tpu.train.common import FieldSpec, TrainState

        ds_path = "/tmp/mgn_flag_probe_50x32"
        if not os.path.isfile(os.path.join(ds_path, "meta.json")):
            write_flag_dataset(ds_path, nx=50, ny=32, tl=5, n_train=1,
                               n_valid=1, n_test=1)
        ds = load_dataset(ds_path, is_training=True)
        spec = FieldSpec.from_meta(ds.meta)
        prep = prepare_trajectory(ds.trajectory(0), ds.meta, spec,
                                  spatial_reorder=True)
        dt_ = jnp.bfloat16 if on_tpu else jnp.float32
        cc = ClothConfig(
            model=cloth_model_config(ds.meta, latent=128, hidden_layers=2,
                                     mps=15, compute_dtype=dt_, fused=True,
                                     fused_backward=False),
            world_radius=0.05, world_capacity=CAP, noise_stddev=0.003,
            norm_steps=0)
        params = init_mgn_multi(jax.random.PRNGKey(0), cc.model)
        norm = make_cloth_norm_state(cc)
        wp = np.asarray(prep.fields["world_pos"])
        cur = jnp.asarray(wp[1])
        vel = jnp.asarray((wp[1] - wp[0]) / (prep.times[1] - prep.times[0]))
        graph = build_cloth_graph(norm, prep.template, cur, vel, cc)

        def model_grad(p):
            def loss(p_):
                out = apply_mgn_multi(p_, graph, cc.model,
                                      fused_plan=prep.template.fused_plan)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            return jax.grad(loss)(p)

        opt = optax.adam(1e-4)
        trainer = jit_cloth_trainer(cc, opt)
        st = TrainState(params=params, opt_state=opt.init(params),
                        norm=norm, step=jnp.zeros((), jnp.int32))
        perm1 = jnp.asarray([1], jnp.int32)

        mg = jax.jit(model_grad)
        jax.device_get(mg(params))
        jax.device_get(trainer(st, prep.template,
                               prep.fields["world_pos"], prep.times,
                               perm1, jax.random.PRNGKey(0))[1])
        bests = {"model_fwd_bwd": float("inf"), "full_step": float("inf")}
        for _ in range(6):
            t0 = time.perf_counter()
            for _ in range(4):
                g = mg(params)
            jax.device_get(g)
            bests["model_fwd_bwd"] = min(bests["model_fwd_bwd"],
                                         (time.perf_counter() - t0) / 4)
            t0 = time.perf_counter()
            s2_ = st
            for _ in range(4):
                s2_, losses = trainer(s2_, prep.template,
                                      prep.fields["world_pos"], prep.times,
                                      perm1, jax.random.PRNGKey(0))
            jax.device_get(losses)
            bests["full_step"] = min(bests["full_step"],
                                     (time.perf_counter() - t0) / 4)
        attrib = {k: round(v * 1e3, 3) for k, v in bests.items()}
        attrib["non_model_ms"] = round(
            (bests["full_step"] - bests["model_fwd_bwd"]) * 1e3, 3)
    except Exception as ex:
        attrib = {"error": str(ex)[:300]}

    results = {"backend": jax.default_backend(),
               "n": N, "capacity": CAP,
               "ms_isolated": iso,
               "ms_attrib": attrib,
               "hits": len(set1),
               "sets_equal": set1 == set2}
    print(json.dumps(results), flush=True)
    out = os.path.join(_HERE, "results", "WORLDEDGES_probe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
