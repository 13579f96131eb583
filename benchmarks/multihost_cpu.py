"""Real 2-process ``jax.distributed`` execution of the SPMD training path.

Round-5 verdict item 6: ``parallel/mesh.initialize_multihost`` and the
multi-host story had never executed across an actual process boundary — the
8-device dryrun is a single process, so per-process device lists, cross-
process collectives (gloo CPU backend), global-array ``device_put``, and
rank-0-only checkpoint writes were unprobed.

This harness launches TWO local processes (pure-CPU escape hatch, 4 virtual
devices each -> one global (2, 4) ("data", "graph") mesh), runs the standard
SPMD derivative step for a few windows with cross-process psum, has rank 0
(and only rank 0) write + restore an orbax checkpoint, and compares the loss
trajectory against an identically-configured SINGLE-process 8-device run.

    python benchmarks/multihost_cpu.py          # parent: runs everything

Artifact: benchmarks/results/MULTIHOST_2PROC_r05.json
"""

import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORK = os.environ.get("MGN_MH_WORK", "/tmp/mgn_multihost_r05")
DS = os.path.join(WORK, "ds")
STEPS_WINDOWS = int(os.environ.get("MGN_MH_WINDOWS", 6))
WINDOW = 10


def worker():
    """One training process (rank taken from the JAX env contract)."""
    # distributed init MUST precede anything that touches the XLA backend;
    # importing mgn_tpu is safe since round 5 (the Tsit5 Butcher constants
    # were the one module-scope jnp.array — now numpy)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mgn_tpu.parallel.mesh import initialize_multihost

    initialize_multihost()  # JAX_COORDINATOR_ADDRESS/... env contract
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mgn_tpu.core import normalizers as N
    from mgn_tpu.core.graph import cells_to_edges
    from mgn_tpu.data.pipeline import load_dataset
    from mgn_tpu.models.mgn import MGNConfig, init_mgn
    from mgn_tpu.parallel.partition import add_halo_plan, partition_template
    from mgn_tpu.parallel.spmd import (batch_from_partitioned,
                                       device_put_batch, make_device_mesh,
                                       make_spmd_derivative_step)
    from mgn_tpu.train.common import FieldSpec, NormState, TrainState

    rank = jax.process_index()
    n_proc = jax.process_count()
    devs = jax.devices()
    print(f"[rank {rank}/{n_proc}] global devices: {len(devs)} "
          f"local: {jax.local_device_count()}", flush=True)
    assert len(devs) == 8, f"expected 8 global devices, got {len(devs)}"

    mesh = make_device_mesh(2, 4)
    ds = load_dataset(DS, is_training=True)
    meta = ds.meta
    spec = FieldSpec.from_meta(meta)
    quantities, e_norm, n_norms, o_norms = N.normalizers_from_meta(meta)
    cfg = MGNConfig(node_input_dim=quantities, edge_input_dim=3,
                    output_dim=spec.output_dim, latent_size=32,
                    hidden_layers=1, message_passing_steps=4,
                    aggregation_backend="xla")
    opt = optax.adam(1e-3)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       norm=NormState(edge=e_norm, node=n_norms,
                                      output=o_norms),
                       step=jnp.zeros((), jnp.int32))

    # partition both trajectories of the data axis once (every process runs
    # the identical host-side partitioning — deterministic numpy)
    pts, fls, tms = [], [], []
    for i in range(2):
        tr = ds.trajectory(i)
        s, r = cells_to_edges(tr.cells)
        pt = add_halo_plan(partition_template(tr.mesh_pos, tr.node_type,
                                              s, r, 4))
        pts.append(pt)
        fls.append({f: tr.fields[f] for f in spec.fields})
        tms.append(tr.times)
    batch, bs, _ = batch_from_partitioned(pts, fls, tms)
    tree = device_put_batch(mesh, batch.tree())  # global-array placement
    step = make_spmd_derivative_step(mesh, cfg, spec, opt,
                                     noise_stddevs=(0.0,), norm_steps=5,
                                     boundary_start=bs)
    rng = np.random.default_rng(0)
    n_frames = [len(t) - 1 for t in tms]
    losses = []
    for it in range(STEPS_WINDOWS):
        perms = np.stack([rng.permutation(nf)[:WINDOW] for nf in n_frames],
                         1)
        state, ls = step(state, tree, jnp.asarray(perms, jnp.int32),
                         jax.random.PRNGKey(it))
        # losses are fully replicated -> addressable on every process
        losses.extend(float(x) for x in np.asarray(jax.device_get(ls)))
    print(f"[rank {rank}] final loss {losses[-1]:.6f}", flush=True)

    # checkpointing in multi-process: EVERY rank must participate — orbax
    # synchronizes processes inside save() (sync_global_devices barriers),
    # so the naive rank-0-only save deadlocks/mismatches against ranks that
    # skip it.  This harness originally tried rank-0-only and hit
    # "sync_global_devices name mismatch ('_Checkpointer:save_start')" —
    # the exact process-boundary bug class round-5 verdict item 6 predicted.
    # The correct pattern (below): all ranks call save with identical
    # host-side state; orbax's primary process does the actual write.
    from mgn_tpu.checkpoint.manager import CheckpointManager

    host_state = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                              state)
    cp = os.path.join(WORK, f"cp_{n_proc}proc")
    mgr = CheckpointManager(cp)
    mgr.save(host_state, float(losses[-1]))
    restored = CheckpointManager(cp).restore(host_state)
    ckpt_ok = restored is not None and int(restored[0].step) == int(
        state.step)
    print(f"[rank {rank}] checkpoint roundtrip ok={ckpt_ok}", flush=True)

    out = {"rank": rank, "n_proc": n_proc, "losses": losses,
           "global_devices": len(devs),
           "local_devices": jax.local_device_count(),
           "checkpoint_roundtrip": ckpt_ok}
    with open(os.path.join(WORK, f"worker_{n_proc}proc_r{rank}.json"),
              "w") as f:
        json.dump(out, f)
    if n_proc > 1:
        # exit together: the coordination service's shutdown barrier aborts
        # the job if one rank exits while another still works (rank 0's
        # checkpoint write) — the real-world rank-0-only-writer lesson this
        # harness exists to surface
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mgn_multihost_done")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def parent():
    os.makedirs(WORK, exist_ok=True)
    from mgn_tpu.data.synthetic import write_synthetic_dataset

    if not os.path.exists(os.path.join(DS, "meta.json")):
        write_synthetic_dataset(DS, num_nodes=96, tl=20, n_train=2,
                                n_valid=1, n_test=1)

    base_env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                    MGN_MH_ROLE="worker")

    def run(n_proc, per_proc_devs):
        port = _free_port()
        procs = []
        for rank in range(n_proc):
            env = dict(
                base_env,
                XLA_FLAGS=("--xla_force_host_platform_device_count="
                           f"{per_proc_devs}"),
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES=str(n_proc),
                JAX_PROCESS_ID=str(rank))
            log = open(os.path.join(WORK, f"log_{n_proc}proc_r{rank}.txt"),
                       "w")
            procs.append((subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)], env=env,
                cwd=REPO, stdout=log, stderr=subprocess.STDOUT), log))
        rcs = []
        for p, log in procs:
            rcs.append(p.wait(timeout=900))
            log.close()
        return rcs

    print("single-process reference (8 devices) ...", flush=True)
    t0 = time.time()
    rc1 = run(1, 8)
    print(f"  rc={rc1} {time.time()-t0:.1f}s", flush=True)
    print("2-process run (4 devices each, gloo collectives) ...", flush=True)
    t0 = time.time()
    rc2 = run(2, 4)
    print(f"  rc={rc2} {time.time()-t0:.1f}s", flush=True)

    with open(os.path.join(WORK, "worker_1proc_r0.json")) as f:
        ref = json.load(f)
    with open(os.path.join(WORK, "worker_2proc_r0.json")) as f:
        two0 = json.load(f)
    with open(os.path.join(WORK, "worker_2proc_r1.json")) as f:
        two1 = json.load(f)

    import numpy as np

    l_ref = np.asarray(ref["losses"])
    l_two = np.asarray(two0["losses"])
    rel = float(np.max(np.abs(l_ref - l_two) / np.maximum(np.abs(l_ref),
                                                          1e-9)))
    ranks_agree = float(np.max(np.abs(
        np.asarray(two0["losses"]) - np.asarray(two1["losses"]))))
    result = {
        "workload": "96-node synthetic cylinder, mps=4 latent=32, "
                    f"(2,4) mesh, {STEPS_WINDOWS} windows x {WINDOW} steps",
        "single_process": {"rc": rc1, "final_loss": l_ref[-1],
                           "checkpoint_roundtrip":
                               ref["checkpoint_roundtrip"]},
        "two_process": {"rc": rc2, "final_loss": l_two[-1],
                        "global_devices": two0["global_devices"],
                        "local_devices_per_proc": two0["local_devices"],
                        "checkpoint_roundtrip_rank0":
                            two0["checkpoint_roundtrip"],
                        "checkpoint_roundtrip_rank1":
                            two1["checkpoint_roundtrip"]},
        "finding": ("rank-0-only orbax saves FAIL across processes "
                    "(sync_global_devices name mismatch at "
                    "_Checkpointer:save_start) — orbax synchronizes inside "
                    "save(); every rank must call it and the primary "
                    "process writes"),
        "loss_match_max_rel_err": rel,
        "ranks_replicated_loss_max_abs_diff": ranks_agree,
        "ok": bool(rc1 == [0] and rc2 == [0, 0] and rel < 1e-3
                   and ref["checkpoint_roundtrip"]
                   and two0["checkpoint_roundtrip"]),
    }
    path = os.path.join(HERE, "results", "MULTIHOST_2PROC_r05.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("MULTIHOST_2PROC", json.dumps(
        {k: result[k] for k in ("loss_match_max_rel_err", "ok")}),
        flush=True)


if __name__ == "__main__":
    if os.environ.get("MGN_MH_ROLE") == "worker":
        worker()
    else:
        parent()
