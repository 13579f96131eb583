"""Command-line interface: python -m mgn_tpu <command> ...

The reference is script-driven (no CLI, SURVEY.md §1 L7); this CLI wraps the
common workflows:

    python -m mgn_tpu train <ds_path> <cp_path> [options]
    python -m mgn_tpu eval  <ds_path> <cp_path> <out_path> [options]
    python -m mgn_tpu export <ds_path> <cp_path> <out_file> [options]
    python -m mgn_tpu synth <ds_path> [--family cylinder|airfoil|flag|plate]
    python -m mgn_tpu convert to-h5|inspect|stats ...
    python -m mgn_tpu bench-scaling [num_nodes] [mps]
"""

from __future__ import annotations

import argparse
import sys


def _add_common(p):
    p.add_argument("--mps", type=int, default=15)
    p.add_argument("--layer-size", type=int, default=128)
    p.add_argument("--hidden-layers", type=int, default=2)
    p.add_argument("--types-updated", type=int, nargs="+", default=[0, 5])
    p.add_argument("--types-noisy", type=int, nargs="+", default=[0])
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mgn_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("ds_path")
    t.add_argument("cp_path")
    t.add_argument("--noise", type=float, default=0.02)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--steps", type=int, default=10_000_000)
    t.add_argument("--checkpoint", type=int, default=10_000)
    t.add_argument("--norm-steps", type=int, default=1000)
    t.add_argument("--batchsize", type=int, default=1)
    t.add_argument("--graph-parallel", type=int, default=1,
                   help="shard each mesh over this many devices (power of "
                        "two); the SPMD step uses the boundary-halo exchange "
                        "with comm/compute overlap")
    t.add_argument("--halo-rounds", type=int, default=None,
                   help="processor rounds per halo exchange under graph "
                        "parallelism (k-deep ghost zones; default mps = one "
                        "exchange per forward, 0 = classic per-round)")
    t.add_argument("--telescope-stages", type=int, default=None,
                   help="shrinking telescope stages per deep segment "
                        "(cuts redundant ghost compute ~in half at zero "
                        "extra communication; default none)")
    t.add_argument("--strategy", default="derivative",
                   choices=["derivative", "solver", "shooting"])
    t.add_argument("--tstart", type=float, default=0.0)
    t.add_argument("--dt", type=float, default=0.01)
    t.add_argument("--tstop", type=float, default=1.0)
    t.add_argument("--interval-size", type=int, default=10)
    _add_common(t)

    e = sub.add_parser("eval")
    e.add_argument("ds_path")
    e.add_argument("cp_path")
    e.add_argument("out_path")
    e.add_argument("--solver", default="tsit5_adaptive")
    e.add_argument("--solver-dt", type=float, default=None)
    e.add_argument("--num-rollouts", type=int, default=10)
    e.add_argument("--mse-steps", type=int, nargs="+", default=[])
    e.add_argument("--graph-parallel", type=int, default=1,
                   help="partition each mesh over this many devices and "
                        "roll out sharded (parallel/rollout.py)")
    e.add_argument("--halo-rounds", type=int, default=None,
                   help="processor rounds per halo exchange (see train)")
    e.add_argument("--telescope-stages", type=int, default=None,
                   help="shrinking telescope stages per deep segment "
                        "(see train)")
    _add_common(e)

    x = sub.add_parser("export")
    x.add_argument("ds_path")
    x.add_argument("cp_path")
    x.add_argument("out_file")
    x.add_argument("--solver", default="euler")
    x.add_argument("--num-steps", type=int, default=None,
                   help="save-grid length baked into the artifact "
                        "(default: the test trajectory's length)")
    x.add_argument("--trajectory", type=int, default=0,
                   help="test-split trajectory whose mesh topology to bake")
    x.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (default: current backend)")
    x.add_argument("--graph-parallel", type=int, default=1,
                   help="export the SHARDED (shard_map) rollout over this "
                        "many devices; the artifact requires the same "
                        "device count at the deployment site")
    _add_common(x)

    s = sub.add_parser("synth")
    s.add_argument("ds_path")
    s.add_argument("--family", default="cylinder",
                   choices=["cylinder", "ns", "airfoil", "flag", "plate"])
    s.add_argument("--num-nodes", type=int, default=1900)
    s.add_argument("--tl", type=int, default=100)
    s.add_argument("--n-train", type=int, default=8)
    s.add_argument("--n-valid", type=int, default=2)
    s.add_argument("--n-test", type=int, default=2)

    c = sub.add_parser("convert")
    c.add_argument("rest", nargs=argparse.REMAINDER)

    b = sub.add_parser("bench-scaling")
    b.add_argument("rest", nargs=argparse.REMAINDER)

    args = parser.parse_args(argv)

    if args.cmd == "synth":
        from mgn_tpu.data import synthetic as S

        if args.family == "cylinder":
            S.write_synthetic_dataset(args.ds_path, num_nodes=args.num_nodes,
                                      tl=args.tl, n_train=args.n_train,
                                      n_valid=args.n_valid, n_test=args.n_test)
        elif args.family == "ns":
            # incompressible NS vortex shedding (offline projection solver)
            from mgn_tpu.data.ns import write_ns_dataset

            write_ns_dataset(args.ds_path, num_nodes=args.num_nodes,
                             tl=args.tl, n_train=args.n_train,
                             n_valid=args.n_valid, n_test=args.n_test)
        elif args.family == "airfoil":
            S.write_airfoil_dataset(args.ds_path, num_nodes=args.num_nodes,
                                    tl=args.tl, n_train=args.n_train,
                                    n_valid=args.n_valid, n_test=args.n_test)
        elif args.family == "flag":
            S.write_flag_dataset(args.ds_path, tl=args.tl,
                                 n_train=args.n_train, n_valid=args.n_valid,
                                 n_test=args.n_test)
        else:
            S.write_plate_dataset(args.ds_path, tl=args.tl,
                                  n_train=args.n_train, n_valid=args.n_valid,
                                  n_test=args.n_test)
        print(f"wrote {args.family} dataset to {args.ds_path}")
        return

    if args.cmd == "convert":
        from mgn_tpu.data.convert import main as cmain

        cmain(args.rest)
        return

    if args.cmd == "bench-scaling":
        import runpy

        sys.argv = ["benchmarks/scaling.py"] + args.rest
        runpy.run_path("benchmarks/scaling.py", run_name="__main__")
        return

    import optax

    from mgn_tpu import eval_network, train_network
    from mgn_tpu.train.strategies import (DerivativeTraining, MultipleShooting,
                                          SolverTraining)
    from mgn_tpu.utils.metrics import MetricsLogger

    common = dict(mps=args.mps, layer_size=args.layer_size,
                  hidden_layers=args.hidden_layers,
                  types_updated=tuple(args.types_updated),
                  types_noisy=tuple(args.types_noisy), seed=args.seed,
                  compute_dtype=args.compute_dtype)
    log = MetricsLogger()

    if args.cmd == "export":
        from mgn_tpu import export_simulator
        from mgn_tpu.data.pipeline import load_dataset

        ds = load_dataset(args.ds_path, is_training=False)
        tr = ds.trajectory(args.trajectory)
        num_steps = args.num_steps or len(tr.times)
        if args.graph_parallel > 1:
            from mgn_tpu.serve import export_sharded_simulator

            blob = export_sharded_simulator(
                args.ds_path, args.cp_path, tr.mesh_pos, tr.node_type,
                num_steps=num_steps, cells=tr.cells, edges=tr.edges,
                solver=args.solver, graph_parallel=args.graph_parallel,
                platforms=args.platforms, **common)
        else:
            blob = export_simulator(
                args.ds_path, args.cp_path, tr.mesh_pos, tr.node_type,
                num_steps=num_steps, cells=tr.cells, edges=tr.edges,
                solver=args.solver, platforms=args.platforms, **common)
        with open(args.out_file, "wb") as fh:
            fh.write(blob)
        print(f"wrote {len(blob)} bytes to {args.out_file} "
              f"(num_steps={num_steps}, solver={args.solver})")
        return

    if args.cmd == "train":
        strategy = {
            "derivative": DerivativeTraining(),
            "solver": SolverTraining(args.tstart, args.dt, args.tstop),
            "shooting": MultipleShooting(args.tstart, args.dt, args.tstop,
                                         interval_size=args.interval_size),
        }[args.strategy]
        train_network(args.noise, optax.adam(args.lr), args.ds_path,
                      args.cp_path, training_strategy=strategy,
                      steps=args.steps, checkpoint=args.checkpoint,
                      norm_steps=args.norm_steps, batchsize=args.batchsize,
                      graph_parallel=args.graph_parallel,
                      halo_rounds=args.halo_rounds,
                      telescope_stages=args.telescope_stages,
                      metrics=log, **common)
    else:
        eval_network(args.ds_path, args.cp_path, args.out_path,
                     solver=args.solver, dt=args.solver_dt,
                     num_rollouts=args.num_rollouts,
                     graph_parallel=args.graph_parallel,
                     halo_rounds=args.halo_rounds,
                     telescope_stages=args.telescope_stages,
                     mse_steps=tuple(args.mse_steps), metrics=log, **common)


if __name__ == "__main__":
    main()
