"""Navier-Stokes vortex shedding — the north-star physics workflow.

The reference's de-facto validation workload is vortex shedding past a
cylinder (DeepMind's CylinderFlow dataset driven by
/root/reference/examples/cylinder_flow/cylinder_flow.jl).  This example
reproduces that regime end-to-end with NO external dataset: the built-in
incompressible-NS projection solver (``mgn_tpu.data.ns``) generates the
trajectories offline on CPU, and the standard entry points train and
evaluate on them.

    python ns_vortex.py synth <ds_path>            # ~30 min CPU, 38 trajs
    python ns_vortex.py train <ds_path> <cp_path>
    python ns_vortex.py eval  <ds_path> <cp_path> <out_path>

The on-chip convergence artifact for this workload is
``benchmarks/results/ACCURACY_ns_r05.json`` (200k steps; rollout cum-RMSE
vs BOTH a persistence baseline and a frozen-advection oracle — beating the
oracle is the evidence the model learned the nonlinear wake dynamics, not
translation).
"""

import sys

import optax

from mgn_tpu import eval_network, train_network
from mgn_tpu.utils.metrics import MetricsLogger

HYPERS = dict(
    mps=15, layer_size=128, hidden_layers=2, norm_steps=1000,
    types_updated=(0, 5), types_noisy=(0,), num_rollouts=4,
    compute_dtype="bfloat16",
)


def main():
    mode, ds_path = sys.argv[1], sys.argv[2]
    log = MetricsLogger()
    if mode == "synth":
        from mgn_tpu.data.ns import write_ns_dataset

        write_ns_dataset(ds_path, num_nodes=1900, tl=600, n_train=32,
                         n_valid=2, n_test=4)
        return
    cp_path = sys.argv[3]
    if mode == "train":
        train_network(0.02, optax.adam(1e-4), ds_path, cp_path,
                      metrics=log, steps=200_000, checkpoint=10_000,
                      **HYPERS)
    else:
        out_path = sys.argv[4]
        reports = eval_network(ds_path, cp_path, out_path, solver="euler",
                               mse_steps=(50, 100, 300, 599), metrics=log,
                               **HYPERS)
        for i, r in enumerate(reports):
            print(f"trajectory {i}: final_rmse={r['final_rmse']:.4e}")


if __name__ == "__main__":
    main()
