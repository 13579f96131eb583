"""CylinderFlow example — training & evaluation driver.

Mirrors the reference example workflow
(/root/reference/examples/cylinder_flow/cylinder_flow.jl): DeepMind-default
hyperparameters (15 MP steps, latent 128, 2 hidden layers, Adam lr 1e-4,
noise 0.02, types_updated [0, 5], types_noisy [0]), with the same four
workflows selectable from the CLI:

    python cylinder_flow.py train-derivative <ds_path> <cp_path>
    python cylinder_flow.py train-solver     <ds_path> <cp_path>
    python cylinder_flow.py eval-euler       <ds_path> <cp_path> <out_path>
    python cylinder_flow.py eval-tsit5       <ds_path> <cp_path> <out_path>

``<ds_path>`` needs meta.json + train/valid/test files (TFRecord or HDF5);
``python -m mgn_tpu.data.synthetic`` compatible synthetic data works too:

    python - <<'PY'
    from mgn_tpu.data.synthetic import write_synthetic_dataset
    write_synthetic_dataset("ds", num_nodes=1900, tl=600, n_train=16,
                            n_valid=2, n_test=2)
    PY
"""

import sys

import optax

from mgn_tpu import (DerivativeTraining, SolverTraining, eval_network,
                     train_network)
from mgn_tpu.utils.metrics import MetricsLogger

HYPERS = dict(
    mps=15,
    layer_size=128,
    hidden_layers=2,
    norm_steps=1000,
    types_updated=(0, 5),
    types_noisy=(0,),
    num_rollouts=10,
)

NOISE = 0.02
LR = 1e-4


def main():
    mode, ds_path, cp_path = sys.argv[1], sys.argv[2], sys.argv[3]
    log = MetricsLogger()
    if mode == "train-derivative":
        train_network(NOISE, optax.adam(LR), ds_path, cp_path,
                      training_strategy=DerivativeTraining(),
                      steps=10_000, checkpoint=1_000, metrics=log, **HYPERS)
    elif mode == "train-solver":
        # fixed-step Euler over 0:0.01:5.99, as in the reference workflow
        train_network(NOISE, optax.adam(LR), ds_path, cp_path,
                      training_strategy=SolverTraining(
                          tstart=0.0, dt=0.01, tstop=5.99, solver="euler"),
                      steps=1_000, checkpoint=100, metrics=log, **HYPERS)
    elif mode == "eval-euler":
        out = sys.argv[4]
        eval_network(ds_path, cp_path, out, solver="euler",
                     mse_steps=(50, 100, 300, 599), metrics=log, **HYPERS)
    elif mode == "eval-tsit5":
        out = sys.argv[4]
        eval_network(ds_path, cp_path, out, solver="tsit5_adaptive",
                     mse_steps=(50, 100, 300, 599), metrics=log, **HYPERS)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
