"""Airfoil example — compressible flow with velocity + density targets
(BASELINE.json config 2).  Uses the generic derivative-training path; the
multi-target output head (velocity dim 2 + density dim 1) is sized from
meta.json automatically.

    python airfoil.py train <ds_path> <cp_path>
    python airfoil.py eval  <ds_path> <cp_path> <out_path>

Generate synthetic data with
``mgn_tpu.data.synthetic.write_airfoil_dataset(ds_path)``.
"""

import sys

import optax

from mgn_tpu import eval_network, train_network
from mgn_tpu.utils.metrics import MetricsLogger

HYPERS = dict(mps=15, layer_size=128, hidden_layers=2, norm_steps=1000,
              types_updated=(0, 5), types_noisy=(0,), num_rollouts=10)


def main():
    mode, ds, cp = sys.argv[1], sys.argv[2], sys.argv[3]
    log = MetricsLogger()
    if mode == "train":
        # per-field noise: velocity 10.0, density 0.01 (airfoil-style scales)
        train_network((10.0, 0.01), optax.adam(1e-4), ds, cp,
                      steps=10_000, checkpoint=1_000, metrics=log, **HYPERS)
    else:
        eval_network(ds, cp, sys.argv[4], solver="euler",
                     mse_steps=(50, 100, 300), metrics=log, **HYPERS)


if __name__ == "__main__":
    main()
