"""DeformingPlate example — 3-D quasi-static solid with a stress output head
(BASELINE.json config 4).  Demonstrates two framework capabilities the
reference lacks: 3-D structured-grid meshes (the reference's create_edges
supports only 1-D/3-D lists and throws on 2-D; ours does all of them) and
``output_mode: absolute`` value heads (stress is predicted directly, not as a
finite-difference derivative).

    python deforming_plate.py train <ds_path> <cp_path>
    python deforming_plate.py eval  <ds_path> <cp_path> <out_path>

Generate synthetic data with
``mgn_tpu.data.synthetic.write_plate_dataset(ds_path)``.
"""

import sys

import optax

from mgn_tpu import eval_network, train_network
from mgn_tpu.utils.metrics import MetricsLogger

HYPERS = dict(mps=15, layer_size=128, hidden_layers=2, norm_steps=1000,
              types_updated=(0, 6), types_noisy=(0,), num_rollouts=10)


def main():
    mode, ds, cp = sys.argv[1], sys.argv[2], sys.argv[3]
    log = MetricsLogger()
    if mode == "train":
        train_network(0.003, optax.adam(1e-4), ds, cp,
                      steps=10_000, checkpoint=1_000, metrics=log, **HYPERS)
    else:
        eval_network(ds, cp, sys.argv[4], solver="euler", mse_steps=(10, 50),
                     metrics=log, **HYPERS)


if __name__ == "__main__":
    main()
