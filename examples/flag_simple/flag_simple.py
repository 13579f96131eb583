"""FlagSimple example — cloth with 3-D world dynamics and dynamic world edges
(BASELINE.json config 3).

Since round 5 the cloth family is driven by the SAME top-level entry points
as every other dataset (``train_network`` / ``eval_network`` dispatch on the
meta.json ``world_edges`` key — mgn_tpu/api_cloth.py), so this example is
pure configuration, exactly like the reference's example driver
(/root/reference/examples/cylinder_flow/cylinder_flow.jl):

    python flag_simple.py train <ds_path> <cp_path> [--graph-parallel N]
    python flag_simple.py eval  <ds_path> <cp_path> <out_path> [--graph-parallel N]

Equivalently: ``python -m mgn_tpu train/eval ... --types-updated 0``.
Generate synthetic data with
``mgn_tpu.data.synthetic.write_flag_dataset(ds_path)`` or
``python -m mgn_tpu synth <ds_path> --family flag``.
"""

import sys

import optax

from mgn_tpu import eval_network, train_network
from mgn_tpu.utils.metrics import MetricsLogger

HYPERS = dict(
    mps=15, layer_size=128, hidden_layers=2,
    types_updated=(0,),       # NORMAL cloth nodes; type 3 = pinned handle
    types_noisy=(0,),
    norm_steps=1000,
)


def main():
    mode, ds_path, cp_path = sys.argv[1], sys.argv[2], sys.argv[3]
    graph_parallel = 1
    if "--graph-parallel" in sys.argv:
        graph_parallel = int(sys.argv[sys.argv.index("--graph-parallel") + 1])
    log = MetricsLogger()
    if mode == "train":
        train_network(0.003, optax.adam(1e-4), ds_path, cp_path,
                      metrics=log, steps=100_000, checkpoint=5_000,
                      graph_parallel=graph_parallel, **HYPERS)
    else:
        out_path = sys.argv[4] if len(sys.argv) > 4 else cp_path + "_out"
        reports = eval_network(ds_path, cp_path, out_path, metrics=log,
                               mse_steps=(10, 30, 100),
                               graph_parallel=graph_parallel, **HYPERS)
        for i, r in enumerate(reports):
            print(f"trajectory {i}: final_rmse={r['final_rmse']:.4e}")


if __name__ == "__main__":
    main()
