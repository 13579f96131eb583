"""mgn_tpu — a TPU-native MeshGraphNets framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of
una-auxme/MeshGraphNets.jl (see SURVEY.md): meta.json-driven datasets
(TFRecord/HDF5), Encode-Process-Decode mesh GNNs with Pallas message-passing
kernels, derivative / NeuralODE-solver / multiple-shooting training,
Euler/RK/adaptive-Tsit5 rollouts with inflow forcing, checkpoint/resume, and
multi-chip scaling via jax.sharding.

Public API parity with the reference's exports
(/root/reference/src/MeshGraphNets.jl:31-33): ``train_network``,
``eval_network``, ``der_minmax``, ``data_meanstd``, ``DerivativeTraining``,
``SolverTraining``, ``MultipleShooting`` — plus the TPU-native extensions.
"""

from mgn_tpu.api import eval_network, simulate, train_network
from mgn_tpu.config import Args
from mgn_tpu.serve import (export_cloth_simulator, export_simulator,
                           load_simulator)
from mgn_tpu.train.strategies import (DerivativeTraining, MultipleShooting,
                                      SolverTraining)
from mgn_tpu.utils.stats import data_meanstd, der_minmax

__version__ = "0.1.0"

__all__ = [
    "train_network",
    "eval_network",
    "simulate",
    "export_cloth_simulator",
    "export_simulator",
    "load_simulator",
    "der_minmax",
    "data_meanstd",
    "DerivativeTraining",
    "SolverTraining",
    "MultipleShooting",
    "Args",
    "__version__",
]
