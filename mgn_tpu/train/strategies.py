"""Training strategies (pluggable, as in the reference).

The reference dispatches on an abstract ``TrainingStrategy`` with hooks
``prepare_training`` / ``get_delta`` / ``init_train_step`` / ``train_step`` /
``validation_step`` (/root/reference/src/strategies.jl:13-94).  Here a strategy
is a frozen config dataclass; the hook logic lives in jitted trainers keyed by
strategy type (:mod:`mgn_tpu.train.derivative`, :mod:`mgn_tpu.train.solver`) —
data-dependent Python dispatch per step would defeat XLA.

Concrete strategies (parameter semantics match the reference):

- :class:`DerivativeTraining` — 1-step training on finite-difference targets
  (/root/reference/src/strategies.jl:389-447).
- :class:`SolverTraining` — NeuralODE training, backprop through the full
  rollout (/root/reference/src/strategies.jl:238-292).  Discrete adjoint via
  AD-through-``lax.scan`` with remat (the role of the checkpointed
  InterpolatingAdjoint at :247-255); fixed-step solvers.
- :class:`MultipleShooting` — windowed solves from ground-truth initial
  conditions + continuity penalty (/root/reference/src/strategies.jl:312-383).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

__all__ = ["DerivativeTraining", "SolverTraining", "MultipleShooting",
           "TrainingStrategy", "get_delta"]


@dataclasses.dataclass(frozen=True)
class DerivativeTraining:
    """window_size=0 -> use the whole trajectory; random shuffles timesteps
    (/root/reference/src/strategies.jl:441-447)."""

    window_size: int = 0
    random: bool = True


@dataclasses.dataclass(frozen=True)
class SolverTraining:
    """Full-trajectory NeuralODE training over ``tstart:dt:tstop``.

    ``solver`` is a fixed-step method name from
    :data:`mgn_tpu.rollout.integrators.FIXED_METHODS` or
    ``'tsit5_adaptive'`` — differentiable bounded-budget adaptive Tsit5
    (:func:`mgn_tpu.rollout.integrators.odeint_tsit5_bounded`; the role of
    the reference's AD through adaptive OrdinaryDiffEq solvers,
    /root/reference/src/strategies.jl:247-263).  ``solver_dt`` defaults to
    ``dt`` (one fixed step per save interval); ``adaptive_substeps`` bounds
    the controller steps per save interval and ``rtol``/``atol`` are its
    tolerances (the reference's ``solargs``).
    """

    tstart: float
    dt: float
    tstop: float
    solver: str = "euler"
    solver_dt: Optional[float] = None
    remat: bool = True
    adaptive_substeps: int = 8
    rtol: float = 1e-4
    atol: float = 1e-6


@dataclasses.dataclass(frozen=True)
class MultipleShooting:
    """SolverTraining over overlapping windows of ``interval_size`` save points
    (stride ``interval_size - 1``), each started from ground truth, plus an L1
    continuity penalty between a window's end state and the next window's
    ground-truth start (reference semantics incl. penalizing vs data, not vs
    prediction: /root/reference/src/strategies.jl:365-380)."""

    tstart: float
    dt: float
    tstop: float
    interval_size: int = 10
    continuity_term: float = 100.0
    solver: str = "euler"  # FIXED_METHODS name or 'tsit5_adaptive'
    solver_dt: Optional[float] = None
    remat: bool = True
    adaptive_substeps: int = 8
    rtol: float = 1e-4
    atol: float = 1e-6


TrainingStrategy = Union[DerivativeTraining, SolverTraining, MultipleShooting]


def get_delta(strategy: TrainingStrategy, trajectory_length: int) -> int:
    """Steps consumed per trajectory visit
    (/root/reference/src/strategies.jl:142-144, :391-393)."""
    if isinstance(strategy, DerivativeTraining):
        return strategy.window_size if strategy.window_size > 0 else trajectory_length - 1
    return 1
