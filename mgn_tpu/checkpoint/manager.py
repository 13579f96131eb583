"""Checkpoint / resume (orbax-backed).

Covers the reference's GraphNetCore ``save!``/``load`` checkpointing (call
sites /root/reference/src/MeshGraphNets.jl:282-289, :459-474): params,
optimizer state, **normalizer accumulators**, and step, plus train/valid loss
history — in two streams: periodic training checkpoints at the root and
best-validation checkpoints under ``valid/``.  Training resumes from the last
recorded step (/root/reference/src/MeshGraphNets.jl:324-332).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from mgn_tpu.train.common import TrainState

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Dual-stream checkpoint manager for one training run."""

    def __init__(self, path: str, keep: int = 3):
        self.root = os.path.abspath(path)
        self.valid_dir = os.path.join(self.root, "valid")
        os.makedirs(self.root, exist_ok=True)
        os.makedirs(self.valid_dir, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    # --- internals -----------------------------------------------------------

    @staticmethod
    def _steps(d: str) -> List[int]:
        out = []
        if os.path.isdir(d):
            for name in os.listdir(d):
                m = re.fullmatch(r"step_(\d+)", name)
                if m and os.path.isdir(os.path.join(d, name)):
                    out.append(int(m.group(1)))
        return sorted(out)

    def _history_path(self, best: bool) -> str:
        return os.path.join(self.valid_dir if best else self.root, "history.json")

    def _load_history(self, best: bool) -> List[Dict[str, float]]:
        p = self._history_path(best)
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return []

    # --- public API ----------------------------------------------------------

    def save(self, state: TrainState, loss: float, best: bool = False) -> str:
        """Save a checkpoint; appends (step, loss) to the stream's history.

        Two payloads per step: ``full`` (everything, for resume) and ``model``
        (params+normalizers+step, restorable without knowing the optimizer —
        the reference's eval path likewise rebuilds without one,
        /root/reference/src/MeshGraphNets.jl:529-541).
        """
        d = self.valid_dir if best else self.root
        step = int(jax.device_get(state.step))
        target = os.path.join(d, f"step_{step}")
        if os.path.exists(target):
            shutil.rmtree(target)
        self._ckptr.save(os.path.join(target, "full"), state)
        self._ckptr.save(os.path.join(target, "model"), self.model_subtree(state))
        self._ckptr.wait_until_finished()
        hist = self._load_history(best)
        hist.append({"step": step, "loss": float(loss)})
        with open(self._history_path(best), "w") as f:
            json.dump(hist, f)
        for old in self._steps(d)[: -self.keep]:
            shutil.rmtree(os.path.join(d, f"step_{old}"), ignore_errors=True)
        return target

    def latest_step(self, best: bool = False) -> Optional[int]:
        steps = self._steps(self.valid_dir if best else self.root)
        return steps[-1] if steps else None

    def restore(
        self, abstract_state: TrainState, best: bool = False
    ) -> Optional[Tuple[TrainState, List[Dict[str, float]]]]:
        """Restore the newest checkpoint of a stream (None if empty).

        ``abstract_state`` provides the pytree structure/shapes (e.g. a freshly
        initialized TrainState).
        """
        step = self.latest_step(best)
        if step is None:
            return None
        target = os.path.join(self.valid_dir if best else self.root,
                              f"step_{step}", "full")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        state = self._ckptr.restore(target, abstract)
        return state, self._load_history(best)

    @staticmethod
    def model_subtree(state: TrainState) -> Dict[str, Any]:
        return {"params": state.params, "norm": state.norm, "step": state.step}

    def restore_model(
        self, abstract_model: Dict[str, Any], best: bool = False
    ) -> Optional[Dict[str, Any]]:
        """Restore only params/normalizers/step (for evaluation)."""
        step = self.latest_step(best)
        if step is None:
            return None
        target = os.path.join(self.valid_dir if best else self.root,
                              f"step_{step}", "model")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_model)
        return self._ckptr.restore(target, abstract)

    def best_loss(self) -> float:
        """Best (last recorded) validation loss, Inf if none
        (resume floor semantics of /root/reference/src/MeshGraphNets.jl:327-332)."""
        hist = self._load_history(best=True)
        return float(hist[-1]["loss"]) if hist else float("inf")
