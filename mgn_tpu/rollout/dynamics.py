"""The learned ODE right-hand side du/dt = MGN(u, mesh).

Functional equivalent of the reference's ODE core
(/root/reference/src/solve.jl:101-219): unpack the state slab into target
fields, merge with the frozen non-target inputs, assemble the normalized
graph, run the network, de-normalize each output block, zero non-updated
node types, and (for forced variants) overwrite inflow nodes with ground
truth at the enclosing frame.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from mgn_tpu.core.graph import GraphTemplate
from mgn_tpu.models.mgn import MGNConfig, apply_mgn
from mgn_tpu.train.common import FieldSpec, NormState, assemble_graph, unpack_fields

__all__ = ["make_deriv_fn"]


def make_deriv_fn(
    params: Any,
    model_cfg: MGNConfig,
    norm: NormState,
    template: GraphTemplate,
    spec: FieldSpec,
    non_target_inputs: Dict[str, jax.Array],
    val_mask: jax.Array,  # (N_pad,) float — nodes whose du is applied
    inflow_mask: Optional[jax.Array] = None,  # (N_pad,) bool
    forcing_data: Optional[jax.Array] = None,  # (T, N_pad, F_out) ground truth
    forcing_times: Optional[jax.Array] = None,  # (T,) timestamps of forcing_data
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build ``deriv(y, t) -> du`` over the packed state slab (N_pad, F_out).

    - non-target dynamic fields stay frozen at their initial values, as in the
      reference (``inputs`` built from the initial state,
      /root/reference/src/solve.jl:49-52, :192-196);
    - inflow forcing: nodes in ``inflow_mask`` are overwritten with ground
      truth at the enclosing data frame — the frame whose timestamp is the
      largest ``forcing_times[k] <= t`` (generalizes the reference's
      ``floor(t / dt)`` at /root/reference/src/solve.jl:105-108, :151-152 to
      non-uniform time grids, /root/reference/src/dataset.jl:313-322);
    - output: per-field de-normalized network output, masked by ``val_mask``
      (/root/reference/src/solve.jl:205-218).
    """
    if forcing_times is not None:
        # tolerance so t exactly on a frame time selects that frame despite
        # float roundoff (scaled to the smallest save interval)
        eps = (1e-4 * jnp.min(jnp.diff(forcing_times))
               if forcing_times.shape[0] > 1 else jnp.float32(0.0))

    def frame_of(t: jax.Array) -> jax.Array:
        return jnp.clip(
            jnp.searchsorted(forcing_times, t + eps, side="right") - 1,
            0, forcing_times.shape[0] - 1,
        ).astype(jnp.int32)

    def deriv(y: jax.Array, t: jax.Array) -> jax.Array:
        if forcing_data is not None:
            idx = frame_of(t)
            gt = jax.lax.dynamic_index_in_dim(forcing_data, idx, 0, keepdims=False)
            y = jnp.where(inflow_mask[:, None], gt, y)
        values = dict(non_target_inputs)
        values.update(unpack_fields(y, spec))
        graph = assemble_graph(norm, template, values, spec)
        out = apply_mgn(params, graph, model_cfg,
                        row_offsets=template.row_offsets,
                        fused_plan=template.fused_plan)
        parts = []
        for ti, (f, sl) in enumerate(zip(spec.target_fields,
                                         spec.target_slices())):
            pred = norm.output[f].inverse(out[:, sl])
            if spec.mode(ti) == "absolute":
                # relax toward the predicted value over one save interval:
                # Euler with dt=save_dt lands exactly on the prediction
                assert forcing_times is not None, \
                    "absolute output fields need a save-time grid (forcing_times)"
                k = jnp.minimum(frame_of(t), forcing_times.shape[0] - 2)
                local_dt = jnp.take(forcing_times, k + 1) - jnp.take(forcing_times, k)
                parts.append((pred - y[..., sl]) / local_dt)
            else:
                parts.append(pred)
        du = jnp.concatenate(parts, axis=-1)
        return du * val_mask[:, None]

    return deriv
