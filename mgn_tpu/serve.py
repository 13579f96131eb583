"""AOT export of the learned simulator (``jax.export``).

``export_simulator`` compiles the pure autoregressive rollout (the serving
path of :func:`mgn_tpu.simulate` — no dataset, no ground-truth forcing) into
a self-contained serialized artifact: StableHLO with the trained weights,
normalizer state, graph template, and node permutation baked in as
constants.  ``load_simulator`` turns the bytes back into a callable — no
model code, checkpoint, or meta.json needed at the deployment site, only
jax.  This is a capability the reference has no analogue for (its eval entry
always needs the full Julia stack + checkpoint directory,
/root/reference/src/MeshGraphNets.jl:507-548).

The artifact is lowered for explicit ``platforms`` (default: the current
backend).  Exporting on the target backend bakes that backend's fast path
(on TPU: the fused Pallas round kernel as a serialized custom call).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_simulator", "export_cloth_simulator", "load_simulator"]


def export_simulator(
    meta_dir: str,
    cp_path: str,
    mesh_pos: np.ndarray,
    node_type: np.ndarray,
    num_steps: int,
    cells: Optional[np.ndarray] = None,
    edges: Optional[np.ndarray] = None,
    solver: str = "euler",
    platforms: Optional[Sequence[str]] = None,
    **kwargs: Any,
) -> bytes:
    """Serialize the simulator for one mesh topology.

    The exported function has signature ``(times, *initial_fields) -> pred``
    with ``times`` of shape ``(num_steps,)`` (``times[0]`` = initial time),
    each initial field ``(N, dim)`` in the caller's node order, and ``pred``
    of shape ``(num_steps, N, output_dim)`` — permutation and padding happen
    inside the artifact.
    """
    import optax

    from mgn_tpu.api import init_state
    from mgn_tpu.checkpoint.manager import CheckpointManager
    from mgn_tpu.config import Args
    from mgn_tpu.data.meta import load_meta
    from mgn_tpu.data.pipeline import Trajectory
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.rollout.evaluate import make_rollout_fn

    args = Args(**kwargs).resolve_auto()
    meta = load_meta(meta_dir)
    state, model_cfg, spec = init_state(meta, args, optax.sgd(1.0))
    ckpt = CheckpointManager(cp_path)
    model = ckpt.restore_model(CheckpointManager.model_subtree(state),
                               best=args.use_valid and
                               ckpt.latest_step(best=True) is not None)
    if model is None:
        raise FileNotFoundError(f"no checkpoint found under {cp_path}")
    params, norm = model["params"], model["norm"]

    node_type = np.asarray(node_type, np.int32).reshape(-1)
    n_raw = node_type.shape[0]
    traj = Trajectory(
        mesh_pos=np.asarray(mesh_pos, np.float32),
        node_type=node_type,
        times=np.zeros((1,), np.float32),
        fields={f: np.zeros((1, n_raw, d), np.float32)
                for f, d in zip(spec.fields, spec.field_dims)},
        cells=None if cells is None else np.asarray(cells, np.int32),
        edges=None if edges is None else np.asarray(edges, np.int32),
    )
    prep = prepare_trajectory(traj, meta, spec,
                              spatial_reorder=args.spatial_reorder)
    order = jnp.asarray(prep.order)  # template row -> original node id
    n_pad = prep.template.num_nodes
    rollout_fn = make_rollout_fn(
        model_cfg, spec, solver=solver,
        types_updated=args.types_updated, types_inflow=args.types_inflow,
        rtol=args.rtol, atol=args.atol, forced=False)

    def fn(times, *field_arrays):
        fields: Dict[str, jax.Array] = {}
        for name, arr in zip(spec.fields, field_arrays):
            padded = jnp.zeros((n_pad, arr.shape[1]), jnp.float32)
            padded = padded.at[: n_raw].set(arr[order])
            fields[name] = padded[None]  # (T=1, N_pad, dim)
        pred = rollout_fn(params, norm, prep.template, fields, times,
                          times[:1])
        out = jnp.zeros((pred.shape[0], n_raw, pred.shape[-1]),
                        pred.dtype)
        return out.at[:, order, :].set(pred[:, : n_raw, :])

    from jax import export as jexport

    plats = list(platforms) if platforms else [jax.default_backend()]
    scope = jexport.export(jax.jit(fn), platforms=plats)
    exp = scope(
        jax.ShapeDtypeStruct((int(num_steps),), jnp.float32),
        *[jax.ShapeDtypeStruct((n_raw, d), jnp.float32)
          for d in spec.field_dims])
    return exp.serialize()


def export_cloth_simulator(
    params: Dict[str, Any],
    norm: Any,
    mesh_pos: np.ndarray,
    node_type: np.ndarray,
    cells: np.ndarray,
    cfg: Any,  # train.cloth.ClothConfig
    num_steps: int,
    platforms: Optional[Sequence[str]] = None,
    type_min: int = 0,
    type_max: int = 6,
) -> bytes:
    """Serialize the CLOTH simulator (multi-edge-set family) for one mesh.

    The cloth serving path is the semi-implicit second-order rollout of
    ``train/cloth.make_cloth_rollout`` — including the per-step dynamic
    world-edge radius query, which is baked into the artifact as device code
    (Gram-matmul distances + ``top_k`` compaction).  The exported function
    has signature ``(times (T,), world_pos_drive (T, N, 3)) -> pred
    (T, N, 3)``: rows of ``world_pos_drive`` at HANDLE nodes (types outside
    ``cfg.types_updated``) are the kinematic drive read at every step; all
    other rows are only read at the two initial frames.  ``type_min`` /
    ``type_max`` must match the meta's node_type ``data_min``/``data_max``
    the model was configured from (the one-hot width is part of
    ``cfg.model.node_input_dim``).  Like
    :func:`export_simulator`, the deployment site needs only jax — no model
    code, checkpoint, or meta.json (the reference has no serving analogue,
    /root/reference/src/MeshGraphNets.jl:507-548)."""
    from mgn_tpu.core.graph import build_template
    from mgn_tpu.train.cloth import make_cloth_rollout

    node_type = np.asarray(node_type, np.int32).reshape(-1)
    n_raw = node_type.shape[0]
    template = build_template(np.asarray(mesh_pos, np.float32), node_type,
                              cells=np.asarray(cells, np.int32),
                              type_min=type_min, type_max=type_max)
    n_pad = template.num_nodes
    rollout = make_cloth_rollout(cfg)

    def fn(times, wp_drive):
        padded = jnp.zeros((wp_drive.shape[0], n_pad, wp_drive.shape[2]),
                           jnp.float32)
        padded = padded.at[:, :n_raw].set(wp_drive)
        pred = rollout(params, norm, template, padded, times)
        return pred[:, :n_raw]

    from jax import export as jexport

    plats = list(platforms) if platforms else [jax.default_backend()]
    scope = jexport.export(jax.jit(fn), platforms=plats)
    exp = scope(
        jax.ShapeDtypeStruct((int(num_steps),), jnp.float32),
        jax.ShapeDtypeStruct((int(num_steps), n_raw, cfg.world_dim),
                             jnp.float32))
    return exp.serialize()


def load_simulator(blob: bytes):
    """Deserialize an :func:`export_simulator` artifact into a callable
    ``(times, *initial_fields) -> pred``."""
    from jax import export as jexport

    exp = jexport.deserialize(bytearray(blob))
    return exp.call
