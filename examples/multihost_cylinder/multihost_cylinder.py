"""Multi-chip / multi-host CylinderFlow training (BASELINE.json config 5).

Demonstrates the SPMD path: a ("data", "graph") device mesh, trajectories
sharded over `data`, each mesh spatially partitioned over `graph` (recursive
coordinate bisection + per-round activation exchange over ICI), gradients and
online-normalizer statistics psum'd.

Single host, all local devices:

    python multihost_cylinder.py <ds_path> [graph_axis]

Multi-host (one process per host; standard JAX env contract):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=<i> \
        python multihost_cylinder.py <ds_path>

Simulated devices (no TPU needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python multihost_cylinder.py <ds_path>
"""

import sys

import numpy as np

from mgn_tpu.parallel.mesh import initialize_multihost

initialize_multihost()  # no-op single-process

import jax
import jax.numpy as jnp
import optax

from mgn_tpu.core import normalizers as N
from mgn_tpu.core.graph import cells_to_edges
from mgn_tpu.data.pipeline import load_dataset
from mgn_tpu.models.mgn import MGNConfig, init_mgn
from mgn_tpu.parallel.mesh import mesh_shape_for
from mgn_tpu.parallel.partition import add_halo_plan, partition_template
from mgn_tpu.parallel.spmd import (batch_from_partitioned, make_device_mesh,
                                   make_spmd_derivative_step)
from mgn_tpu.train.common import FieldSpec, NormState, TrainState
from mgn_tpu.utils.metrics import MetricsLogger


def main():
    ds_path = sys.argv[1]
    prefer_graph = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    log = MetricsLogger()
    data_ax, graph_ax = mesh_shape_for(len(jax.devices()), prefer_graph)
    mesh = make_device_mesh(data_ax, graph_ax)
    log.log("mesh", data=data_ax, graph=graph_ax)

    ds = load_dataset(ds_path, is_training=True)
    meta = ds.meta
    spec = FieldSpec.from_meta(meta)
    quantities, e_norm, n_norms, o_norms = N.normalizers_from_meta(meta)
    cfg = MGNConfig(node_input_dim=quantities, edge_input_dim=3,
                    output_dim=spec.output_dim, latent_size=128,
                    hidden_layers=2, message_passing_steps=15,
                    aggregation_backend="xla")
    opt = optax.adam(1e-4)
    params = init_mgn(jax.random.PRNGKey(0), cfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       norm=NormState(edge=e_norm, node=n_norms,
                                      output=o_norms),
                       step=jnp.zeros((), jnp.int32))
    step = None  # built after the first batch (needs boundary_start)

    # partition each trajectory group once (device-cached full time stacks);
    # each dispatch scans a window of frame indices — the multi-frame scan
    from mgn_tpu.parallel.spmd import device_put_batch

    window = 32
    batches = {}
    rng = np.random.default_rng(0)
    for it in range(1000 // window):
        idxs = tuple((it * data_ax + b) % ds.num_trajectories
                     for b in range(data_ax))
        if idxs not in batches:
            pts, fls, tms = [], [], []
            for i in idxs:
                tr = ds.trajectory(i)
                s, r = cells_to_edges(tr.cells)
                pt = add_halo_plan(partition_template(
                    tr.mesh_pos, tr.node_type, s, r, graph_ax))
                pts.append(pt)
                fls.append({f: tr.fields[f] for f in spec.fields})
                tms.append(tr.times)
            batch, bs, _ = batch_from_partitioned(pts, fls, tms)
            batches[idxs] = (device_put_batch(mesh, batch.tree()), bs,
                             [len(t) - 1 for t in tms])
        tree, bs, n_frames = batches[idxs]
        if step is None:
            step = make_spmd_derivative_step(mesh, cfg, spec, opt,
                                             noise_stddevs=(0.02,),
                                             norm_steps=100,
                                             boundary_start=bs)
        k = min(window, min(n_frames))
        perms = np.stack([rng.permutation(nf)[:k] for nf in n_frames], 1)
        state, losses = step(state, tree, jnp.asarray(perms, jnp.int32),
                             jax.random.PRNGKey(it))
        log.log("train", step=int(state.step),
                loss=float(np.asarray(losses).mean()))


if __name__ == "__main__":
    main()
