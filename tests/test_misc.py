"""Coverage for helpers: mesh shapes, metrics logger, profiling, reports,
spatial reorder."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np

from mgn_tpu.parallel.mesh import data_graph_mesh, mesh_shape_for
from mgn_tpu.rollout.evaluate import rollout_error_report, validation_loss
from mgn_tpu.utils.metrics import MetricsLogger
from mgn_tpu.utils.profiling import debug_mode, edges_per_sec, timed


def test_mesh_shape_for():
    assert mesh_shape_for(8) == (1, 8)
    assert mesh_shape_for(8, prefer_graph=4) == (2, 4)
    assert mesh_shape_for(6) == (3, 2)
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(7) == (7, 1)  # odd: graph axis stays 1


def test_data_graph_mesh_uses_all_devices():
    m = data_graph_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("data", "graph")


def test_metrics_logger_jsonl():
    buf = io.StringIO()
    log = MetricsLogger(stream=buf)
    log.log("train", step=3, loss=jnp.float32(0.5))
    rec = json.loads(buf.getvalue())
    assert rec["kind"] == "train" and rec["step"] == 3
    assert abs(rec["loss"] - 0.5) < 1e-9  # jax scalar unwrapped


def test_timed_and_edges_per_sec():
    f = jax.jit(lambda x: x * 2)
    s = timed(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert s > 0
    assert edges_per_sec(1000, 15, 0.001) == 15_000_000.0


def test_debug_mode_restores_flag():
    before = jax.config.jax_debug_nans
    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_rollout_error_report_horizons():
    t, n, d = 6, 10, 2
    gt = np.zeros((t, n, d), np.float32)
    pred = gt + 0.1
    rep = rollout_error_report(pred, gt, num_nodes=n, mse_steps=(2, 99))
    assert 2 in rep["horizons"] and 99 not in rep["horizons"]
    assert abs(rep["horizons"][2]["mse"] - 0.01) < 1e-6
    assert abs(rep["final_rmse"] - 0.1) < 1e-6


def test_validation_loss_masked():
    pred = jnp.ones((3, 4, 2))
    gt = jnp.zeros((3, 4, 2))
    mask = jnp.array([True, True, False, False])
    assert abs(float(validation_loss(pred, gt, mask)) - 1.0) < 1e-6


def test_spatial_reorder_preserves_training_semantics():
    """Reordered prep trains identically in distribution: same graph up to
    permutation — check assembled features permute consistently."""
    from mgn_tpu.data.pipeline import Trajectory
    from mgn_tpu.data.prep import prepare_trajectory
    from mgn_tpu.data.synthetic import (make_channel_mesh, make_trajectory,
                                        synthetic_meta)
    from mgn_tpu.train.common import FieldSpec

    pos, cells, nt = make_channel_mesh(96, seed=0)
    vel = make_trajectory(pos, nt, 4, 0.01, 0)
    meta = synthetic_meta(4, 1, 1)
    spec = FieldSpec.from_meta(meta)
    traj = Trajectory(mesh_pos=pos, node_type=nt,
                      times=np.arange(4, dtype=np.float32) * 0.01,
                      fields={"velocity": vel}, cells=cells)
    p = prepare_trajectory(traj, meta, spec, spatial_reorder=True)
    # node types and fields moved through the same permutation
    assert (np.asarray(p.template.node_type)[: p.num_nodes]
            == nt[p.order]).all()
    assert np.allclose(np.asarray(p.fields["velocity"])[:, : p.num_nodes],
                       vel[:, p.order])
    # edge count preserved
    assert int(p.template.edge_mask.sum()) > 0
    back = p.unpermute(np.asarray(p.fields["velocity"][0]))
    assert np.allclose(back, vel[0])


def test_args_auto_resolution_cpu():
    """None (=auto) TPU-path knobs resolve to False off-TPU; explicit values
    pass through untouched."""
    from mgn_tpu.config import Args

    a = Args().resolve_auto()
    assert a.spatial_reorder is False and a.fused is False \
        and a.fused_backward is False
    b = Args(fused=True, spatial_reorder=True,
             fused_backward=False).resolve_auto()
    assert b.fused is True and b.spatial_reorder is True \
        and b.fused_backward is False
