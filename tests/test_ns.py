"""Navier-Stokes vortex-shedding generator (data/ns.py, round-5 verdict
item 1: the nonlinear north-star physics).  Small-grid smoke: the projection
solver stays finite, sheds (transverse oscillation downstream of the
cylinder), and the cylinder-hole mesh + dataset contract load through the
generic pipeline."""

import numpy as np

from mgn_tpu.data.ns import (interp_grid_to_mesh, make_cylinder_mesh,
                             solve_ns_channel, write_ns_dataset)


def test_solver_sheds_and_stays_finite():
    U, V, (xs, ys) = solve_ns_channel(nx=96, ny=48, frames=120,
                                      frame_dt=0.02, dt=4e-3, spin_up=10.0,
                                      seed=3)
    assert np.isfinite(U).all() and np.isfinite(V).all()
    assert U.max() < 5.0 and abs(V).max() < 5.0  # bounded
    # transverse velocity downstream oscillates (von Karman street);
    # compare against the upstream inflow where v ~ 0
    i = int(0.9 / (2.0 / 96))
    j = int(0.5 / (1.0 / 48))
    assert V[:, i, j].std() > 0.05
    assert V[:, 2, j].std() < 0.02
    # recirculation appears behind the cylinder at some point
    assert U.min() < -0.01


def test_cylinder_mesh_has_hole():
    pos, cells, nt = make_cylinder_mesh(800, seed=0)
    from mgn_tpu.data.ns import CX, CY, D

    r = np.hypot(pos[:, 0] - CX, pos[:, 1] - CY)
    assert (r >= D / 2 * 0.99).all()          # no nodes inside the cylinder
    assert (nt == 6).sum() >= 48              # walls incl. the surface ring
    assert (nt == 1).any() and (nt == 5).any()
    cent = pos[cells].mean(1)
    rc = np.hypot(cent[:, 0] - CX, cent[:, 1] - CY)
    assert (rc > D / 2 * 0.9).all()           # no triangles across the hole


def test_ns_dataset_loads_through_pipeline(tmp_path):
    from mgn_tpu.data.pipeline import load_dataset

    d = str(tmp_path / "ns")
    write_ns_dataset(d, num_nodes=300, tl=12, n_train=1, n_valid=1,
                     n_test=1, nx=64, ny=32, spin_up=2.0, verbose=False)
    ds = load_dataset(d, is_training=True)
    tr = ds.trajectory(0)
    assert tr.fields["velocity"].shape[0] == 12
    assert np.isfinite(tr.fields["velocity"]).all()
    # idempotent: a second call returns the existing meta without rewriting
    meta2 = write_ns_dataset(d, num_nodes=300, tl=12)
    assert meta2["trajectory_length"] == 12


def test_interp_weights_match_direct():
    xs = np.linspace(0.1, 1.9, 10)
    ys = np.linspace(0.1, 0.9, 8)
    F = np.random.default_rng(0).random((3, 10, 8))
    pts = np.array([[xs[2], ys[3]], [0.5 * (xs[4] + xs[5]), ys[1]]],
                   np.float32)
    out = interp_grid_to_mesh(F, np.zeros_like(F), xs, ys, pts)
    np.testing.assert_allclose(out[:, 0, 0], F[:, 2, 3], rtol=1e-5)
    np.testing.assert_allclose(out[:, 1, 0], 0.5 * (F[:, 4, 1] + F[:, 5, 1]),
                               rtol=1e-5)
