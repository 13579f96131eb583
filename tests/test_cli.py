"""CLI + conversion utility coverage."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=240):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "from mgn_tpu.__main__ import main; import sys;"
            f"main({args!r})")
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_cli_synth_train_eval(tmp_path):
    ds = str(tmp_path / "ds")
    r = run_cli(["synth", ds, "--num-nodes", "48", "--tl", "10",
                 "--n-train", "2", "--n-valid", "1", "--n-test", "1"])
    assert r.returncode == 0, r.stderr
    assert os.path.isfile(os.path.join(ds, "train.h5"))

    cp = str(tmp_path / "cp")
    r = run_cli(["train", ds, cp, "--mps", "1", "--layer-size", "8",
                 "--hidden-layers", "1", "--steps", "12", "--checkpoint", "6",
                 "--norm-steps", "2", "--noise", "0.0"])
    assert r.returncode == 0, r.stderr
    assert any(l.startswith('{"kind": "train"') for l in r.stdout.splitlines())

    out = str(tmp_path / "out")
    r = run_cli(["eval", ds, cp, out, "--solver", "euler",
                 "--num-rollouts", "1", "--mps", "1", "--layer-size", "8",
                 "--hidden-layers", "1"])
    assert r.returncode == 0, r.stderr
    assert os.path.isfile(os.path.join(out, "euler", "trajectories.h5"))

    art = str(tmp_path / "sim.mgnsim")
    r = run_cli(["export", ds, cp, art, "--solver", "euler",
                 "--num-steps", "4", "--mps", "1", "--layer-size", "8",
                 "--hidden-layers", "1"])
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(art) > 1000


def test_convert_inspect_and_stats(tmp_path):
    from mgn_tpu.data.convert import inspect, stats, to_h5
    from mgn_tpu.data.meta import load_meta
    from mgn_tpu.data.synthetic import write_synthetic_dataset

    ds = str(tmp_path / "ds")
    write_synthetic_dataset(ds, num_nodes=32, tl=6, n_train=2, n_valid=1,
                            n_test=1)
    dst = str(tmp_path / "out")
    to_h5(ds, dst)
    assert os.path.isfile(os.path.join(dst, "train.h5"))
    assert os.path.isfile(os.path.join(dst, "valid.h5"))
    assert os.path.isfile(os.path.join(dst, "test.h5"))
    # converted dataset loads identically
    from mgn_tpu.data.pipeline import load_dataset

    a = load_dataset(ds).trajectory(0)
    b = load_dataset(dst).trajectory(0)
    assert np.allclose(a.fields["velocity"], b.fields["velocity"])

    stats(ds)
    meta = load_meta(ds)
    assert "output_min" in meta["features"]["velocity"]
    assert meta["features"]["velocity"]["output_min"] < \
        meta["features"]["velocity"]["output_max"]
