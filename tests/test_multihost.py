"""Real 2-process ``jax.distributed`` execution (round-5 verdict item 6).

The full harness (benchmarks/multihost_cpu.py) launches two OS processes
with 4 virtual CPU devices each — one global (2, 4) mesh with gloo
cross-process collectives — and compares the loss trajectory against an
identically-configured single-process run.  It takes a few minutes and
spawns jax subprocesses, so it is gated behind MGN_MULTIHOST=1; the
recorded artifact is benchmarks/results/MULTIHOST_2PROC_r05.json.

What always runs here: the import-order invariant the multi-process path
depends on — ``import mgn_tpu`` must NOT initialize the XLA backend
(``jax.distributed.initialize`` must come first at a real deployment; the
round-5 fix moved the Tsit5 Butcher constants off module-scope jnp).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_import_does_not_initialize_backend():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax._src import xla_bridge\n"
        "import mgn_tpu\n"
        "import mgn_tpu.parallel.mesh\n"
        "assert xla_bridge._backends == {}, 'import initialized the backend'"
        "\nprint('LAZY_OK')\n")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert "LAZY_OK" in r.stdout, r.stdout + r.stderr


@pytest.mark.skipif(os.environ.get("MGN_MULTIHOST") != "1",
                    reason="2-process harness gated behind MGN_MULTIHOST=1")
def test_two_process_training_matches_single(tmp_path):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               MGN_MH_WORK=str(tmp_path / "mh"), MGN_MH_WINDOWS="3")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "multihost_cpu.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert "MULTIHOST_2PROC" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
    with open(os.path.join(REPO, "benchmarks", "results",
                           "MULTIHOST_2PROC_r05.json")) as f:
        rec = json.load(f)
    assert rec["ok"], rec
