"""Unit tests for the TPU backlog runner's queue handling (no jax import).

The runner executes real hardware measurements detached for hours; a parse
crash or a half-read queue silently loses the round's benchmark evidence
(round-3: the static-list runner left its whole backlog unrun), so the
queue-file contract is pinned here.
"""

import importlib.util
import os

HERE = os.path.dirname(os.path.abspath(__file__))
RUNNER = os.path.join(os.path.dirname(HERE), "benchmarks", "run_backlog.py")


def _load(tmp_path, queue_text):
    spec = importlib.util.spec_from_file_location("run_backlog_test", RUNNER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qf = tmp_path / "queue"
    qf.write_text(queue_text)
    mod.QUEUE = str(qf)
    return mod


def test_read_queue_basic(tmp_path):
    mod = _load(tmp_path, "a\t60\tpython x.py\n"
                          "# comment\n"
                          "\n"
                          "b\t120\tVAR=1 python y.py --flag\n")
    steps, end = mod.read_queue()
    assert steps == [("a", 60, "python x.py"),
                     ("b", 120, "VAR=1 python y.py --flag")]
    assert not end


def test_read_queue_skips_malformed_and_honors_end(tmp_path):
    mod = _load(tmp_path, "good\t30\tpython ok.py\n"
                          "bad-no-tabs\n"
                          "badtimeout\t30m\tpython nope.py\n"
                          "END\n"
                          "after_end\t10\tpython never.py\n")
    steps, end = mod.read_queue()
    assert steps == [("good", 30, "python ok.py")]
    assert end


def test_done_set_roundtrip(tmp_path, monkeypatch):
    mod = _load(tmp_path, "x\t10\ttrue\n")
    mod.DONE_SET = str(tmp_path / "done.txt")
    assert mod.read_done() == set()
    mod.mark_done("x")
    mod.mark_done("y")
    assert mod.read_done() == {"x", "y"}


def test_run_step_kills_process_group_on_timeout(tmp_path):
    """A timed-out step must not orphan grandchildren (a surviving
    jax-importing grandchild deadlocks the next benchmark on import)."""
    import subprocess
    import time

    mod = _load(tmp_path, "x\t10\ttrue\n")
    mod.DONE_SET = str(tmp_path / "done.txt")
    mod.backend_healthy = lambda *a, **k: True  # no tunnel in unit tests
    marker = tmp_path / "grandchild_alive"
    # shell -> python grandchild that would outlive a naive child-only kill
    cmd = (f"python -c \"import time\n"
           f"for _ in range(40):\n"
           f"    open('{marker}','w').write('x')\n"
           f"    time.sleep(0.25)\" ")
    t0 = time.time()
    mod.run_step("kill_test", 2, cmd)
    assert time.time() - t0 < 20
    # grandchild must be dead: the marker stops refreshing
    if marker.exists():
        m1 = marker.stat().st_mtime
        time.sleep(1.0)
        assert marker.stat().st_mtime == m1, "grandchild survived the timeout"
