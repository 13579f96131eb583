"""Sequential TPU measurement backlog runner.

Polls the axon tunnel relay port (no jax import) and, once it is up, runs
the queued benchmark scripts one at a time (NEVER two jax processes at
once), each with a hard timeout and one retry.  Logs land in /tmp; writes
/tmp/backlog_done when finished.

Run detached:  nohup python benchmarks/run_backlog.py > /tmp/backlog.log 2>&1 &
"""

import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

STEPS = [
    # (name, cmd, env overrides, timeout seconds)
    ("probe_layout", [sys.executable, "benchmarks/probe_layout_tpu.py"],
     {}, 2400),
    ("bigmesh_ab", [sys.executable, "benchmarks/bigmesh_tpu.py"],
     {"MGN_BIGMESH_UNROLL_AB": "1"}, 3000),
    ("unionbatch", [sys.executable, "benchmarks/unionbatch_tpu.py"],
     {}, 2400),
    ("matrix_r02", [sys.executable, "benchmarks/matrix_tpu.py"],
     {"MGN_BENCH_ROUND": "r02"}, 2400),
    ("bench", [sys.executable, "bench.py"], {}, 1200),
]


def tunnel_up() -> bool:
    s = socket.socket()
    s.settimeout(2)
    try:
        s.connect(("127.0.0.1", 8083))
        return True
    except OSError:
        return False
    finally:
        s.close()


def main():
    while not tunnel_up():
        print(f"{time.strftime('%H:%M:%S')} tunnel down; waiting", flush=True)
        time.sleep(60)
    print(f"{time.strftime('%H:%M:%S')} tunnel UP; settling 120s", flush=True)
    time.sleep(120)  # let the relay/remote side finish coming up

    for name, cmd, env, tmo in STEPS:
        for attempt in (1, 2):
            log = f"/tmp/backlog_{name}.log"
            print(f"{time.strftime('%H:%M:%S')} {name} attempt {attempt} "
                  f"-> {log}", flush=True)
            full_env = dict(os.environ, **env)
            with open(log, "w") as fh:
                try:
                    rc = subprocess.run(cmd, cwd=REPO, env=full_env,
                                        stdout=fh, stderr=subprocess.STDOUT,
                                        timeout=tmo).returncode
                except subprocess.TimeoutExpired:
                    rc = -1
            print(f"{time.strftime('%H:%M:%S')} {name} rc={rc}", flush=True)
            if rc == 0:
                break
            if not tunnel_up():  # tunnel died mid-step: wait for it again
                while not tunnel_up():
                    time.sleep(60)
                time.sleep(120)
    with open("/tmp/backlog_done", "w") as fh:
        fh.write("done\n")
    print("backlog complete", flush=True)


if __name__ == "__main__":
    main()
