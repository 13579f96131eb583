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
    # (name, cmd, env overrides, timeout seconds)  — round-3 backlog
    ("cloth_r03", [sys.executable, "benchmarks/cloth_tpu.py"], {}, 2400),
    ("overlap_hlo", [sys.executable, "benchmarks/overlap_hlo_tpu.py"],
     {}, 1500),
    ("matrix_r03", [sys.executable, "benchmarks/matrix_tpu.py"],
     {"MGN_BENCH_ROUND": "r03"}, 3000),
    ("bench", [sys.executable, "bench.py"], {}, 1800),
]

_HEALTH = (
    "import time,sys; t0=time.time(); import jax, jax.numpy as jnp; "
    "x=jnp.ones((256,256),jnp.bfloat16); "
    "v=float(jnp.sum(jax.jit(lambda a:a@a)(x).astype(jnp.float32))); "
    "print('HEALTH_OK', round(time.time()-t0,1), v, flush=True)"
)


def backend_healthy(timeout_s: int = 300) -> bool:
    """Port 8083 can accept while the remote backend is dead/hanging; only a
    real compile+run+fetch round trip proves health."""
    if not tunnel_up():
        return False
    try:
        r = subprocess.run([sys.executable, "-c", _HEALTH], cwd=REPO,
                           capture_output=True, text=True, timeout=timeout_s)
        return "HEALTH_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


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
    while not backend_healthy():
        print(f"{time.strftime('%H:%M:%S')} backend down; waiting", flush=True)
        time.sleep(240)
    print(f"{time.strftime('%H:%M:%S')} backend healthy; settling 60s",
          flush=True)
    time.sleep(60)

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
            if not backend_healthy():  # died mid-step: wait for it again
                while not backend_healthy():
                    time.sleep(240)
                time.sleep(60)
    with open("/tmp/backlog_done", "w") as fh:
        fh.write("done\n")
    print("backlog complete", flush=True)


if __name__ == "__main__":
    main()
