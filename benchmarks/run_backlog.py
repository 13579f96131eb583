"""Sequential TPU measurement backlog runner (queue-file edition).

Polls the axon tunnel relay and, once a real compile+run+fetch round trip
succeeds, runs queued benchmark scripts one at a time (NEVER two
jax-importing processes at once — they deadlock on import), each with a hard
timeout and one retry.  Round 4 change: steps come from a QUEUE FILE that is
re-read between steps, so new measurements can be appended while the runner
is live instead of requiring a restart (the round-3 static-list runner left
its whole backlog unrun when the tunnel never came up in-session).

Queue format (benchmarks/backlog.queue), one step per line:

    name<TAB>timeout_seconds<TAB>shell command (run from the repo root)

Lines starting with '#' and blank lines are skipped.  A line that is exactly
'END' tells the runner to exit once everything above it has run.  Completed
(or twice-failed) step names persist in /tmp/backlog_done.txt so a runner
restart skips them; logs land in /tmp/backlog_<name>.log; /tmp/backlog_done
is written when END is reached.

Run detached:  nohup python benchmarks/run_backlog.py > /tmp/backlog.log 2>&1 &
"""

import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
QUEUE = os.path.join(HERE, "backlog.queue")
DONE_SET = "/tmp/backlog_done.txt"

_HEALTH = (
    "import time,sys; t0=time.time(); import jax, jax.numpy as jnp; "
    "x=jnp.ones((256,256),jnp.bfloat16); "
    "v=float(jnp.sum(jax.jit(lambda a:a@a)(x).astype(jnp.float32))); "
    "print('HEALTH_OK', round(time.time()-t0,1), v, flush=True)"
)


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


def read_queue():
    steps, saw_end = [], False
    if os.path.exists(QUEUE):
        with open(QUEUE) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if line == "END":
                    saw_end = True
                    break  # nothing after END runs
                parts = line.split("\t", 2)
                if len(parts) != 3:
                    print(f"queue: skipping malformed line {line!r}",
                          flush=True)
                    continue
                try:
                    tmo = int(parts[1])
                except ValueError:
                    print(f"queue: bad timeout in {line!r}; skipping",
                          flush=True)
                    continue
                steps.append((parts[0], tmo, parts[2]))
    return steps, saw_end


def read_done():
    if not os.path.exists(DONE_SET):
        return set()
    with open(DONE_SET) as f:
        return {ln.strip() for ln in f if ln.strip()}


def mark_done(name: str):
    with open(DONE_SET, "a") as f:
        f.write(name + "\n")


def run_step(name: str, timeout_s: int, cmd: str) -> None:
    for attempt in (1, 2):
        log = f"/tmp/backlog_{name}.log"
        print(f"{time.strftime('%H:%M:%S')} {name} attempt {attempt} -> {log}",
              flush=True)
        with open(log, "w") as fh:
            # own session/process group so a timeout kills the WHOLE tree
            # (shell=True + plain kill would orphan the jax-importing
            # grandchild, and a second jax process deadlocks on import)
            proc = subprocess.Popen(cmd, shell=True, cwd=REPO, stdout=fh,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
            try:
                rc = proc.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                import signal

                try:
                    os.killpg(proc.pid, signal.SIGKILL)  # exact pgid we made
                except ProcessLookupError:
                    pass
                proc.wait()
                rc = -1
        print(f"{time.strftime('%H:%M:%S')} {name} rc={rc}", flush=True)
        if rc == 0:
            mark_done(name)
            return
        if not backend_healthy():  # died mid-step: wait for backend again
            while not backend_healthy():
                print(f"{time.strftime('%H:%M:%S')} backend down; waiting",
                      flush=True)
                time.sleep(240)
            time.sleep(30)
    mark_done(name)  # twice-failed: skip, leave the log for diagnosis


def main():
    while not backend_healthy():
        print(f"{time.strftime('%H:%M:%S')} backend down; waiting", flush=True)
        time.sleep(240)
    print(f"{time.strftime('%H:%M:%S')} backend healthy", flush=True)

    while True:
        steps, saw_end = read_queue()
        pending = [s for s in steps if s[0] not in read_done()]
        if not pending:
            if saw_end:
                break
            time.sleep(60)
            continue
        name, tmo, cmd = pending[0]
        if not backend_healthy():
            while not backend_healthy():
                print(f"{time.strftime('%H:%M:%S')} backend down; waiting",
                      flush=True)
                time.sleep(240)
        run_step(name, tmo, cmd)

    with open("/tmp/backlog_done", "w") as fh:
        fh.write("done\n")
    print("backlog complete", flush=True)


if __name__ == "__main__":
    main()
