"""Stall-watchdog runner for TPU jobs through the flaky axon tunnel.

The tunnel to the real chip intermittently freezes the client process at
0% CPU (observed for 20+ minutes, sometimes hours). A fixed `timeout N`
wrapper must choose between killing healthy long phases (surrogate
generation/preprocess are silent for an hour) and reacting slowly to a
real stall. This runner watches the CPU clock of the child's process
TREE instead: a healthy phase (generation, preprocess, training dispatch
loop, eval) always burns host CPU; a tunnel stall burns none. If the
tree accumulates < --min_cpu_s seconds of CPU over --stall_mins minutes,
the child is killed (by its own process group — never by pattern) and
the command is retried. Combine with a command that is idempotent on
retry (criteo_parity.py --resume: stage done-markers + per-cell memos).

    python scripts/watchdog_run.py --done_file X --log L -- cmd args...

Exits 0 when --done_file exists (the command's success artifact) or the
command exits 0; gives up after --max_attempts.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def tree_cpu_seconds(root_pid: int) -> float:
    """utime+stime of root_pid and every live descendant, via /proc.

    Dead children's time is not counted; phases here are one long-lived
    interpreter (plus multiprocessing pools), so the live-tree clock is
    monotone enough to detect 'no one is computing'."""
    hz = os.sysconf("SC_CLK_TCK")
    total = 0.0
    stack, seen = [root_pid], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / hz
        except (OSError, IndexError, ValueError):
            continue
        try:
            for t in os.listdir(f"/proc/{p}/task"):
                with open(f"/proc/{p}/task/{t}/children") as f:
                    stack += [int(c) for c in f.read().split()]
        except OSError:
            pass
    return total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--done_file", required=True,
                    help="success artifact; exists => stop retrying")
    ap.add_argument("--log", required=True, help="append child output here")
    ap.add_argument("--stall_mins", type=float, default=15.0)
    ap.add_argument("--min_cpu_s", type=float, default=10.0,
                    help="CPU seconds the tree must burn per stall window")
    ap.add_argument("--check_secs", type=float, default=60.0)
    ap.add_argument("--max_attempts", type=int, default=30)
    ap.add_argument("--retry_sleep_s", type=float, default=60.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    a = ap.parse_args(argv)
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    if not cmd:
        ap.error("no command given (put it after --)")

    for attempt in range(1, a.max_attempts + 1):
        with open(a.log, "a") as logf:
            logf.write(f"\n=== watchdog attempt {attempt} {time.ctime()} ===\n")
            logf.flush()
            proc = subprocess.Popen(
                cmd, stdout=logf, stderr=subprocess.STDOUT,
                start_new_session=True,  # own pgid => precise group kill
            )
            print(f"[watchdog] attempt {attempt} pid={proc.pid}", flush=True)
            window_t0 = time.time()
            window_cpu0 = tree_cpu_seconds(proc.pid)
            killed = False
            while proc.poll() is None:
                time.sleep(a.check_secs)
                cpu = tree_cpu_seconds(proc.pid)
                if cpu - window_cpu0 >= a.min_cpu_s:
                    window_t0, window_cpu0 = time.time(), cpu
                elif time.time() - window_t0 > a.stall_mins * 60:
                    print(
                        f"[watchdog] STALL: {cpu - window_cpu0:.1f}s cpu in "
                        f"{a.stall_mins} min — killing pgid {proc.pid}",
                        flush=True,
                    )
                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    proc.wait()
                    killed = True
                    break
        if os.path.exists(a.done_file):
            print(f"[watchdog] DONE: {a.done_file} exists", flush=True)
            return 0
        if not killed and proc.returncode == 0:
            print("[watchdog] command exited 0 without done_file; stopping",
                  flush=True)
            return 0
        print(f"[watchdog] attempt {attempt} ended rc={proc.returncode} "
              f"killed={killed}; retrying in {a.retry_sleep_s}s", flush=True)
        time.sleep(a.retry_sleep_s)
    print("[watchdog] giving up", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
