"""scripts/watchdog_run.py — the stall watchdog that babysits TPU jobs
through the flaky axon tunnel (CPU-clock stall detection, group kill,
retry, done-file stop)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WD = os.path.join(REPO, "scripts", "watchdog_run.py")


def _run(args, timeout=60):
    return subprocess.run(
        [sys.executable, WD] + args,
        capture_output=True, text=True, timeout=timeout,
    )


def test_success_path_stops_on_done_file(tmp_path):
    done = tmp_path / "done"
    log = tmp_path / "log"
    r = _run([
        "--done_file", str(done), "--log", str(log),
        "--stall_mins", "0.05", "--check_secs", "0.2",
        "--min_cpu_s", "0.5", "--max_attempts", "3",
        "--retry_sleep_s", "0.2",
        "--", "bash", "-c", f"echo hello; touch {done}",
    ])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DONE" in r.stdout
    assert "hello" in log.read_text()


def test_stall_is_killed_and_retried_then_gives_up(tmp_path):
    done = tmp_path / "done"
    log = tmp_path / "log"
    # sleep burns no CPU -> every attempt is declared stalled and killed
    r = _run([
        "--done_file", str(done), "--log", str(log),
        "--stall_mins", "0.03", "--check_secs", "0.2",
        "--min_cpu_s", "5", "--max_attempts", "2",
        "--retry_sleep_s", "0.2",
        "--", "sleep", "300",
    ])
    assert r.returncode == 1
    assert r.stdout.count("STALL") == 2
    assert "giving up" in r.stdout


def test_busy_child_is_not_killed(tmp_path):
    done = tmp_path / "done"
    log = tmp_path / "log"
    # a CPU-busy loop must survive stall windows much longer than its
    # runtime, then write the done file
    busy = (
        "python3 -c \"import time,os; t=time.time()\n"
        "while time.time()-t<3: sum(range(10000))\n"
        f"open('{done}','w').close()\""
    )
    r = _run([
        "--done_file", str(done), "--log", str(log),
        "--stall_mins", "0.02", "--check_secs", "0.3",
        "--min_cpu_s", "0.05", "--max_attempts", "1",
        "--retry_sleep_s", "0.2",
        "--", "bash", "-c", busy,
    ], timeout=90)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "STALL" not in r.stdout
