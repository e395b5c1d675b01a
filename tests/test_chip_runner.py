"""benchmarks/run_chip_jobs.py — the manifest-driven chip-job runner.

Pins the evidence-discipline contract that two session-boundary
incidents motivated (STATUS round-4 close-out): per-stage
started/finished/rc manifest, resume-by-skipping completed stages,
rc gating of dependent stages, single-instance lock, and SIGTERM
forwarding to the running child. No TPU involved — children are
trivial `python -c` processes.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "benchmarks"))

from run_chip_jobs import run_jobs  # noqa: E402


def write_jobs(tmp_path, jobs):
    p = tmp_path / "jobs.json"
    p.write_text(json.dumps(jobs))
    return p


def test_manifest_records_and_resumes(tmp_path):
    out = tmp_path / "out.txt"
    jobs = write_jobs(tmp_path, [
        {"name": "a", "cmd": [sys.executable, "-c",
                              f"open(r'{out}','a').write('a')"]},
        {"name": "b", "cmd": [sys.executable, "-c",
                              f"open(r'{out}','a').write('b')"]},
    ])
    assert run_jobs(jobs, log=lambda *a: None) == 0
    man = json.loads((tmp_path / "jobs.manifest.json").read_text())
    for name in ("a", "b"):
        assert man[name]["rc"] == 0
        assert "started" in man[name] and "finished" in man[name]
    assert out.read_text() == "ab"
    # rerun: both stages skipped, nothing re-executed
    assert run_jobs(jobs, log=lambda *a: None) == 0
    assert out.read_text() == "ab"


def test_failure_blocks_dependents_not_independents(tmp_path):
    out = tmp_path / "out.txt"
    jobs = write_jobs(tmp_path, [
        {"name": "bad", "cmd": [sys.executable, "-c", "raise SystemExit(3)"]},
        {"name": "dep", "cmd": [sys.executable, "-c",
                                f"open(r'{out}','a').write('dep')"]},
        {"name": "indep", "independent": True,
         "cmd": [sys.executable, "-c", f"open(r'{out}','a').write('ind')"]},
    ])
    assert run_jobs(jobs, log=lambda *a: None) == 3
    man = json.loads((tmp_path / "jobs.manifest.json").read_text())
    assert man["bad"]["rc"] == 3
    assert man["dep"] == {"blocked_by_failure": True,
                          "at": man["dep"]["at"]}
    assert man["indep"]["rc"] == 0
    assert out.read_text() == "ind"
    # rerun after fixing: only bad + dep run (indep skipped). Swap the
    # failing cmd for a passing one by editing the jobs file.
    jobs_list = json.loads(jobs.read_text())
    jobs_list[0]["cmd"] = [sys.executable, "-c",
                           f"open(r'{out}','a').write('fix')"]
    jobs.write_text(json.dumps(jobs_list))
    assert run_jobs(jobs, log=lambda *a: None) == 0
    assert out.read_text() == "indfixdep"


def test_concurrent_instance_refused(tmp_path):
    jobs = write_jobs(tmp_path, [
        {"name": "x", "cmd": [sys.executable, "-c", "pass"]},
    ])
    lock = tmp_path / "jobs.manifest.pid"
    lock.write_text(str(os.getpid()))  # a live pid: this test process
    assert run_jobs(jobs, log=lambda *a: None) == 2
    assert not (tmp_path / "jobs.manifest.json").exists()
    # a dead pid is a stale lock: taken over
    lock.write_text("999999999")
    assert run_jobs(jobs, log=lambda *a: None) == 0
    assert not lock.exists()  # released on exit


def test_env_preserves_axon_pythonpath(tmp_path):
    probe = tmp_path / "env.json"
    jobs = write_jobs(tmp_path, [
        {"name": "env", "env": {"EXTRA": "1"},
         "cmd": [sys.executable, "-c",
                 "import os, json; json.dump("
                 f"dict(os.environ), open(r'{probe}','w'))"]},
    ])
    assert run_jobs(jobs, log=lambda *a: None) == 0
    env = json.loads(probe.read_text())
    parts = env["PYTHONPATH"].split(":")
    assert "/root/repo" in parts and "/root/.axon_site" in parts
    assert env["EXTRA"] == "1"


def test_sigterm_forwarded_to_child_and_recorded(tmp_path):
    """SIGTERM to the runner lands on the child as SIGTERM (never KILL),
    the child's rc is recorded, and later stages don't start."""
    flag = tmp_path / "term.txt"
    ready = tmp_path / "ready.txt"
    child_src = (
        "import signal, sys, time\n"
        f"signal.signal(signal.SIGTERM, lambda *a: ("
        f"open(r'{flag}','w').write('sigterm'), sys.exit(41)))\n"
        f"open(r'{ready}','w').write('1')\n"
        "time.sleep(60)\n"
    )
    jobs = write_jobs(tmp_path, [
        {"name": "long", "cmd": [sys.executable, "-c", child_src]},
        {"name": "after", "cmd": [sys.executable, "-c", "pass"]},
    ])
    runner_src = (
        "import sys; sys.path.insert(0, r'%s')\n"
        "from run_chip_jobs import run_jobs\n"
        "sys.exit(run_jobs(r'%s'))\n"
    ) % (REPO / "benchmarks", jobs)
    proc = subprocess.Popen([sys.executable, "-c", runner_src],
                            stdout=subprocess.PIPE, text=True)
    man_path = tmp_path / "jobs.manifest.json"
    deadline = time.time() + 30
    while time.time() < deadline:  # child signals readiness itself,
        if ready.exists():         # AFTER installing its handler
            break
        time.sleep(0.1)
    assert ready.exists(), "child never reached its sleep"
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=30)
    assert rc == 143
    assert flag.read_text() == "sigterm"  # SIGTERM, not SIGKILL
    man = json.loads(man_path.read_text())
    assert man["long"]["rc"] == 41
    assert "after" not in man


@pytest.mark.parametrize("bad", [["x"], []])
def test_cli_usage_error(bad, tmp_path):
    from run_chip_jobs import main

    if bad:
        with pytest.raises(Exception):
            main(bad)  # nonexistent jobs file
    else:
        assert main([]) == 64
