"""Manifest-driven sequential chip-job runner.

Round 3 and round 4 both lost chip evidence to the same failure: a
shell wrapper (`run_r4_chip3.sh`-style) was killed at a session
boundary while its python child survived, leaving no machine-readable
record of which stages ran — the next session had to grep `ps` output
and guess. This runner replaces the shell wrappers:

  * **owns its children**: stages run as direct children; SIGTERM to
    the runner is forwarded to the running child (whose trainer-side
    PreemptionGuard checkpoints and exits cleanly — no grant wedge),
    waited on, and recorded before the runner exits;
  * **stage manifest**: `started` / `finished` / `rc` / `pid` per
    stage, flushed to disk around every transition — the next session's
    handoff check is "read the manifest", not "grep ps";
  * **resumes from the manifest**: stages with recorded `rc == 0` are
    skipped on rerun;
  * **single-instance lock**: a pidfile beside the manifest refuses a
    second concurrent runner (the round-3 duplicate-flagship incident);
  * **rc gating**: a failed stage blocks the stages after it (a wedged
    grant should not eat the whole queue) unless a stage is marked
    `"independent": true`.

Jobs file (JSON): `[{"name": str, "cmd": [argv...], "env": {str: str},
"independent": bool}, ...]` — `env` and `independent` optional.

Usage (per CLAUDE.md's kill rules — background, sized to finish,
NEVER timeout-killed):

    nohup python benchmarks/run_chip_jobs.py JOBS.json \
        > /tmp/chip_jobs.log 2>&1 &

The reference ships a slurm script (`run_job.slurm`) for this role; a
slurm array is unavailable here (one tunneled chip), so sequencing +
evidence discipline live in this runner instead.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).parent.parent


def _now() -> str:
    return datetime.now(timezone.utc).isoformat(timespec="seconds")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _load(path: Path) -> dict:
    if path.exists():
        return json.loads(path.read_text())
    return {}


def _flush(path: Path, manifest: dict) -> None:
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=2) + "\n")
    tmp.replace(path)


def run_jobs(jobs_path, manifest_path=None, log=print) -> int:
    jobs_path = Path(jobs_path)
    jobs = json.loads(jobs_path.read_text())
    if manifest_path is None:
        manifest_path = jobs_path.with_name(jobs_path.stem + ".manifest.json")
    manifest_path = Path(manifest_path)
    lock_path = manifest_path.with_suffix(".pid")

    # single-instance lock (ADVICE r4: the duplicate-run hazard)
    if lock_path.exists():
        try:
            other = int(lock_path.read_text().strip())
        except ValueError:
            other = -1
        if other > 0 and _pid_alive(other):
            log(f"REFUSED: runner pid {other} already live "
                f"(lock {lock_path}) — never double-run chip jobs")
            return 2
        log(f"stale lock for dead pid {other} — taking over")
    lock_path.write_text(str(os.getpid()))

    manifest = _load(manifest_path)
    child: subprocess.Popen | None = None
    term_requested = False

    def on_term(signum, frame):
        # Forward to the running child; the post-wait bookkeeping in the
        # main loop records the rc. Never escalate to SIGKILL — a killed
        # TPU-attached child wedges the remote grant ~30 min.
        nonlocal term_requested
        term_requested = True
        if child is not None and child.poll() is None:
            child.send_signal(signal.SIGTERM)

    prev = signal.signal(signal.SIGTERM, on_term)
    rc_total = 0
    try:
        blocked = False
        for job in jobs:
            name = job["name"]
            entry = manifest.get(name, {})
            if entry.get("rc") == 0:
                log(f"[{name}] done (rc=0 in manifest) — skipping")
                continue
            if term_requested:
                log(f"[{name}] runner terminating — not started")
                break
            if blocked and not job.get("independent", False):
                manifest[name] = {"blocked_by_failure": True,
                                  "at": _now()}
                _flush(manifest_path, manifest)
                log(f"[{name}] BLOCKED by an earlier failure")
                continue
            env = {**os.environ, **job.get("env", {})}
            # The axon PJRT plugin loads via sitecustomize found through
            # PYTHONPATH — never clobber it (CLAUDE.md).
            need = ["/root/repo", "/root/.axon_site"]
            parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
            env["PYTHONPATH"] = ":".join(
                parts + [p for p in need if p not in parts])
            log(f"[{name}] starting: {' '.join(job['cmd'])}")
            child = subprocess.Popen(job["cmd"], env=env, cwd=str(REPO))
            manifest[name] = {"started": _now(), "pid": child.pid,
                              "cmd": job["cmd"]}
            _flush(manifest_path, manifest)
            t0 = time.time()
            rc = child.wait()
            child = None
            manifest[name].update(
                finished=_now(), rc=rc, seconds=round(time.time() - t0))
            _flush(manifest_path, manifest)
            log(f"[{name}] rc={rc} in {time.time() - t0:.0f}s")
            if rc != 0:
                rc_total = rc
                blocked = True
            if term_requested:
                log(f"[{name}] runner terminating after child exit")
                break
    finally:
        signal.signal(signal.SIGTERM, prev)
        try:
            lock_path.unlink()
        except OSError:
            pass
    log(f"all stages processed; manifest: {manifest_path}")
    return 143 if term_requested else rc_total


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    manifest = None
    if "--manifest" in argv:
        i = argv.index("--manifest")
        manifest = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) != 1:
        print(__doc__, file=sys.stderr)
        return 64
    return run_jobs(argv[0], manifest)


if __name__ == "__main__":
    sys.exit(main())
