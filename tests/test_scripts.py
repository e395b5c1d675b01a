"""Tests for scripts/run_tpu_vm.sh (SURVEY C23 — the reference's
run_job.slurm / deploy.ps1 equivalent) via its --print-only dry-run mode."""

import shutil
import subprocess
from pathlib import Path

import pytest

SCRIPT = Path(__file__).parent.parent / "scripts" / "run_tpu_vm.sh"

bash = shutil.which("bash")
pytestmark = pytest.mark.skipif(bash is None, reason="bash unavailable")


def run_script(*args, env=None):
    return subprocess.run(
        [bash, str(SCRIPT), *args],
        capture_output=True, text=True, env=env,
    )


def test_dry_run_prints_gcloud_commands():
    r = run_script("--print-only", "seld-v5e-8", "us-west4-a", "train",
                   "model.model_type=crnn", "train.num_epochs=2")
    assert r.returncode == 0, r.stderr
    # %q-quoting escapes ~ and spaces; strip backslashes for matching
    lines = [ln.replace("\\", "").strip()
             for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 4
    # 1: create the remote dir (fresh VMs have no ~/seld_tpu_run)
    assert lines[0].startswith("gcloud compute tpus tpu-vm ssh seld-v5e-8 ")
    assert "mkdir -p ~/seld_tpu_run" in lines[0]
    # 2+3: code sync to all workers
    assert lines[1].startswith("gcloud compute tpus tpu-vm scp --recurse ")
    assert "seld_tpu" in lines[1] and "--worker=all" in lines[1]
    assert "seld-v5e-8:~/seld_tpu_run/" in lines[1]
    assert "bench.py" in lines[2] and "--zone us-west4-a" in lines[2]
    # 4: remote launch with command + overrides forwarded
    assert lines[3].startswith("gcloud compute tpus tpu-vm ssh seld-v5e-8 ")
    assert "python -m seld_tpu.cli train" in lines[3]
    assert "model.model_type=crnn" in lines[3]
    assert "train.num_epochs=2" in lines[3]


def test_dry_run_env_var():
    r = run_script("tpu-x", "eu-west4-b", env={"DRY_RUN": "1", "PATH": "/usr/bin:/bin"})
    assert r.returncode == 0, r.stderr
    assert "gcloud" in r.stdout
    # default command is train
    assert "seld_tpu.cli train" in r.stdout.splitlines()[-1].replace("\\", "")


def test_missing_args_fail():
    r = run_script("--print-only", "only-name")
    assert r.returncode != 0
    assert "zone" in r.stderr


def test_shell_syntax():
    r = subprocess.run([bash, "-n", str(SCRIPT)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr


def test_two_arg_invocation_does_not_leak_args_as_overrides():
    """`shift 3` with only 2 args shifts nothing in bash — the tpu name
    and zone must NOT reappear as CLI overrides in the launch command."""
    r = run_script("--print-only", "seld-v5e-8", "us-west4-a")
    assert r.returncode == 0, r.stderr
    launch = [ln for ln in r.stdout.splitlines() if "seld_tpu.cli" in ln]
    assert len(launch) == 1
    after_cli = launch[0].split("seld_tpu.cli", 1)[1]
    assert "seld-v5e-8" not in after_cli
    assert "us-west4-a" not in after_cli
    assert "train" in after_cli  # default command survives
