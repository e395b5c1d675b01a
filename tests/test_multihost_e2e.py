"""True multi-process (DCN-style) validation: 2 JAX processes, gloo-wired
via jax.distributed, run ONE sharded train step with per-process batch
contribution (`make_array_from_process_local_data`) and must agree with
each other and with the single-process oracle.

This is the cross-host path the virtual-mesh tests can't reach (they are
single-process). Uses subprocesses because one Python process can be at
most one JAX process.
"""

from __future__ import annotations

import re
import socket
import subprocess
import sys
from pathlib import Path


WORKER = Path(__file__).parent / "mh_train_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _extract_loss(out: str) -> float:
    m = re.search(r"TRAIN_LOSS ([0-9.eE+-]+)", out)
    assert m, f"no TRAIN_LOSS in worker output:\n{out[-2000:]}"
    return float(m.group(1))


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = [_extract_loss(o) for o in outs]
    assert losses[0] == losses[1]  # SPMD: every process computes the same

    single = subprocess.run(
        [sys.executable, str(WORKER), "0", "1", str(port)],
        capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-2000:]
    oracle = _extract_loss(single.stdout)
    # 4-device (2 proc x 2 dev) vs 2-device single-process: identical
    # global math up to f32 reduction-order noise
    assert abs(losses[0] - oracle) < 1e-5, (losses[0], oracle)
