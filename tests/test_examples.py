"""The examples must actually run (they are PARITY C24's notebook
equivalents): each executes end-to-end in a CPU subprocess."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"


def _run(name: str) -> subprocess.CompletedProcess:
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        f"exec(open(r'{EXAMPLES / name}').read())"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
        cwd=str(EXAMPLES.parent),
    )


@pytest.mark.parametrize("name", ["quickstart.py", "serving.py", "scaling.py"])
def test_example_runs_clean(name):
    r = _run(name)
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
