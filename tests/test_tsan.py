"""Race-detection check (opt-in: slow TSan rebuild + subprocess)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="TSan rebuild; RUN_SLOW=1"
)


def test_native_loader_has_no_data_races():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "run_tsan_check.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
