"""Real-chip smokes (opt-in: ``pytest -m tpu tests/test_tpu_smoke.py``).

The default suite forces a CPU backend (conftest.py), where Pallas
runs interpret-only — a Mosaic lowering failure would go unseen.
These tests spawn subprocesses WITHOUT the CPU override so the
session's axon TPU is used.  Last documented pass: 2026-08-20 on
TPU v5 lite (all 16 small-Q fused-kernel variants bit-identical to
the XLA path — see scripts/tpu_smoke_smallq.py).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.tpu


def test_smallq_fused_kernels_on_chip():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "tpu_smoke_smallq.py")],
        capture_output=True, text=True, env=env, timeout=1500)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-2000:]
    assert "ALL PASS" in p.stdout
