"""Real-hardware kernel parity (round-1 review weak item 9).

`tests/conftest.py` pins the suite to the virtual CPU mesh, so the
Pallas kernels normally run only in interpret mode. This module probes
for a real accelerator in a clean subprocess and, when one is present
(the bench machine), drives `tools/parity_tpu.py --assert` there — the
compiled Mosaic kernels, forward and backward, against the f32 oracle.
Skipped (not silently green) on CPU-only machines.
"""
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _tpu_available() -> bool:
    probe = ("import jax; "
             "print('PLATFORM=' + jax.devices()[0].platform)")
    try:
        out = subprocess.run([sys.executable, "-c", probe],
                             env=_clean_env(), capture_output=True,
                             text=True, timeout=120)
    except subprocess.TimeoutExpired:
        return False
    return "PLATFORM=tpu" in out.stdout


@pytest.mark.tpu
def test_pallas_kernels_on_hardware():
    if os.environ.get("HGS_SKIP_TPU_TESTS") == "1":
        pytest.skip("HGS_SKIP_TPU_TESTS=1")
    if not _tpu_available():
        pytest.skip("no TPU visible outside the CPU-pinned test env")
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "tools", "parity_tpu.py"),
         "--assert"],
        env=_clean_env(), capture_output=True, text=True, timeout=1200)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, "TPU kernel parity failed (see output)"
