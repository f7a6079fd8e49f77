"""REAL multi-process execution of the multihost layer (VERDICT r4 item 2).

Until round 5 `parallel.multihost` had only mocked n_hosts>1 coverage; this
test actually spawns 2 local worker processes that each call
``jax.distributed.initialize`` (gloo coordination over localhost), build
``multihost.hybrid_block_mesh()`` (hosts on the DCN/row axis, local devices
on the ICI/col axis) and run one block-sharded compiled V-cycle over the
GLOBAL 2x2 mesh — then bit-compares the solution against a 1-process run of
the same worker on the same logical mesh.

Reference analog: none — the reference is single-process/single-device
(cudaSetDevice(0), MG_solver_GPU.cu:58); this is the distributed backend the
TPU framework owes instead (SURVEY.md §5).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

LAUNCHER = Path(__file__).resolve().parent.parent / "examples" / \
    "exp_multihost_cpu.py"


@pytest.mark.slow
def test_two_process_run_bitmatches_single_process(tmp_path):
    # the launcher spawns its own clean-env workers (2 CPU devices each),
    # runs 1x4 then 2x2, and asserts maxdiff == 0.0 itself; a fresh port
    # pair avoids collisions with any concurrently running launcher
    out = subprocess.run(
        [sys.executable, str(LAUNCHER), "--port", "19741"],
        capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stdout + out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["maxdiff_sol"] == 0.0
    assert stats["diff_err"] == 0.0
    assert 0.01 < stats["err"] < 0.05      # the known 129^2 V(3,3) error
    assert "MULTI-PROCESS RUN BIT-MATCHES SINGLE-PROCESS" in out.stdout
