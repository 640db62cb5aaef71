"""tools/bench_infer.py — serving-throughput bench contract.

Runs the CLI as a real subprocess on the forced-CPU platform (tiny config)
and checks the one-JSON-line stdout contract: positive throughput for all
three inference entry points (reference model.py:458-489), and the
``unavailable`` marker shape on failure paths is shared with bench.py
(pinned there by test_driver_hermetic).
"""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_infer_cli_cpu():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               VQGAN_INFER_STEPS="1", VQGAN_INFER_BATCH="2")
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_infer.py")],
        capture_output=True, text=True, timeout=900, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, res.stdout
    out = json.loads(lines[0])
    assert "unavailable" not in out, out
    assert out["batch"] == 2
    for key in ("tokenize_ips", "reconstruct_ips", "detokenize_ips"):
        assert out[key] > 0, out
