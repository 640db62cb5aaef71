"""Wiring smoke test for tools/bench_reference_torch.py (module mode).

The tool's purpose is to run on a connected CUDA machine with the full
reference environment and replace BASELINE.md's proxy anchor with a measured
number. Offline, this pins what CAN run here: the module-mode loop drives
the reference's actual Encoder/Decoder/quantizer modules end-to-end on CPU
at smoke scale and emits the documented one-line JSON contract.
"""

import json
import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "bench_reference_torch.py")


@pytest.mark.parametrize("quantizer", ["standard", "gumbel"])
def test_module_mode_smoke(reference_path, quantizer):
    pytest.importorskip("torch")
    r = subprocess.run(
        [sys.executable, TOOL, "--reference_path", reference_path,
         "--mode", "module", "--loss", "mse", "--quantizer", quantizer,
         "--image_size", "32", "--channels", "32", "--num_res_blocks", "1",
         "--channel_multipliers", "1", "2", "--batch", "4",
         "--warmup_steps", "1", "--timed_steps", "2", "--no_amp"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout
    out = json.loads(lines[-1])
    assert out["value"] > 0
    assert out["unit"] == "images/sec/device"
    assert out["mode"] == "module"
    assert out["device"] == "cpu"


def test_gan_batch_guard(reference_path):
    """Adversarial configs must reject batch % 4 != 0 up front."""
    r = subprocess.run(
        [sys.executable, TOOL, "--reference_path", reference_path,
         "--mode", "module", "--loss", "gan", "--batch", "6"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "batch % 4" in (r.stderr + r.stdout)
