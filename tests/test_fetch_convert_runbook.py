"""Dry-run of tools/fetch_and_convert_all.sh — the connected-machine runbook.

The real script downloads pretrained weights (impossible on this box); its
--dry-run mode drives the EXACT converter invocations against synthetic .pth
fixtures instead, so the one-command quality-parity runbook is proven
executable end-to-end before connectivity exists: LPIPS vgg/alex/squeeze +
FID inception conversion, checksum manifest, and loadability of every
produced artifact through the framework's own loaders.

Numerical parity of the converted weights is pinned separately
(test_lpips_parity / test_inception_parity); this test pins the RUNBOOK.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

# reuse the replica-backbone fixture machinery from the parity suites
import test_inception_parity as _incep
import test_lpips_parity as _lp

_LIN_CHANNELS = {
    "vgg": (64, 128, 256, 512, 512),
    "alex": (64, 192, 384, 256, 256),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    fixdir = tmp_path_factory.mktemp("runbook_fixtures")

    for net, maker in _lp._MAKERS.items():
        torch.save(maker(torch).state_dict(), fixdir / f"backbone_{net}.pth")
        # richzhang v0.1 lin-head layout: 'lin{i}.model.1.weight' (1,C,1,1)
        g = torch.Generator().manual_seed(1)
        lin_sd = {
            f"lin{i}.model.1.weight":
                torch.empty(1, c, 1, 1).uniform_(0.05, 1.0, generator=g)
            for i, c in enumerate(_LIN_CHANNELS[net])
        }
        torch.save(lin_sd, fixdir / f"lin_{net}.pth")

    incep = _incep._randomize(torch, _incep.build_fid_inception(torch), seed=3)
    torch.save(incep.state_dict(), fixdir / "pt_inception.pth")
    return fixdir


def test_runbook_dry_run(fixture_dir, tmp_path, monkeypatch):
    cache = tmp_path / "cache"
    r = subprocess.run(
        ["bash", str(REPO / "tools" / "fetch_and_convert_all.sh"),
         "--cache", str(cache), "--dry-run", str(fixture_dir)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHON": sys.executable}, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"

    produced = sorted(p.name for p in cache.glob("*.npz"))
    assert produced == ["inception_fid.npz", "lpips_alex.npz",
                        "lpips_squeeze.npz", "lpips_vgg.npz"]

    # checksum manifest covers every artifact and verifies
    manifest = cache / "CHECKSUMS.sha256"
    assert manifest.exists()
    assert len(manifest.read_text().strip().splitlines()) == 4
    chk = subprocess.run(["sha256sum", "-c", "CHECKSUMS.sha256"],
                         capture_output=True, text=True, cwd=cache)
    assert chk.returncode == 0, chk.stdout + chk.stderr

    # every artifact loads through the framework's own loaders (no
    # random-init fallback warning = the real weights were found)
    monkeypatch.setenv("VQVAE_TPU_LPIPS_WEIGHTS_DIR", str(cache))
    monkeypatch.setenv("VQVAE_TPU_INCEPTION_WEIGHTS",
                       str(cache / "inception_fid.npz"))
    import warnings

    from vqvae_tpu.eval.fid import load_inception_extractor
    from vqvae_tpu.models.lpips import init_lpips

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for net in ("vgg", "alex", "squeeze"):
            _, params = init_lpips(net, image_size=64)
            assert "net" in params
        extractor, feat_dim = load_inception_extractor()
    assert extractor is not None and feat_dim == 2048

    # rFID-gated eval CLI accepts this cache (the gate that exits loudly
    # when weights are missing must pass once they exist)
    feats = extractor(np.zeros((2, 299, 299, 3), np.uint8))
    assert np.asarray(feats).shape == (2, 2048)
