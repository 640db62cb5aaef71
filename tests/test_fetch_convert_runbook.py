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
def fixture_dir(tmp_path_factory, reference_path):
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

    # Lightning-style checkpoint + matching conf: activates the import leg
    # of fetch_and_convert_all.sh and the eval leg of quality_parity.sh
    sys.path.insert(0, reference_path)
    from vqvae.modules import autoencoder as ref_ae  # noqa
    from vqvae.modules import vector_quantizers as ref_vq  # noqa
    torch.manual_seed(5)
    enc = ref_ae.Encoder(32, 1, (1, 2), 16)
    dec = ref_ae.Decoder(32, 1, (1, 2), 16)
    quant = ref_vq.VectorQuantizer(32, 16)
    quant.init_codebook()
    sd = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec),
                        ("quantizer", quant)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    torch.save({"state_dict": sd}, fixdir / "model.ckpt")
    (fixdir / "conf.yaml").write_text(
        "image_size: 16\n"
        "autoencoder:\n  channels: 32\n  num_res_blocks: 1\n"
        "  channel_multipliers: [1, 2]\n"
        "quantizer:\n  type: standard\n  num_embeddings: 32\n"
        "  embedding_dim: 16\n  reinit_every_n_epochs: null\n"
        "  params:\n    commitment_cost: 0.25\n"
        "training:\n  cumulative_bs: 8\n  base_lr: 0.0001\n"
        "  betas: [0.0, 0.99]\n  eps: 1.0e-8\n  weight_decay: 0.0001\n"
        "  decay_epochs: 2\n  max_epochs: 2\n")
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


def test_quality_parity_full_chain_dry_run(fixture_dir, tmp_path):
    """tools/quality_parity.sh --dry-run: the ENTIRE connected-machine chain
    (fetch/convert -> checkpoint import -> evaluate.py through this framework
    -> metric parsing) executes offline on synthetic fixtures (VERDICT r4 #4).
    Metric VALUES are meaningless here (random-init fixtures); the published-
    number assertions are unit-tested separately below."""
    cache = tmp_path / "cache"
    r = subprocess.run(
        ["bash", str(REPO / "tools" / "quality_parity.sh"),
         "--cache", str(cache), "--batch", "8",
         "--dry-run", str(fixture_dir)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHON": sys.executable,
             "VQVAE_TPU_PLATFORM": "cpu"},
        timeout=1800)
    assert r.returncode == 0, f"stdout:\n{r.stdout[-4000:]}\nstderr:\n{r.stderr[-4000:]}"
    # the chain imported the fixture checkpoint and evaluated it
    assert (cache / "imported" / "dryrun" / "conf.yaml").exists()
    log = cache / "quality_parity" / "eval_dryrun.txt"
    assert log.exists()
    assert "dry-run: metric lines parse" in r.stdout


def test_quality_parity_checker_asserts_published_numbers(tmp_path):
    """check_quality_parity.py is the pass/fail stage: published values pass
    inside tolerance, fail outside, and a missing rFID is a hard failure
    unless explicitly allowed."""
    sys.path.insert(0, str(REPO))
    import tools.check_quality_parity as cqp

    good = dict(cqp.PUBLISHED["gumbel"])
    assert cqp.check("gumbel", good) == []
    # within tolerance
    near = dict(good, rfid=good["rfid"] * 1.05, psnr=good["psnr"] - 0.2)
    assert cqp.check("gumbel", near) == []
    # outside tolerance
    bad = dict(good, rfid=good["rfid"] * 1.5)
    failures = cqp.check("gumbel", bad)
    assert len(failures) == 1 and failures[0].startswith("rfid")
    # missing rFID: hard unless allowed
    no_rfid = {k: v for k, v in good.items() if k != "rfid"}
    assert any("MISSING" in f for f in cqp.check("gumbel", no_rfid))
    assert cqp.check("gumbel", no_rfid, require_rfid=False) == []
    # the metric-line parser reads evaluate.py's exact output format
    text = "\n".join(f"{k}: {v:.6f}" for k, v in good.items())
    assert cqp.parse_metrics("[INFO] noise\n" + text) == {
        k: float(f"{v:.6f}") for k, v in good.items()}
