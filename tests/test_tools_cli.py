"""Smoke tests for the tools/ CLIs that have no other automated coverage:
tokenize_dataset (stage-2 token export) driven as a real subprocess.
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """Tiny image folder + an init-state checkpoint saved via the manager."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer
    from vqvae_tpu.utils.checkpoint import CheckpointManager

    root = tmp_path_factory.mktemp("tok")
    data = root / "data"
    for split, n in [("train", 12), ("validation", 6)]:
        d = data / split
        d.mkdir(parents=True)
        rs = np.random.RandomState(1)
        for i in range(n):
            Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)
                            ).save(d / f"i{i}.png")

    raw = {
        "image_size": 16,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    }
    import yaml
    conf = root / "conf.yaml"
    conf.write_text(yaml.safe_dump(raw))

    cfg = parse_config(raw)
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=2)
    state = trainer.init_state()
    ckpt = CheckpointManager(str(root / "ck"), "r")
    ckpt.save(state, 0)
    return root, conf, data


@pytest.fixture(scope="module")
def reference_tokens(trained_run):
    """Non-spatial CLI run shared by both tests (no inter-test ordering)."""
    root, conf, data = trained_run
    out = root / "tokens"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "tokenize_dataset.py"),
         "--params_file", str(conf),
         "--loading_path", str(root / "ck" / "r" / "last"),
         "--dataset_path", str(data),
         "--splits", "train", "validation",
         "--batch_size", "8",
         "--output_folder", str(out)],
        capture_output=True, text=True, timeout=900, env=env)
    return out, res


def test_tokenize_dataset_cli(reference_tokens):
    out, res = reference_tokens
    assert res.returncode == 0, res.stderr[-2000:]

    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["num_embeddings"] == 32
    toks = np.load(out / "train_tokens.npy")
    assert toks.shape == (12, 16) and toks.dtype == np.int32
    assert toks.min() >= 0 and toks.max() < 32
    val = np.load(out / "validation_tokens.npy")
    assert val.shape == (6, 16)


def test_tokenize_dataset_cli_spatial(trained_run, reference_tokens):
    """--spatial over 4 virtual devices must produce identical tokens."""
    root, conf, data = trained_run
    out, ref_res = reference_tokens
    assert ref_res.returncode == 0, ref_res.stderr[-2000:]
    out_sp = root / "tokens_spatial"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "tokenize_dataset.py"),
         "--params_file", str(conf),
         "--loading_path", str(root / "ck" / "r" / "last"),
         "--dataset_path", str(data),
         "--splits", "train",
         "--batch_size", "8",
         "--spatial",
         "--output_folder", str(out_sp)],
        capture_output=True, text=True, timeout=900, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "spatial sharding over 4 devices" in res.stdout
    np.testing.assert_array_equal(np.load(out_sp / "train_tokens.npy"),
                                  np.load(out / "train_tokens.npy"))
