"""Resume INTO an active GAN phase (VERDICT round-1 gap): a restart during
the adversarial phase of a run must be bit-exact with the uninterrupted run.

This is exactly what a real 300-epoch recipe hits when it restarts after
epoch >= start_epoch (reference resume contract: train.py:142 ckpt_path).
Covers: disc_params / disc_opt_state restore, the host-side R1 cadence
mirror (Trainer.sync_host_step), the start_epoch-shifted D LR schedule
(loop.py disc_lr_sched), and the step-folded RNG stream.
"""

import json

import numpy as np
import pytest

import jax

from vqvae_tpu.config import parse_config
from vqvae_tpu.data.dataset import ImageFolderDataset, Loader
from vqvae_tpu.train.loop import run_training
from vqvae_tpu.utils.logging import MetricLogger

IMG = 16


def gan_cfg():
    return parse_config({
        "image_size": IMG,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "loss": {"l1_weight": 1.0, "l2_weight": 1.0, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 1,
                                        "loss_type": "non-saturating",
                                        "g_weight": 0.1,
                                        "use_adaptive": False,
                                        "r1_reg_weight": 10.0,
                                        # odd cadence: the resume lands
                                        # mid-window, exercising the host-step
                                        # realignment
                                        "r1_reg_every": 3}},
        "training": {"cumulative_bs": 16, "base_lr": 1e-3,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 4, "max_epochs": 4},
    })


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("gan_resume_data")
    d = root / "train"
    d.mkdir()
    rs = np.random.RandomState(0)
    for i in range(32):
        Image.fromarray(rs.randint(0, 255, (IMG, IMG, 3), np.uint8)).save(
            d / f"img_{i:03d}.png")
    return str(root) + "/"


def _loader(image_folder):
    return Loader(ImageFolderDataset(image_folder + "train/", IMG),
                  batch_size=16, shuffle=True, drop_last=True, seed=0)


def _final_train_metrics(path):
    rows = [json.loads(l) for l in open(path).read().splitlines()]
    rows = [r for r in rows if "train/loss" in r]
    return rows[-1]


def test_resume_into_gan_phase_is_bit_exact(image_folder, tmp_path):
    cfg = gan_cfg()

    # ---- run A: 4 epochs straight through (start_epoch=1 -> epochs 1-3 are
    # adversarial; 2 steps/epoch; R1 every 3 steps fires at steps 3 and 6,
    # i.e. mid-epoch-1 and mid-epoch-3)
    log_a = MetricLogger(str(tmp_path), "a")
    state_a, _ = run_training(
        cfg, _loader(image_folder), None, seed=0, learning_rate=1e-3,
        save_dir=str(tmp_path), run_name="a", logger=log_a,
        max_epochs=4, check_val_every=100)
    log_a.finish()

    # ---- run B: stop after epoch 2 (inside the GAN phase, mid-R1-window),
    # then resume from its checkpoint for epochs 3
    log_b = MetricLogger(str(tmp_path), "b")
    state_b1, _ = run_training(
        cfg, _loader(image_folder), None, seed=0, learning_rate=1e-3,
        save_dir=str(tmp_path), run_name="b", logger=log_b,
        max_epochs=3, check_val_every=100)
    log_b.finish()
    assert int(state_b1.step) == 6  # stopped mid-R1-window (cadence 3)

    log_b2 = MetricLogger(str(tmp_path), "b2")
    state_b, _ = run_training(
        cfg, _loader(image_folder), None, seed=0, learning_rate=1e-3,
        save_dir=str(tmp_path), run_name="b2", logger=log_b2,
        resume_path=str(tmp_path / "b" / "last"),
        max_epochs=4, check_val_every=100)
    log_b2.finish()

    assert int(state_a.step) == int(state_b.step) == 8

    # ---- bit-exact state equality: AE params, D params, BOTH optimizer
    # states (includes the D Adam step count that drives the shifted LR)
    for name in ("params", "disc_params", "opt_state", "disc_opt_state"):
        leaves_a = jax.tree.leaves(getattr(state_a, name))
        leaves_b = jax.tree.leaves(getattr(state_b, name))
        assert len(leaves_a) == len(leaves_b)
        for la, lb in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=name)

    # ---- final logged metrics identical (incl. disc_loss and the R1
    # penalty's presence pattern) and adversarial phase actually active
    ma = _final_train_metrics(tmp_path / "a" / "metrics.jsonl")
    mb = _final_train_metrics(tmp_path / "b2" / "metrics.jsonl")
    assert ma["train/disc_loss"] != 0.0
    for k in ("train/loss", "train/disc_loss", "train/gen_loss",
              "train/r1_penalty", "train/lr"):
        np.testing.assert_allclose(ma[k], mb[k], rtol=0, atol=0, err_msg=k)
