"""Topology-change resume (VERDICT round-2 #5): a checkpoint written under
one device topology must restore and CONTINUE under another.

Real fleets hit this constantly (train on a v5e-8, debug-resume on one chip;
grow a run onto more chips). The reference inherits Lightning's resume
semantics (train.py:106-114), which are topology-agnostic for replicated
state; here the same must hold for orbax snapshots restored into a
differently-meshed TrainState template.

Pinned per direction (8 -> 4 devices, 8 -> 1, 1 -> 8):
- bit-exact parameter/optimizer/step restore into the new topology's
  template (the orbax sharding-metadata mechanics — the actual risk);
- loss-trajectory continuity: the resumed run's next-epoch training loss
  stays at the checkpointed level (a botched restore would jump toward the
  fresh-init loss, several times higher) and training keeps improving.
"""

import json

import numpy as np
import pytest

import jax

from vqvae_tpu.config import parse_config
from vqvae_tpu.data.dataset import ImageFolderDataset, Loader
from vqvae_tpu.parallel.mesh import create_mesh
from vqvae_tpu.train.loop import Trainer, run_training
from vqvae_tpu.utils.checkpoint import CheckpointManager
from vqvae_tpu.utils.logging import MetricLogger

IMG = 16


def _cfg():
    # non-GAN config: the pure reconstruction objective decreases smoothly,
    # which makes trajectory continuity assertable (GAN losses oscillate)
    return parse_config({
        "image_size": IMG,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "ema", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25, "decay": 0.9,
                                 "epsilon": 1e-5}},
        "training": {"cumulative_bs": 16, "base_lr": 2e-3,
                     "betas": [0.9, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 8, "max_epochs": 8},
    })


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("topo_resume_data")
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


def _epoch_losses(path):
    rows = [json.loads(l) for l in open(path).read().splitlines()]
    return [r["train/loss"] for r in rows if "train/loss" in r]


def _run(cfg, image_folder, tmp_path, run_name, mesh, max_epochs,
         resume_path=None):
    logger = MetricLogger(str(tmp_path), run_name)
    state, trainer = run_training(
        cfg, _loader(image_folder), None, seed=0, learning_rate=2e-3,
        save_dir=str(tmp_path), run_name=run_name, logger=logger,
        mesh=mesh, max_epochs=max_epochs, check_val_every=100,
        resume_path=resume_path)
    logger.finish()
    return state, _epoch_losses(tmp_path / run_name / "metrics.jsonl")


def _meshes():
    return {
        "mesh8": create_mesh(),
        "mesh4": create_mesh(devices=jax.devices()[:4]),
        "single": None,
    }


@pytest.mark.parametrize("src,dst", [("mesh8", "mesh4"), ("mesh8", "single"),
                                     ("single", "mesh8")])
def test_topology_change_resume(image_folder, tmp_path, src, dst):
    cfg = _cfg()
    meshes = _meshes()
    src_name = f"{src}_to_{dst}_src"

    # ---- phase 1: 2 epochs under the source topology, checkpointing
    state_src, losses_src = _run(cfg, image_folder, tmp_path, src_name,
                                 meshes[src], max_epochs=2)
    assert int(state_src.step) == 4  # 2 epochs x 2 steps
    ckpt_path = str(tmp_path / src_name / "last")

    # ---- bit-exact restore into the DESTINATION topology's template
    dst_trainer = Trainer(cfg=cfg, learning_rate=2e-3, seed=0,
                          steps_per_epoch=2, mesh=meshes[dst])
    restored, epoch = CheckpointManager(str(tmp_path), "scratch").restore(
        ckpt_path, dst_trainer.init_state())
    assert epoch == 1 and int(restored.step) == 4
    for name in ("params", "opt_state", "vq_state"):
        la = jax.tree.leaves(getattr(state_src, name))
        lb = jax.tree.leaves(getattr(restored, name))
        assert len(la) == len(lb), name
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)

    # ---- phase 2: CONTINUE 2 more epochs under the destination topology
    state_dst, losses_dst = _run(cfg, image_folder, tmp_path,
                                 f"{src}_to_{dst}_dst", meshes[dst],
                                 max_epochs=4, resume_path=ckpt_path)
    assert int(state_dst.step) == 8

    # trajectory continuity: the first resumed epoch stays at the
    # checkpointed loss level (cross-topology reduction order and fresh
    # augmentation draws move it a little, a botched restore a lot — the
    # fresh-init epoch-0 loss is several times higher), and training
    # keeps improving
    assert losses_dst[0] < 0.85 * losses_src[0], (losses_src, losses_dst)
    assert losses_dst[0] < 1.10 * losses_src[-1], (losses_src, losses_dst)
    assert losses_dst[-1] < 1.05 * losses_dst[0], (losses_src, losses_dst)
    assert all(np.isfinite(losses_dst))
