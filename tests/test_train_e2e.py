"""End-to-end training smoke tests: tiny synthetic image folder -> train a
few epochs on an 8-device CPU mesh -> loss decreases, checkpoints round-trip,
eval CLI path runs. This is the CPU-runnable PR1 slice from SURVEY §7.
"""

import json
import os
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import parse_config
from vqvae_tpu.data.dataset import ImageFolderDataset, Loader
from vqvae_tpu.parallel.mesh import create_mesh
from vqvae_tpu.train.loop import Trainer, run_training, run_validation
from vqvae_tpu.utils.checkpoint import CheckpointManager, restore_for_eval
from vqvae_tpu.utils.logging import MetricLogger

IMG = 16


def tiny_cfg(q_type="standard", extra_q=None, loss=None):
    q_params = {"commitment_cost": 0.25}
    if q_type == "ema":
        q_params.update(decay=0.95, epsilon=1e-5)
    if q_type == "gumbel":
        q_params = {"straight_through": False, "temp": 1.0, "kl_cost": 0.01,
                    "kl_warmup_epochs": 1, "temp_decay_epochs": 2,
                    "temp_final": 0.5}
    if q_type == "entropy":
        q_params = {"ent_loss_ratio": 0.1, "ent_temperature": 0.01,
                    "ent_loss_type": "softmax", "commitment_cost": 0.25}
    if extra_q:
        q_params.update(extra_q)
    raw = {
        "image_size": IMG,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": q_type, "params": q_params,
                      "reinit_every_n_epochs": 2},
        "training": {"cumulative_bs": 16, "base_lr": 1e-3,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 3, "max_epochs": 3},
    }
    if loss:
        raw["loss"] = loss
    return parse_config(raw)


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    """Synthetic dataset: train/validation/test folders of 16x16 PNGs."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    root = tmp_path_factory.mktemp("data")
    rs = np.random.RandomState(0)
    for split, n in [("train", 32), ("validation", 16), ("test", 16)]:
        d = root / split
        d.mkdir()
        for i in range(n):
            arr = rs.randint(0, 255, (IMG, IMG, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return str(root) + "/"


def test_dataset_and_loader(image_folder):
    ds = ImageFolderDataset(image_folder + "train/", IMG)
    assert len(ds) == 32
    img = ds[0]
    assert img.shape == (IMG, IMG, 3) and img.dtype == np.uint8

    loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1,
                    num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["image"].shape == (8, IMG, IMG, 3)
    # deterministic order per epoch
    loader2 = Loader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1,
                     num_workers=2)
    b1 = list(loader)[0]["image"]
    b2 = list(loader2)[0]["image"]
    np.testing.assert_array_equal(b1, b2)


def test_loader_pads_final_batch(image_folder):
    ds = ImageFolderDataset(image_folder + "validation/", IMG)
    loader = Loader(ds, batch_size=6, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["image"].shape == (6, IMG, IMG, 3)
    assert batches[-1]["mask"].sum() == 16 - 12


@pytest.mark.parametrize("q_type", ["standard", "ema", "gumbel", "entropy"])
def test_train_step_runs_and_descends(q_type):
    """Single-device: a few steps on a fixed batch must reduce the loss."""
    cfg = tiny_cfg(q_type)
    trainer = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=4)
    state = trainer.init_state()
    rs = np.random.RandomState(0)
    batch = {"image": rs.randint(0, 255, (8, IMG, IMG, 3), np.uint8)}

    losses = []
    for _ in range(6):
        state, metrics = trainer.train_step(state, batch, epoch=0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6
    assert int(state.usage_count.sum()) == 6 * 8 * (IMG // 4) ** 2


def test_train_e2e_mesh_checkpoint_resume(image_folder, tmp_path):
    """Full run_training on the 8-device CPU mesh + resume from checkpoint."""
    assert len(jax.devices()) == 8
    cfg = tiny_cfg("ema")
    mesh = create_mesh()
    train_loader = Loader(ImageFolderDataset(image_folder + "train/", IMG),
                          batch_size=16, shuffle=True, drop_last=True, seed=0)
    val_loader = Loader(ImageFolderDataset(image_folder + "validation/", IMG),
                        batch_size=16, shuffle=False, drop_last=False)

    logger = MetricLogger(str(tmp_path), "run")
    state, trainer = run_training(
        cfg, train_loader, val_loader, seed=0, learning_rate=1e-3,
        save_dir=str(tmp_path), run_name="run", logger=logger, mesh=mesh,
        max_epochs=2, check_val_every=1)
    logger.finish()

    assert int(state.step) == 2 * len(train_loader)
    # metrics written
    lines = [json.loads(l) for l in
             open(tmp_path / "run" / "metrics.jsonl").read().splitlines()]
    assert any("validation/loss" in l for l in lines)
    assert any("val_metrics/perplexity" in l for l in lines)

    # checkpoint layout: epoch dirs + last
    assert (tmp_path / "run" / "last").exists()
    assert (tmp_path / "run" / "epoch_0000").exists()

    # resume continues the step counter
    state2, _ = run_training(
        cfg, train_loader, val_loader, seed=0, learning_rate=1e-3,
        save_dir=str(tmp_path), run_name="run2", logger=MetricLogger(str(tmp_path), "run2"),
        resume_path=str(tmp_path / "run" / "last"), mesh=mesh,
        max_epochs=3, check_val_every=10)
    assert int(state2.step) == 3 * len(train_loader)

    # eval-style weight-only restore
    trainer_eval = Trainer(cfg=cfg, learning_rate=1e-3, seed=0,
                           steps_per_epoch=1)
    st = restore_for_eval(str(tmp_path / "run" / "last"), trainer_eval.init_state())
    np.testing.assert_allclose(
        np.asarray(st.vq_state["quantizer"]["codebook"]),
        np.asarray(state.vq_state["quantizer"]["codebook"]), rtol=1e-6)


def test_mesh_matches_single_device():
    """One shard_map'd train step over 8 devices must equal the single-device
    step on the same global batch (grads pmean == global-batch grad)."""
    cfg = tiny_cfg("standard")
    rs = np.random.RandomState(3)
    batch = {"image": rs.randint(0, 255, (16, IMG, IMG, 3), np.uint8)}

    t_single = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=4)
    s_single = t_single.init_state()

    mesh = create_mesh()
    t_mesh = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=4,
                     mesh=mesh)
    s_mesh = t_mesh.init_state()

    # identical init
    for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_mesh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # NOTE: augmentation RNG differs (mesh folds in axis_index), so compare
    # with augmentations disabled via identical rng only on eval path instead:
    m_single, u_single, _ = t_single.eval_step(s_single, batch, 0)
    m_mesh, u_mesh, _ = t_mesh.eval_step(s_mesh, batch, 0)
    np.testing.assert_array_equal(np.asarray(u_single), np.asarray(u_mesh))
    for k in m_single:
        np.testing.assert_allclose(float(m_single[k]), float(m_mesh[k]),
                                   rtol=2e-4, atol=1e-5)


def test_validation_and_reinit(image_folder):
    cfg = tiny_cfg("standard")
    trainer = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=2)
    state = trainer.init_state()
    val_loader = Loader(ImageFolderDataset(image_folder + "validation/", IMG),
                        batch_size=8, shuffle=False, drop_last=True)
    metrics, usage = run_validation(trainer, state, val_loader, epoch=0)
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    assert usage.sum() == 16 * (IMG // 4) ** 2

    # force an unused code and reinit at epoch 2
    state = state.replace(usage_count=jnp.asarray(
        np.r_[np.zeros(16), np.ones(16) * 5].astype(np.int32)))
    cb_before = np.asarray(state.params["quantizer"]["codebook"])
    state2 = trainer.maybe_reinit_codes(state, epoch=2)
    cb_after = np.asarray(state2.params["quantizer"]["codebook"])
    assert not np.allclose(cb_before[:16], cb_after[:16])
    np.testing.assert_array_equal(cb_before[16:], cb_after[16:])


def test_r1_staging_cadence(image_folder):
    """R1 is staged compilation: the host loop must pick train_gan_r1 exactly
    on the r1_reg_every cadence, and r1_penalty must be nonzero only there."""
    loss = {"l1_weight": 1.0, "l2_weight": 1.0, "perc_weight": 1.0,
            "adversarial_params": {"start_epoch": 0,
                                   "loss_type": "non-saturating",
                                   "g_weight": 0.1, "use_adaptive": False,
                                   "r1_reg_weight": 10.0, "r1_reg_every": 2}}
    cfg = tiny_cfg("standard", loss=loss)
    trainer = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=4)
    assert trainer.steps.train_gan_r1 is not trainer.steps.train_gan

    state = trainer.init_state()
    batch = {"image": np.random.RandomState(0).randint(
        0, 255, (8, IMG, IMG, 3), np.uint8)}
    penalties = []
    for _ in range(4):
        state, metrics = trainer.train_step(state, batch, epoch=0)
        penalties.append(float(metrics["r1_penalty"]))
    # cadence 2: steps 0 and 2 carry the penalty, 1 and 3 don't
    assert penalties[0] > 0.0 and penalties[2] > 0.0
    assert penalties[1] == 0.0 and penalties[3] == 0.0

    # resume re-sync: a fresh trainer restarted mid-cadence must realign
    trainer.sync_host_step(state)
    assert trainer._host_step == int(state.step)


def test_eval_usage_ignores_padded_rows():
    """The padded final eval batch (mask=False rows) must not pollute the
    codebook-usage histogram (evaluate.py test suite correctness)."""
    cfg = tiny_cfg("standard")
    trainer = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=2)
    state = trainer.init_state()
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 255, (8, IMG, IMG, 3), np.uint8)

    full = {"image": imgs, "mask": np.ones((8,), bool)}
    half_mask = np.r_[np.ones(4), np.zeros(4)].astype(bool)
    padded = {"image": np.concatenate([imgs[:4], np.zeros_like(imgs[:4])]),
              "mask": half_mask}
    unpadded = {"image": imgs[:4], "mask": np.ones((4,), bool)}

    _, u_full, _ = trainer.eval_step(state, full, 0)
    _, u_padded, _ = trainer.eval_step(state, padded, 0)
    # same totals as evaluating only the 4 real rows (different batch shape
    # compiles a second executable; values must match exactly)
    _, u_unpadded, _ = trainer.eval_step(state, unpadded, 0)
    assert int(np.asarray(u_padded).sum()) == 4 * (IMG // 4) ** 2
    np.testing.assert_array_equal(np.asarray(u_padded), np.asarray(u_unpadded))
    assert int(np.asarray(u_full).sum()) == 8 * (IMG // 4) ** 2


def test_grad_accumulation_matches_full_batch():
    """grad_accum_steps=2 must produce (numerically) the same update as one
    full-batch step for stateless quantizers: equal micro-batches mean the
    accumulated mean-of-means equals the full-batch mean."""
    rs = np.random.RandomState(0)
    batch = {"image": rs.randint(0, 255, (8, IMG, IMG, 3), np.uint8)}

    results = {}
    for accum in (1, 2):
        cfg = tiny_cfg("standard")
        import dataclasses
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training,
                                              grad_accum_steps=accum))
        trainer = Trainer(cfg=cfg, learning_rate=1e-3, seed=0,
                          steps_per_epoch=4)
        state = trainer.init_state()
        # neutralize augmentation randomness: identical rng stream, but augs
        # sample per-micro -> different crops. Compare by disabling crops:
        # use full-scale deterministic images via monkeypatched preprocess?
        # Simpler: run several steps and check losses stay close in
        # expectation is flaky — instead compare the usage histogram path and
        # that training descends; exact-grad equality is checked below with
        # augmentation-insensitive constant images.
        const = {"image": np.full((8, IMG, IMG, 3), 128, np.uint8)}
        s1, m1 = trainer.train_step(state, const, epoch=0)
        results[accum] = (s1, m1)

    (s_full, m_full), (s_acc, m_acc) = results[1], results[2]
    # constant images are augmentation-invariant (any crop of a constant
    # image is the same constant), so the accumulated mean-of-means must
    # equal the full-batch mean up to fp reorder. (Post-optimizer params are
    # NOT compared: adam with b1=0 makes the first update ~sign(g)*lr, which
    # amplifies reorder noise on near-zero gradients to O(lr).)
    for k in ("loss", "l1_loss", "l2_loss", "quant_loss"):
        np.testing.assert_allclose(float(m_full[k]), float(m_acc[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    np.testing.assert_array_equal(np.asarray(s_full.usage_count),
                                  np.asarray(s_acc.usage_count))


def test_grad_accumulation_gan_runs():
    """The staged GAN step (incl. R1) must compile and run with accumulation,
    and the mbstd guard must see the micro-batch size."""
    import dataclasses
    loss = {"l1_weight": 1.0, "l2_weight": 1.0, "perc_weight": 1.0,
            "adversarial_params": {"start_epoch": 0,
                                   "loss_type": "non-saturating",
                                   "g_weight": 0.1, "use_adaptive": False,
                                   "r1_reg_weight": 10.0, "r1_reg_every": 2}}
    cfg = tiny_cfg("standard", loss=loss)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, grad_accum_steps=2))
    trainer = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=4)
    state = trainer.init_state()
    batch = {"image": np.random.RandomState(0).randint(
        0, 255, (8, IMG, IMG, 3), np.uint8)}
    state, metrics = trainer.train_step(state, batch, epoch=0)  # R1 step
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["r1_penalty"]) > 0.0
    state, metrics = trainer.train_step(state, batch, epoch=0)  # plain step
    assert float(metrics["r1_penalty"]) == 0.0
    assert float(metrics["disc_loss"]) != 0.0


def test_training_is_deterministic():
    """Same seed + same data -> identical first-step metrics and params
    across two fresh Trainers (the reference's pl.seed_everything +
    deterministic=True contract, train.py:67,130)."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg("standard")
    images = np.random.RandomState(3).randint(0, 255, (8, 16, 16, 3), np.uint8)

    outs = []
    for _ in range(2):
        tr = Trainer(cfg=cfg, learning_rate=1e-4, seed=123, steps_per_epoch=4,
                     mesh=None, compute_dtype=jnp.float32, remat=False)
        state = tr.init_state()
        state, metrics = tr.train_step(state, {"image": images}, epoch=0)
        outs.append((jax.tree.map(np.asarray, state.params),
                     {k: float(v) for k, v in metrics.items()}))
    (p1, m1), (p2, m2) = outs
    assert m1 == m2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)
