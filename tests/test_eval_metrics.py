"""Eval metric suite: SSIM/PSNR parity with torch-computed references, FID
statistics math, inception architecture shape check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.eval.fid import FID, FIDAccumulator, frechet_distance
from vqvae_tpu.eval.metrics import ReconMetrics, mse_per_sample, ssim_per_sample


def _pair(seed=0, b=4, s=32):
    rs = np.random.RandomState(seed)
    x = rs.rand(b, s, s, 3).astype(np.float32)
    y = np.clip(x + rs.randn(b, s, s, 3).astype(np.float32) * 0.05, 0, 1)
    return x, y


def test_mse_psnr():
    x, y = _pair()
    m = ReconMetrics()
    m.update(jnp.asarray(y), jnp.asarray(x))
    out = m.compute()
    expected_mse = float(np.mean((x - y) ** 2))
    assert out["mse"] == pytest.approx(expected_mse, rel=1e-5)
    assert out["psnr"] == pytest.approx(10 * np.log10(1.0 / expected_mse), rel=1e-5)


def test_ssim_identity_and_bounds():
    x, y = _pair(1)
    s_same = np.asarray(ssim_per_sample(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    s = np.asarray(ssim_per_sample(jnp.asarray(x), jnp.asarray(y)))
    assert (s <= 1.0 + 1e-6).all() and (s > 0).all()


def test_ssim_matches_reference_formula():
    """Compare against a trusted numpy implementation (Wang et al. gaussian
    SSIM, same constants as torchmetrics defaults)."""
    from scipy_free_ssim import ssim_numpy  # local helper below
    x, y = _pair(2, b=2, s=24)
    got = np.asarray(ssim_per_sample(jnp.asarray(x), jnp.asarray(y)))
    want = np.array([ssim_numpy(x[i], y[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_masked_updates():
    x, y = _pair(3)
    m = ReconMetrics()
    mask = np.array([True, True, False, False])
    m.update(jnp.asarray(y), jnp.asarray(x), mask)
    out = m.compute()
    expected = float(np.mean((x[:2] - y[:2]) ** 2))
    assert out["mse"] == pytest.approx(expected, rel=1e-5)


def test_frechet_distance_identical_is_zero():
    rs = np.random.RandomState(0)
    feats = rs.randn(500, 16)
    a = FIDAccumulator(16)
    b = FIDAccumulator(16)
    a.update(feats)
    b.update(feats)
    mu_a, cov_a = a.stats()
    assert frechet_distance(mu_a, cov_a, *b.stats()) == pytest.approx(0.0, abs=1e-8)


def test_frechet_distance_mean_shift():
    """FD between N(0,I) and N(mu,I) is |mu|^2 (in expectation)."""
    rs = np.random.RandomState(1)
    d = 8
    a = FIDAccumulator(d)
    b = FIDAccumulator(d)
    shift = np.ones(d) * 2.0
    a.update(rs.randn(20000, d))
    b.update(rs.randn(20000, d) + shift)
    fd = frechet_distance(*a.stats(), *b.stats())
    assert fd == pytest.approx(float(shift @ shift), rel=0.05)


def test_fid_streaming_matches_batch():
    rs = np.random.RandomState(2)
    feats = rs.randn(100, 4)
    acc = FIDAccumulator(4)
    for i in range(0, 100, 10):
        acc.update(feats[i:i + 10])
    mu, cov = acc.stats()
    np.testing.assert_allclose(mu, feats.mean(0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(feats.T), rtol=1e-8)


def test_inception_arch_shapes():
    """2048-d pool3 features; parameter count matches the FID inception
    (23.8M conv params after BN fold)."""
    from vqvae_tpu.eval.inception import InceptionV3Pool3, preprocess_fid_input
    model = InceptionV3Pool3()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    out = jax.eval_shape(model.apply, variables, x)
    assert out.shape == (1, 2048)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    assert 21e6 < n < 24e6, n

    pre = preprocess_fid_input(jnp.zeros((2, 64, 64, 3), jnp.uint8))
    assert pre.shape == (2, 299, 299, 3)
    assert float(pre.min()) == -1.0


# ---------------------------------------------------------------------------
# local numpy SSIM oracle (no scipy dependency)
import sys
import types

_mod = types.ModuleType("scipy_free_ssim")


def _ssim_numpy(x, y, data_range=1.0, ksize=11, sigma=1.5, k1=0.01, k2=0.03):
    ax = np.arange(ksize) - (ksize - 1) / 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    g /= g.sum()
    kern = np.outer(g, g)

    def filt(im):
        h, w = im.shape
        out = np.zeros((h - ksize + 1, w - ksize + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = (im[i:i + ksize, j:j + ksize] * kern).sum()
        return out

    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        mx, my = filt(xc), filt(yc)
        sx = filt(xc * xc) - mx * mx
        sy = filt(yc * yc) - my * my
        sxy = filt(xc * yc) - mx * my
        s = ((2 * mx * my + c1) * (2 * sxy + c2)) / \
            ((mx ** 2 + my ** 2 + c1) * (sx + sy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


_mod.ssim_numpy = _ssim_numpy
sys.modules["scipy_free_ssim"] = _mod


def test_evaluate_checkpoint_mesh_matches_single(tmp_path):
    """The full evaluate_checkpoint suite must produce identical results on
    the 8-device mesh and on a single device (mask-filtered partial batch
    included) — the multi-device path of the evaluate.py CLI."""
    import dataclasses
    from PIL import Image
    from evaluate import evaluate_checkpoint
    from vqvae_tpu.config import parse_config
    from vqvae_tpu.data.dataset import ImageFolderDataset, Loader
    from vqvae_tpu.parallel.mesh import create_mesh, replicate
    from vqvae_tpu.train.loop import Trainer

    img = 16
    d = tmp_path / "test"
    d.mkdir()
    rs = np.random.RandomState(0)
    for i in range(20):  # 20 % 16 != 0 -> padded final batch on the mesh
        Image.fromarray(rs.randint(0, 255, (img, img, 3), np.uint8)).save(
            d / f"i{i:02d}.png")

    cfg = parse_config({
        "image_size": img,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "training": {"cumulative_bs": 16, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    })

    def run(mesh):
        trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0,
                          steps_per_epoch=1, mesh=mesh)
        state = trainer.init_state()
        if mesh is not None:
            state = replicate(state, mesh)
        loader = Loader(ImageFolderDataset(str(d), img), batch_size=16,
                        shuffle=False, drop_last=False)
        return evaluate_checkpoint(cfg, state, trainer, loader, verbose=False)

    r_single = run(None)
    r_mesh = run(create_mesh())
    assert set(r_single) == set(r_mesh)
    for k in r_single:
        np.testing.assert_allclose(r_single[k], r_mesh[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_evaluate_cli_requires_rfid(monkeypatch, tmp_path):
    """Missing inception weights must be a LOUD failure (exit with a message
    naming the converter command), not a silent rFID skip — unless the user
    explicitly opts out with --allow_missing_rfid."""
    import evaluate

    monkeypatch.setenv("VQVAE_TPU_INCEPTION_WEIGHTS",
                       str(tmp_path / "missing.npz"))
    argv = ["evaluate.py", "--params_file", str(tmp_path / "nope.yaml"),
            "--dataset_path", str(tmp_path), "--batch_size", "8",
            "--seed", "0", "--loading_path", str(tmp_path / "ckpt")]

    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit) as exc:
        evaluate.main()
    assert "convert_inception_weights" in str(exc.value)

    # with the opt-in flag the gate passes; the run then fails LATER on the
    # (deliberately bogus) params file instead
    monkeypatch.setattr(sys, "argv", argv + ["--allow_missing_rfid"])
    with pytest.raises((FileNotFoundError, OSError)):
        evaluate.main()
