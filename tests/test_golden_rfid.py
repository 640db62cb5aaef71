"""Golden-value pin for the FULL rFID pipeline (VERDICT r3 item 8).

test_inception_parity pins each component (inception forward vs torch, TF1
resize, Frechet math) and test_eval_metrics pins the metric accumulators —
but nothing pinned the end-to-end VALUE of

    tokenize -> reconstruct -> uint8 -> TF1-resize -> inception pool3
    -> streaming moments -> Frechet

through the real ``evaluate_checkpoint`` code path (the chain the eventual
quality claim vs the reference's published rFID 6.30/6.17, readme.md:144-156,
will rest on — reference eval stack: model.py:491-562). A refactor anywhere
in that chain (uint8 bin convention, resize, masking, feature layout,
covariance) could silently drift rFID while every component test stays green.

Everything here is deterministic by construction: numpy-seeded inception
weights (independent of flax/torch init internals), threefry-seeded VQVAE
init, seeded input images. Golden constants were produced by this exact code
on the CPU test platform (fp32, highest matmul precision); tolerances leave
room for XLA version-level reduction-order drift but NOT for any semantic
change — if this test fails after an eval-stack change, the change moved the
metric: do not re-pin without understanding why.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# golden values from the pinned run (see module docstring)
GOLDEN = {
    "rfid": 30.8629259,
    "real_feat_mean": 0.3314918,
    "mse": 0.1064603,
    "perplexity": 13.6498013,
}


@pytest.fixture(scope="module")
def inception_npz(tmp_path_factory):
    """Deterministic full-architecture FID-inception weights: kaiming-like
    conv kernels + small biases filled per sorted flat key from one numpy
    stream (stable across jax/flax versions, unlike library init internals)."""
    from vqvae_tpu.eval.inception import InceptionV3Pool3

    model = InceptionV3Pool3()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    # NOTE: lpips.flatten_params would np.asarray the ShapeDtypeStruct leaves
    # into 0-d object arrays — walk the tree ourselves
    leaves, _ = jax.tree_util.tree_flatten_with_path(shapes["params"])
    flat = {"/".join(k.key for k in path): leaf.shape
            for path, leaf in leaves}

    rs = np.random.RandomState(7)
    out = {}
    for key in sorted(flat):
        shape = flat[key]
        if key.endswith("/kernel"):  # HWIO: fan_in = H*W*I
            fan_in = int(np.prod(shape[:-1]))
            out[key] = np.asarray(rs.randn(*shape) * np.sqrt(2.0 / fan_in),
                                  np.float32)
        else:  # bias (np.asarray: scalar-shaped leaves come back as float)
            out[key] = np.asarray(rs.randn(*shape) * 0.1, np.float32)

    path = tmp_path_factory.mktemp("golden_fid") / "inception_fid.npz"
    np.savez(path, **out)
    return str(path)


def test_golden_rfid_pipeline(inception_npz, monkeypatch):
    from evaluate import evaluate_checkpoint
    from vqvae_tpu.config import parse_config
    from vqvae_tpu.eval.fid import load_inception_extractor
    from vqvae_tpu.train.loop import Trainer

    monkeypatch.setenv("VQVAE_TPU_INCEPTION_WEIGHTS", inception_npz)

    # --- extractor-level pin: catches resize / preprocessing / inception
    # drift separately from the VQVAE side
    extractor, dim = load_inception_extractor()
    assert dim == 2048
    rs = np.random.RandomState(0)
    probe = rs.randint(0, 256, (2, 16, 16, 3), np.uint8)
    feats = np.asarray(extractor(probe))
    assert np.isfinite(feats).all()

    # --- full-chain pin through the real evaluate_checkpoint
    cfg = parse_config({
        "image_size": 16,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    })
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=1,
                      mesh=None, compute_dtype=jnp.float32)
    state = trainer.init_state()

    # two fixed batches, the second mask-padded (the masked rows carry
    # garbage on purpose: leaking them into any accumulator moves the pins)
    imgs = rs.randint(0, 256, (6, 16, 16, 3), np.uint8)
    batches = [
        {"image": imgs[:2], "mask": np.array([True, True])},
        {"image": np.concatenate([imgs[2:6]]),
         "mask": np.array([True, True, False, False])},
    ]
    results = evaluate_checkpoint(cfg, state, trainer, batches, verbose=False)

    assert "rfid" in results, "extractor present but rFID missing"
    actual = {"rfid": float(results["rfid"]),
              "real_feat_mean": float(feats.mean()),
              "mse": float(results["mse"]),
              "perplexity": float(results["perplexity"])}
    if os.environ.get("VQVAE_TPU_GOLDEN_REGEN"):
        # re-pin ONLY after understanding why the value moved (see module
        # docstring): VQVAE_TPU_GOLDEN_REGEN=1 pytest -s tests/test_golden_rfid.py
        print(f"\nGOLDEN = {actual!r}")
        pytest.skip("golden-regen mode: values printed, nothing asserted")

    np.testing.assert_allclose(actual["real_feat_mean"],
                               GOLDEN["real_feat_mean"], rtol=1e-3)
    np.testing.assert_allclose(actual["mse"], GOLDEN["mse"], rtol=1e-3)
    np.testing.assert_allclose(actual["perplexity"], GOLDEN["perplexity"],
                               rtol=1e-3)
    # the headline: Frechet over 4 real / 4 recon samples of the golden
    # extractor — sensitive to every stage of the chain
    np.testing.assert_allclose(actual["rfid"], GOLDEN["rfid"], rtol=2e-3)
