"""GSPMD spatial (image-height) sharding for tokenizer inference
(parallel/spatial.py): sharded outputs must equal the single-device API
exactly — XLA's automatic conv halo exchange + GroupNorm all-reduce keep the
math identical, and the VQ assignment runs the exact-argmin XLA path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.vqvae import VQVAE, model_rngs
from vqvae_tpu.parallel.mesh import create_mesh
from vqvae_tpu.parallel.spatial import make_spatial_apply

IMG, N, D = 32, 32, 8


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return create_mesh(("data",), devices=jax.devices()[:4])


def _make_model(q_type="standard"):
    params = {"commitment_cost": 0.25}
    if q_type == "gumbel":
        params = {"straight_through": False, "temp": 1.0, "kl_cost": 0.01}
    model = VQVAE(image_size=IMG, channels=32, num_res_blocks=1,
                  channel_multipliers=(1, 2), num_embeddings=N,
                  embedding_dim=D, quantizer_type=q_type,
                  quantizer_params=tuple(sorted(params.items())))
    x = jnp.zeros((2, IMG, IMG, 3))
    variables = model.init(model_rngs(0, q_type), x, train=False)
    return model, variables


@pytest.mark.parametrize("q_type", ["standard", "gumbel"])
def test_spatial_get_tokens_matches_single_device(mesh4, q_type):
    model, variables = _make_model(q_type)
    images = jnp.asarray(np.random.RandomState(0).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    kw = {"deterministic": True} if q_type == "gumbel" else {}

    ref = model.apply(variables, images, method="get_tokens", **kw)
    sharded = make_spatial_apply(model, variables, mesh4,
                                 method="get_tokens", **kw)
    out = sharded(images)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spatial_reconstruct_matches_single_device(mesh4):
    model, variables = _make_model("standard")
    images = jnp.asarray(np.random.RandomState(1).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    ref = model.apply(variables, images, method="reconstruct")
    out = make_spatial_apply(model, variables, mesh4,
                             method="reconstruct")(images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_reconstruct_from_tokens(mesh4):
    model, variables = _make_model("standard")
    images = jnp.asarray(np.random.RandomState(2).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    tokens = model.apply(variables, images, method="get_tokens")
    ref = model.apply(variables, tokens, method="reconstruct_from_tokens")
    out = make_spatial_apply(model, variables, mesh4,
                             method="reconstruct_from_tokens")(tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_output_shardings(mesh4):
    """Token outputs are replicated (tiny); full-resolution image outputs of
    the reconstruct methods stay H-sharded — a replicated image output would
    reintroduce the single-chip memory ceiling spatial sharding exists to
    avoid (round-2 review finding)."""
    model, variables = _make_model("standard")
    images = jnp.asarray(np.random.RandomState(3).rand(2, IMG, IMG, 3)
                         .astype(np.float32))

    tokens = make_spatial_apply(model, variables, mesh4,
                                method="get_tokens")(images)
    assert tokens.sharding.is_fully_replicated

    recon = make_spatial_apply(model, variables, mesh4,
                               method="reconstruct")(images)
    assert not recon.sharding.is_fully_replicated
    spec = recon.sharding.spec
    assert spec[1] is not None and all(s is None for i, s in enumerate(spec)
                                       if i != 1), spec
    # each device holds only its H-slab: addressable shard height = H/4
    shard_shapes = {s.data.shape for s in recon.addressable_shards}
    assert shard_shapes == {(2, IMG // 4, IMG, 3)}


def test_spatial_rejects_unaligned_height(mesh4):
    model, variables = _make_model("standard")
    fn = make_spatial_apply(model, variables, mesh4, method="get_tokens")
    bad = jnp.zeros((1, 30, IMG, 3), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fn(bad)
    # aligned to shards but NOT to shards*2^levels (4*4=16) must also reject
    bad2 = jnp.zeros((1, 20, IMG, 3), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fn(bad2)
