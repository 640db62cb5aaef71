"""Distributed semantics on the 8-device CPU mesh: EMA codebook state is
psum-synchronized (global-batch EMA, fixing the reference's replica-local
drift), gradients are pmean'd, GAN step compiles and runs multi-device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vqvae_tpu.models.quantizers import EMAVectorQuantizer
from vqvae_tpu.parallel.mesh import create_mesh, local_batch_size

N, D = 16, 8


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_local_batch_size():
    mesh = create_mesh()
    assert local_batch_size(256, mesh) == 256  # single host: full batch local
    with pytest.raises(ValueError):
        local_batch_size(100, mesh)


def test_ema_update_is_global_across_shards():
    """EMA state updated under shard_map over 8 shards == EMA state updated
    on the concatenated global batch on one device."""
    mesh = create_mesh()
    rs = np.random.RandomState(0)
    z = rs.randn(16, 2, 2, D).astype(np.float32)
    cb = rs.randn(N, D).astype(np.float32) * 0.1
    vq_state = {"codebook": jnp.asarray(cb),
                "ema_count": jnp.ones((N,), jnp.float32),
                "ema_weight": jnp.asarray(cb)}

    # global single-device reference
    q_global = EMAVectorQuantizer(N, D, decay=0.9)
    _, upd_global = q_global.apply({"vq_state": vq_state}, jnp.asarray(z),
                                   train=True, mutable=["vq_state"])

    # sharded: each device sees 2 samples
    q_shard = EMAVectorQuantizer(N, D, decay=0.9, axis_name="data")

    def step(state, zz):
        (_, codes, _), upd = q_shard.apply({"vq_state": state}, zz,
                                           train=True, mutable=["vq_state"])
        return upd["vq_state"], codes

    fn = jax.jit(shard_map(step, mesh=mesh, in_specs=(P(), P("data")),
                           out_specs=(P(), P("data")), check_rep=False))
    upd_shard, codes = fn(vq_state, jnp.asarray(z))

    for key in ("ema_count", "ema_weight", "codebook"):
        np.testing.assert_allclose(
            np.asarray(upd_shard[key]),
            np.asarray(upd_global["vq_state"][key]), rtol=2e-5, atol=1e-6,
            err_msg=key)


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    recon, q_loss, codes = out
    assert recon.shape == args[0].shape
    assert np.isfinite(float(q_loss))


def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
