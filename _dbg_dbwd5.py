import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from vqvae_tpu.models.discriminator import DiscriminatorBlock
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(4, 32, 32, 128), jnp.bfloat16)
blk = DiscriminatorBlock(tmp_channels=128, out_channels=128,
                         has_fromrgb=False, dtype=jnp.bfloat16)
p = blk.init(jax.random.PRNGKey(0), x, None)["params"]

def trivial_pallas(v):
    def k(a_ref, o_ref):
        o_ref[...] = a_ref[...]
    return pl.pallas_call(k,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), v.dtype))(v)

def fwd_plain(xx):
    return jnp.sum(jnp.square(blk.apply({"params": p}, xx, None).astype(jnp.float32)))

def fwd_with_pallas(xx):
    z = trivial_pallas(jnp.zeros((8, 128), jnp.float32))
    return fwd_plain(xx) + jnp.sum(z) * 0.0

print("plain     :", float(jax.jit(fwd_plain)(x)))
print("with-noop :", float(jax.jit(fwd_with_pallas)(x)))
