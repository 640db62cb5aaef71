import os, numpy as np, jax, jax.numpy as jnp
from vqvae_tpu.models.discriminator import DiscriminatorBlock
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(4, 32, 32, 128), jnp.bfloat16)

def run(fused_dbwd, fused_skip, impl):
    os.environ["VQVAE_TPU_DBWD_IMPL"] = impl
    blk = DiscriminatorBlock(tmp_channels=128, out_channels=128,
                             has_fromrgb=False, dtype=jnp.bfloat16,
                             fused_dbwd=fused_dbwd, fused_skip=fused_skip)
    p = blk.init(jax.random.PRNGKey(0), x, None)["params"]
    def loss(xx):
        return jnp.sum(jnp.square(blk.apply({"params": p}, xx, None).astype(jnp.float32)))
    l, g = jax.jit(jax.value_and_grad(loss))(x)
    return float(l), g

l0, g0 = run(False, False, "xla")
for name, fd, fs in [("dbwd", True, False), ("skip", False, True), ("both", True, True)]:
    for impl in ("xla", "pallas"):
        l, g = run(fd, fs, impl)
        ge = float(jnp.max(jnp.abs(g.astype(jnp.float32) - g0.astype(jnp.float32))))
        gs = float(jnp.max(jnp.abs(g0.astype(jnp.float32)))) + 1e-6
        print(f"{name}/{impl}: loss {l:.6f} (plain {l0:.6f}) dX rel {ge/gs:.2e}")
