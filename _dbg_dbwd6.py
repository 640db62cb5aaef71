import os, numpy as np, jax, jax.numpy as jnp
from vqvae_tpu.models.discriminator import DiscriminatorBlock
rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(4, 32, 32, 128), jnp.bfloat16)
ct = jnp.asarray(rs.randn(4, 16, 16, 128), jnp.bfloat16)

def run(fused_skip, impl):
    os.environ["VQVAE_TPU_DBWD_IMPL"] = impl
    blk = DiscriminatorBlock(tmp_channels=128, out_channels=128,
                             has_fromrgb=False, dtype=jnp.bfloat16,
                             fused_dbwd=False, fused_skip=fused_skip)
    p = blk.init(jax.random.PRNGKey(0), x, None)["params"]
    @jax.jit
    def f(xx, cc):
        y, vjp = jax.vjp(lambda a: blk.apply({"params": p}, a, None), xx)
        (dx,) = vjp(cc)
        return y, dx
    y, dx = f(x, ct)
    return np.asarray(y.astype(jnp.float32)), np.asarray(dx.astype(jnp.float32))

y0, d0 = run(False, "xla")
ys, dxs = run(True, "xla")
yp, dxp = run(True, "pallas")
print("y  diff xla-vjp:", np.abs(y0-ys).max(), " pallas:", np.abs(y0-yp).max())
print("dx diff xla-vjp:", np.abs(d0-dxs).max(), " pallas:", np.abs(d0-dxp).max())
bad = np.argwhere(np.abs(y0-yp) > 1e-3)
print("corrupt y elements:", bad.shape[0], "of", y0.size)
if bad.shape[0]:
    print("first/last corrupt idx:", bad[0], bad[-1])
