import os, numpy as np, jax, jax.numpy as jnp
rs = np.random.RandomState(0)
from vqvae_tpu.models.discriminator import Discriminator
disc = Discriminator(img_resolution=32, dtype=jnp.bfloat16)
x = jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32)
dp = disc.init(jax.random.PRNGKey(0), x)["params"]

def loss(module, d):
    return jnp.sum(jnp.tanh(module.apply({"params": d}, x).astype(jnp.float32)))

def vgrads(module):
    return jax.jit(jax.value_and_grad(lambda d: loss(module, d)))(dp)

os.environ["VQVAE_TPU_DBWD_IMPL"] = "pallas"
lf, g_f = vgrads(disc.clone(fused_dbwd=True, fused_skip=True))
lf = float(lf)
os.environ["VQVAE_TPU_DBWD_IMPL"] = "xla"
lx, g_x = vgrads(disc.clone(fused_dbwd=True, fused_skip=True))
lx = float(lx)
lp, g_p = vgrads(disc)
lp = float(lp)
print(f"loss plain={lp:.6f} cvjp-xla={lx:.6f} cvjp-pallas={lf:.6f}")
# isolate: fused_dbwd only, fused_skip only (pallas)
os.environ["VQVAE_TPU_DBWD_IMPL"] = "pallas"
_, g_d = vgrads(disc.clone(fused_dbwd=True, fused_skip=False))
_, g_s = vgrads(disc.clone(fused_dbwd=False, fused_skip=True))
flat_p, _ = jax.tree_util.tree_flatten_with_path(g_p)
for (path, a), bd, bs in zip(flat_p, jax.tree.leaves(g_d), jax.tree.leaves(g_s)):
    scale = float(jnp.max(jnp.abs(a))) + 1e-6
    ed = float(jnp.max(jnp.abs(a - bd))) / scale
    es = float(jnp.max(jnp.abs(a - bs))) / scale
    name = "/".join(str(p.key) for p in path)
    print(f"{name:60s} dbwd-only {ed:.2e}  skip-only {es:.2e}")
