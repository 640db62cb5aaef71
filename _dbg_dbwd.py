import os, numpy as np, jax, jax.numpy as jnp
rs = np.random.RandomState(0)
from vqvae_tpu.models.discriminator import Discriminator
disc = Discriminator(img_resolution=32, dtype=jnp.bfloat16)
x = jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32)
dp = disc.init(jax.random.PRNGKey(0), x)["params"]

def loss(module, d):
    return jnp.sum(jnp.tanh(module.apply({"params": d}, x).astype(jnp.float32)))

def grads(module):
    return jax.jit(jax.grad(lambda d: loss(module, d)))(dp)

g_plain = grads(disc)
os.environ["VQVAE_TPU_DBWD_IMPL"] = "xla"
g_cvjp_xla = grads(disc.clone(fused_dbwd=True, fused_skip=True))
os.environ["VQVAE_TPU_DBWD_IMPL"] = "pallas"
g_cvjp_pal = grads(disc.clone(fused_dbwd=True, fused_skip=True))

flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
flat_x = jax.tree.leaves(g_cvjp_xla)
flat_k = jax.tree.leaves(g_cvjp_pal)
for (path, a), bx, bk in zip(flat_p, flat_x, flat_k):
    scale = float(jnp.max(jnp.abs(a))) + 1e-6
    ex = float(jnp.max(jnp.abs(a - bx))) / scale
    ek = float(jnp.max(jnp.abs(a - bk))) / scale
    name = "/".join(str(p.key) for p in path)
    flag = " <<<" if max(ex, ek) > 3e-2 else ""
    print(f"{name:60s} xla-vjp {ex:.2e}  pallas {ek:.2e}{flag}")
