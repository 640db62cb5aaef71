import numpy as np, jax, jax.numpy as jnp
from vqvae_tpu.ops.fused_dbwd import (_blur_t_gate_xla, blur_t_gate_pallas,
                                      _skip_fanout_bwd_xla, skip_fanout_bwd_pallas)
rs = np.random.RandomState(1)
taps = tuple(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0)
alpha, gain = 0.2, float(np.sqrt(2.0))
for (b, h, w, c) in [(4,32,32,512), (4,16,16,512), (4,8,8,512), (2,64,32,256)]:
    dy = jnp.asarray(rs.randn(b, h+1, w+1, c), jnp.bfloat16)
    p0 = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    b0 = jnp.asarray(rs.randn(c), jnp.float32)
    dp_k, db_k = blur_t_gate_pallas(dy, p0, b0, taps, alpha, gain)
    dp_r, db_r = jax.jit(lambda a,x,y: _blur_t_gate_xla(a,x,y,taps,alpha,gain))(dy, p0, b0)
    dpe = float(jnp.max(jnp.abs(dp_k.astype(jnp.float32)-dp_r.astype(jnp.float32))))
    dbe = float(jnp.max(jnp.abs(db_k-db_r)))
    print(f"gate {b}x{h}x{w}x{c}: dp {dpe:.2e} db {dbe:.2e}")
for (b, h, w, c) in [(4,32,32,512), (4,16,16,512), (4,8,8,512)]:
    dc = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    dys = jnp.asarray(rs.randn(b, h//2, w//2, c), jnp.bfloat16)
    o_k = skip_fanout_bwd_pallas(dc, dys, taps)
    o_r = jax.jit(lambda a,x: _skip_fanout_bwd_xla(a,x,taps))(dc, dys)
    err = float(jnp.max(jnp.abs(o_k.astype(jnp.float32)-o_r.astype(jnp.float32))))
    print(f"skip {b}x{h}x{w}x{c}: {err:.2e}")
