"""Spatial (image-height) sharding for high-resolution tokenizer inference.

The reference has no equivalent: its "long context" axis is image
resolution, which it can only scale until one GPU's memory runs out
(SURVEY §5 "long-context: N/A — scales through conv locality"). On TPU the
idiomatic answer is GSPMD **spatial partitioning**: jit the inference API
with the image HEIGHT dimension sharded across the mesh and let XLA insert
the conv halo exchanges (and the GroupNorm all-reduces) automatically over
ICI. Activations then scale ~1/n_devices per chip, so a v5e-8 tokenizes
images whose activation footprint would OOM a single chip.

Pure-convolutional locality is exactly what makes this exact: every op in
the encoder/decoder is either elementwise, a conv (finite halo), a pool
(aligned to the shard grid for H % (2^levels * n_shards) == 0), or a global
reduction (GroupNorm statistics) that GSPMD turns into an all-reduce.
Token outputs are replicated (tiny next to the images); image outputs of
the reconstruct methods stay H-sharded so the output itself never has to
fit on one chip either.

The VQ code-assignment runs with the XLA matmul path inside this jit: a
Pallas custom call is opaque to the GSPMD partitioner, which would have to
all-gather its operands (ops/vq.py forced_impl).

EVIDENCE STATUS (honesty note): outputs are exact-equal to the unsharded
model on the 8-virtual-device CPU mesh (test_spatial_sharding) — but this
box has ONE real chip, so multi-chip halo-exchange *performance* over real
ICI is unmeasured. The measured capability today is the single-chip
resolution ceiling (tools/probe_max_resolution.py; recorded in
PERFORMANCE.md); treat multi-chip spatial scaling as "exact, CPU-verified"
until a real multi-chip run is recorded here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqvae_tpu.ops.vq import forced_impl


def make_spatial_apply(model, variables, mesh: Mesh, method: str = "get_tokens",
                       axis: str = "data", **method_kw):
    """Jitted ``fn(images) -> output`` with images [B, H, W, C] sharded on H.

    Args:
      model: the VQVAE flax module.
      variables: its variable collections (replicated across the mesh).
      mesh: device mesh; ``axis`` names the dimension H is sharded over.
      method: inference API method — 'get_tokens', 'quantize', 'reconstruct',
        or 'reconstruct_from_tokens' (the latter shards the token grid's
        height instead).
      method_kw: static keyword args forwarded to the method (e.g.
        ``deterministic=True`` for the gumbel tokenizer).

    H must be divisible by n_shards * 2**len(channel_multipliers) so every
    pooling level stays aligned to the shard grid.
    """
    n_shards = mesh.shape[axis]

    if method == "reconstruct_from_tokens":
        # tokens are (B, S) with S = h*w — shard the flattened token rows;
        # the decoder's latent reshape then puts the split on latent H
        in_spec = P(None, axis)
    else:
        in_spec = P(None, axis, None, None)

    def fn(variables, x):
        with forced_impl("xla"):
            return model.apply(variables, x, method=method, **method_kw)

    # output sharding: token outputs are tiny -> replicate; full-resolution
    # image outputs (the reconstruct methods) must STAY sharded on H, or the
    # replicated result re-introduces the single-chip memory ceiling this
    # feature exists to avoid
    if method in ("reconstruct", "reconstruct_from_tokens"):
        out_spec = P(None, axis, None, None)
    else:
        out_spec = P()

    jitted = jax.jit(
        fn,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, in_spec)),
        out_shardings=NamedSharding(mesh, out_spec),
    )

    # every pooling level must stay aligned to the shard grid
    levels = len(getattr(model, "channel_multipliers", ()) or ())
    h_align = n_shards * (2 ** levels)

    def apply(images):
        if method == "reconstruct_from_tokens":
            hw = int(round(images.shape[1] ** 0.5))
            if hw % n_shards != 0:
                raise ValueError(
                    f"token grid height {hw} not divisible by {n_shards} "
                    f"'{axis}' shards")
        else:
            h = images.shape[1]
            if h % h_align != 0:
                raise ValueError(
                    f"image height {h} must be divisible by n_shards * "
                    f"2**levels = {n_shards} * {2 ** levels} = {h_align}")
        return jitted(variables, images)

    return apply
