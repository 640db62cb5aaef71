"""Training state: one pytree carrying everything a train step touches.

Replaces the reference's Lightning-managed mutable module state (optimizers,
EMA buffers, usage counters — model.py:232-307) with an explicit, donatable,
checkpointable struct. All fields are arrays or pytrees of arrays so the
state shards/replicates cleanly across the mesh and serializes with orbax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray                      # global step, int32
    params: Any                            # encoder/decoder/quantizer params
    opt_state: Any                         # AE optimizer state
    vq_state: Optional[Any]                # EMA quantizer collection (or None)
    disc_params: Optional[Any]             # discriminator params (GAN only)
    disc_opt_state: Optional[Any]
    rng: jax.Array                         # folded per step for augs/gumbel
    usage_count: jnp.ndarray               # per-code usage this epoch (N,)

    def next_rng(self):
        """Per-step rng derivation; callers additionally fold in the mesh
        axis index so each replica draws distinct augmentation noise."""
        return jax.random.fold_in(self.rng, self.step)


def create_train_state(params, opt_state, num_embeddings: int, seed: int,
                       vq_state=None, disc_params=None,
                       disc_opt_state=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        vq_state=vq_state,
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
        rng=jax.random.PRNGKey(seed),
        usage_count=jnp.zeros((num_embeddings,), jnp.int32),
    )
