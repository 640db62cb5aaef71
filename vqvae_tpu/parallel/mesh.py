"""Device mesh + sharding utilities.

The reference's entire distributed story is Lightning DDP over NCCL
(train.py:128, SURVEY §2.3). The TPU-native equivalent is a 1-D
data-parallel mesh over ICI (multi-slice: DCN via jax.distributed), with the
train step shard_map'd over the ``data`` axis — gradients, EMA accumulators
and metrics psum on the interconnect (see vqvae_tpu/train/steps.py).

The mesh is deliberately N-D-ready: ``create_mesh`` accepts extra axes (e.g.
('data', 'model')) for future tensor-parallel experiments, but the VQGAN
workload is conv-dominated with 72M params — pure DP is the right mapping
(params replicate, activations shard on batch).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init_if_needed():
    """Multi-host init from standard env vars (no-op single-host).

    Replaces Lightning's NODE_RANK/DDP bootstrap (reference train.py:53,128).

    Also honors VQVAE_TPU_PLATFORM (e.g. "cpu") / VQVAE_TPU_CPU_DEVICES=N:
    the JAX_PLATFORMS env var is ineffective on this stack (the axon TPU
    plugin re-registers itself), so CLIs need an in-process
    ``jax.config.update`` BEFORE the first backend touch. This is the knob
    that lets train/evaluate run hermetically during accelerator-tunnel
    outages (the same failure mode the driver entry points guard against).
    """
    import os
    plat = os.environ.get("VQVAE_TPU_PLATFORM", "").strip().lower()
    if plat:
        jax.config.update("jax_platforms", plat)
        n = os.environ.get("VQVAE_TPU_CPU_DEVICES", "").strip()
        if n and plat == "cpu":
            jax.config.update("jax_num_cpu_devices", int(n))
        if plat == "cpu":
            os.environ.setdefault("VQVAE_TPU_XLA_OPTS", "none")
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def create_mesh(axes: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Mesh over all (or given) devices; default 1-D data-parallel."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    assert math.prod(shape) == len(devices), (shape, len(devices))
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def local_batch_size(cumulative_bs: int, mesh: Mesh) -> int:
    """Per-host batch from the global batch (reference train.py:60 computes
    per-device; here the loader produces per-host batches and the mesh
    splits them per-device)."""
    n_global = mesh.devices.size
    n_local = max(1, n_global // jax.process_count())
    per_device = cumulative_bs // n_global
    if per_device * n_global != cumulative_bs:
        raise ValueError(
            f"cumulative_bs={cumulative_bs} not divisible by {n_global} devices")
    return per_device * n_local


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch sharded along the batch dimension.

    Multi-host: each process holds its local slice of the global batch;
    ``make_array_from_process_local_data`` assembles the global array across
    hosts (the loader contract in vqvae_tpu/data/dataset.py — per-host batch
    = global / process_count).
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def local_rows(arr) -> np.ndarray:
    """Host-local rows of a (possibly multi-process) batch-sharded array.

    ``np.asarray`` on an array spanning non-addressable devices raises; each
    host's addressable shards are exactly its own loader's rows, in order
    (the make_array_from_process_local_data contract in shard_batch)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
