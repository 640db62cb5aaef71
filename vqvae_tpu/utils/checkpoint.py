"""Orbax checkpointing: params + optimizer state + EMA buffers + counters.

Replaces Lightning's ModelCheckpoint (reference train.py:121-122:
save_last=True, save_top_k=-1, every_n_epochs=N) and `load_from_checkpoint`
resume (train.py:106-114) with orbax snapshots laid out as::

    <save_dir>/<run_name>/epoch_<E>/   (periodic, kept forever: save_top_k=-1)
    <save_dir>/<run_name>/last/        (overwritten every save)

Each snapshot stores the full TrainState pytree plus the epoch number, so a
restart resumes optimizer moments, EMA codebook state, usage counters, RNG
and the step counter exactly.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from vqvae_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, save_dir: str, run_name: str,
                 save_every_n_epochs: int = 1):
        self.dir = Path(save_dir) / run_name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.every = max(1, int(save_every_n_epochs))
        self._ckpt = ocp.PyTreeCheckpointer()

    def _payload(self, state: TrainState, epoch: int):
        return {"state": state, "epoch": epoch}

    def save(self, state: TrainState, epoch: int):
        payload = self._payload(state, epoch)
        if epoch % self.every == 0:
            self._save_to(self.dir / f"epoch_{epoch:04d}", payload)
        self._save_to(self.dir / "last", payload)

    def _save_to(self, path: Path, payload):
        # multi-host: EVERY process clears its locally-visible target
        # (ignore_errors tolerates the concurrent-rmtree races of a shared
        # filesystem; with host-local save dirs each host must remove its own
        # stale copy or orbax refuses the overwrite), then all processes sync
        # before entering orbax's save — orbax coordinates
        # single-writer-per-shard internally and expects all processes.
        if path.exists():
            shutil.rmtree(path, ignore_errors=True)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"ckpt_clear:{path.name}")
        # verify AFTER the barrier: on a shared filesystem a peer's rmtree
        # may still be in flight before the sync (ours no-ops via
        # ignore_errors), so a pre-barrier exists() check could observe a
        # half-deleted dir and abort a routine save. Post-barrier, retry with
        # a short backoff (NFS silly-rename cleanup is asynchronous) before
        # declaring a real failure — surfaced HERE rather than as an opaque
        # orbax overwrite error.
        for _ in range(3):
            if not path.exists():
                break
            shutil.rmtree(path, ignore_errors=True)
            time.sleep(0.2)
        if path.exists():
            raise RuntimeError(
                f"could not clear stale checkpoint dir {path} before "
                "save (files held open by another process?)")
        self._ckpt.save(str(path), payload)

    def restore(self, path: str, template_state: TrainState):
        """Restore a snapshot; `template_state` supplies the pytree structure
        and the destination shardings.

        Every restored leaf is explicitly re-placed on the template leaf's
        sharding: orbax hands back arrays in its own (single-device/host)
        layout, so without this a resume under a device mesh fails with
        mixed-device jit arguments — and a snapshot written under one
        topology could not continue under another (topology-change resume,
        pinned by test_topology_resume)."""
        template = self._payload(template_state, 0)
        restored = self._ckpt.restore(str(Path(path)), item=template)
        state = jax.tree.map(
            lambda x, t: (jax.device_put(x, t.sharding)
                          if isinstance(t, jax.Array) else x),
            restored["state"], template_state)
        return state, int(restored["epoch"])


def restore_for_eval(path: str, template_state: TrainState) -> TrainState:
    """Load only model weights (params / vq_state / step) from any snapshot,
    ignoring optimizer and discriminator state — the eval-time equivalent of
    the reference's ``load_from_checkpoint(strict=False, load_loss=False)``
    (evaluate.py:48-49).

    Arrays are restored as host numpy (no sharding metadata needed, so a
    snapshot written under any device topology loads in any process) and
    re-placed by jnp.asarray below.
    """
    import jax.numpy as jnp
    import numpy as np
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(str(Path(path)))
    # orbax metadata layout varies by version: StepMetadata(item_metadata=
    # TreeMetadata(tree=...)) on current, bare tree on older
    for attr in ("item_metadata", "tree"):
        if hasattr(meta, attr):
            meta = getattr(meta, attr)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    raw = ckptr.restore(str(Path(path)), restore_args=restore_args)
    saved = raw["state"]
    state = template_state.replace(
        params=jax.tree.map(jnp.asarray, saved["params"]),
        step=jnp.asarray(saved["step"], jnp.int32),
    )
    if saved.get("vq_state") is not None:
        state = state.replace(vq_state=jax.tree.map(jnp.asarray, saved["vq_state"]))
    return state


def save_eval_checkpoint(path: str, variables: dict, step: int = 0,
                         epoch: int = 0) -> None:
    """Write a weights-only snapshot readable by ``restore_for_eval`` —
    used by tools/import_torch_checkpoint.py to bring reference (PyTorch)
    checkpoints into this framework's eval pipeline.

    ``variables`` is a flax variables dict: {'params': ..., 'vq_state': ...?}.
    """
    import numpy as np
    p = Path(path)
    if p.exists():
        shutil.rmtree(p)
    payload = {
        "state": {
            "params": variables["params"],
            "vq_state": variables.get("vq_state"),
            "step": np.asarray(step, np.int32),
        },
        "epoch": epoch,
    }
    ocp.PyTreeCheckpointer().save(str(p), payload)


def latest_checkpoint(save_dir: str, run_name: str) -> Optional[str]:
    last = Path(save_dir) / run_name / "last"
    return str(last) if last.exists() else None
