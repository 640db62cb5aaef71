"""The training orchestrator — replaces pytorch_lightning.Trainer.

Drives the compiled steps from vqvae_tpu/train/steps.py with the reference's
training protocol (train.py:128-142, model.py:163-370):

- per-step LR / gumbel schedules evaluated inside the jitted step
- validation every 5 epochs (train.py:131 check_val_every_n_epoch=5)
- dead-code re-initialization every N epochs from the epoch's (whole-epoch)
  usage histogram (model.py:297-303)
- reconstruction panels at batch 2 (train: every 5th epoch; val: always —
  model.py:241,319)
- checkpoints every N epochs + 'last' (train.py:121-122)
- the discriminator phase starts at adversarial start_epoch by swapping in
  the GAN-staged compiled step (see steps.py docstring)
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.config import Config
from vqvae_tpu.models.discriminator import Discriminator
from vqvae_tpu.models.lpips import init_lpips
from vqvae_tpu.models.quantizers import (
    get_codebook_usage, reinit_unused_codes, reinit_unused_codes_ema)
from vqvae_tpu.models.vqvae import VQVAE, model_rngs
from vqvae_tpu.parallel.mesh import local_rows, shard_batch
from vqvae_tpu.train.optim import make_ae_optimizer, make_disc_optimizer
from vqvae_tpu.train.schedules import build_gumbel_schedules, build_lr_schedule
from vqvae_tpu.train.state import TrainState, create_train_state
from vqvae_tpu.train.steps import build_steps
from vqvae_tpu.utils.checkpoint import CheckpointManager
from vqvae_tpu.utils.logging import MetricLogger, make_recon_panel


def _to_float01(images) -> np.ndarray:
    """uint8 [0,255] or float [0,1] batch -> float [0,1] (panel logging)."""
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    return arr.astype(np.float32)


def device_hbm_gb() -> float:
    """Per-device memory budget for the auto-remat gate, from the runtime
    when it reports one (v5e: 16 GB, v4: 32 GB, ...); conservative 16 GB
    fallback for backends without memory_stats (CPU tests)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        limit = (stats or {}).get("bytes_limit")
        if limit:
            return limit / 1e9
    except Exception:
        pass
    return 16.0


def estimate_activation_gb(cfg: Config, per_device_batch: int) -> float:
    """Rough activation-memory model for the remat heuristic.

    Calibrated on v5e measurements of the full 256^2 GAN step (channels 128,
    2 res blocks): ~0.335 GB/image without remat (b64 needed 21.45 GB,
    PERFORMANCE.md) => ~40 bytes per pixel x base-channel, scaled by the
    res-block count and discounted ~40% when there is no LPIPS/D stack.
    Deliberately coarse — it only has to pick the right side of 'fits
    comfortably in 16 GB HBM'."""
    c = cfg.autoencoder.channels
    nrb = max(1, cfg.autoencoder.num_res_blocks)
    per_img = 40.0 * (cfg.image_size ** 2) * c * (nrb / 2.0)
    if cfg.loss is None:
        per_img *= 0.5
    elif not cfg.use_adversarial:
        per_img *= 0.75
    micro = per_device_batch
    if cfg.training is not None:
        micro = max(1, per_device_batch // cfg.training.grad_accum_steps)
    return micro * per_img / 1e9


@dataclass
class Trainer:
    cfg: Config
    learning_rate: float
    seed: int
    steps_per_epoch: int
    mesh: Optional[object] = None
    compute_dtype: object = jnp.float32
    lpips_params_override: Optional[object] = None
    # None = auto: rematerialize only when the estimated no-remat activation
    # footprint would crowd HBM (remat costs ~15% recompute — the flagship
    # 256^2 b32 GAN step fits without it, PERFORMANCE.md)
    remat: Optional[bool] = None
    per_device_batch: Optional[int] = None  # feeds the auto-remat estimate
    # train-time augmentations (reference always-on); False = normalize only,
    # for the cross-framework trajectory parity tests (test_trajectory_parity)
    augment: bool = True
    # extra Discriminator ctor kwargs (e.g. a shrunk channel_base in tests);
    # None = the reference architecture (discriminator.py:360-412 defaults)
    disc_kwargs: Optional[dict] = None

    def __post_init__(self):
        cfg = self.cfg
        self.is_gumbel = cfg.quantizer.type == "gumbel"
        axis_name = "data" if self.mesh is not None else None
        self._remat_auto = self.remat is None
        if self.remat is None:
            if self.per_device_batch is not None:
                # threshold scales with the actual device HBM (12/16 GB was
                # the calibrated v5e gate; params/opt/workspace take the rest)
                self.remat = (estimate_activation_gb(cfg, self.per_device_batch)
                              > 0.75 * device_hbm_gb())
            else:
                # batch unknown at construction: conservative legacy rule
                self.remat = cfg.image_size >= 128
        self.model = VQVAE.from_config(cfg, dtype=self.compute_dtype,
                                       axis_name=axis_name, remat=self.remat)

        t = cfg.training
        self.lr_sched = build_lr_schedule(
            self.learning_rate, self.steps_per_epoch,
            t.warmup_epochs, t.decay_epochs)
        self.temp_sched = self.kl_sched = None
        if self.is_gumbel:
            p = cfg.quantizer.params
            self.temp_sched, self.kl_sched = build_gumbel_schedules(
                float(p["temp"]), float(p["kl_cost"]), self.steps_per_epoch,
                p.get("kl_warmup_epochs"), p.get("temp_decay_epochs"),
                p.get("temp_final"))

        self.tx = make_ae_optimizer(self.lr_sched, t.betas, t.eps, t.weight_decay)

        # host-side LR runtime-of-record: the native (C++) scheduler twin —
        # steps on the host for the logged LR, explicit destroy() at train
        # end (reference's scheduling_utils lifecycle, model.py:163-187,305-307)
        from vqvae_tpu.train.native_schedulers import build_native_lr_scheduler
        self.native_lr = build_native_lr_scheduler(
            self.learning_rate, self.steps_per_epoch,
            t.warmup_epochs, t.decay_epochs)

        # loss stack
        self.disc = None
        self.disc_tx = None
        lpips_apply = None
        if cfg.loss is not None:
            if cfg.loss.perc_weight == 0.0 and not (
                    cfg.use_adversarial and cfg.loss.adversarial.use_adaptive):
                # perc_weight 0: elide the whole LPIPS backbone (its loss term
                # is exactly p*0). NOT valid under use_adaptive, whose lambda
                # uses the UNWEIGHTED p_loss gradient (reference loss.py:89,
                # model.py:249-251) — that path keeps the real module below.
                # Divergence note (PARITY.md §2.4): the reference would still
                # log the raw LPIPS value as perc_loss; here it logs 0.
                def lpips_apply(x, y, reduce=True):
                    z = jnp.zeros((x.shape[0],), jnp.float32)
                    return jnp.mean(z) if reduce else z

                self.lpips_params = None
            else:
                net_type = "vgg" if cfg.use_adversarial else "alex"
                # train-time LPIPS runs the backbone in the compute dtype
                # (reference runs it under AMP 16-mixed); eval uses fp32
                lpips_module, lpips_params = init_lpips(
                    net_type, cfg.image_size, seed=self.seed,
                    dtype=self.compute_dtype)
                if self.lpips_params_override is not None:
                    lpips_params = self.lpips_params_override
                self.lpips_params = lpips_params

                import os as _os
                if (net_type == "vgg"
                        and _os.environ.get("VQVAE_TPU_LPIPS_FUSED", "0") == "1"):
                    # opt-in (measured OFF on v5e: 83.9 vs 87.3 img/s — see
                    # PERFORMANCE.md "rejected"): ONE concatenated backbone
                    # pass per step with a manual recon-half backward
                    # (models/lpips.py make_fused_lpips_vgg; equality vs the
                    # module pinned by test_lpips_fused)
                    from vqvae_tpu.models.lpips import make_fused_lpips_vgg
                    fused = make_fused_lpips_vgg(lpips_params,
                                                 dtype=self.compute_dtype)

                    def lpips_apply(x, y, reduce=True, _f=fused):
                        d = _f(x, y)
                        return jnp.mean(d) if reduce else d
                else:
                    def lpips_apply(x, y, reduce=True, _m=lpips_module,
                                    _p=lpips_params):
                        return _m.apply({"params": _p}, x, y, reduce=reduce)

            if cfg.use_adversarial:
                # the reference's D also ran under AMP; bf16 compute + remat
                self.disc = Discriminator(img_resolution=cfg.image_size,
                                          dtype=self.compute_dtype,
                                          remat=self.remat,
                                          **(self.disc_kwargs or {}))
                # The discriminator's optax step count starts at 0 when the
                # GAN phase begins (no D updates before start_epoch), but the
                # reference drives BOTH optimizers' LR from the GLOBAL step
                # (model.py:202-230 scheduler.step(current_step)). Shift the
                # schedule by the steps D sat out so its LR matches.
                start_epoch = cfg.loss.adversarial.start_epoch
                d_offset = int(start_epoch) * self.steps_per_epoch

                def disc_lr_sched(count, _s=self.lr_sched, _o=d_offset):
                    return _s(count + _o)

                self.disc_lr_sched = disc_lr_sched
                self.disc_tx = make_disc_optimizer(disc_lr_sched, t.betas,
                                                   t.eps, t.weight_decay)

        self.steps = build_steps(
            cfg, self.model, self.tx, self.mesh,
            disc=self.disc, disc_tx=self.disc_tx, lpips_apply=lpips_apply,
            lr_sched=self.lr_sched, temp_sched=self.temp_sched,
            kl_sched=self.kl_sched, augment=self.augment)

        # host-side mirror of state.step: picks the R1-staged executable on
        # the r1_reg_every cadence WITHOUT a device sync per step (int(
        # state.step) would stall the dispatch pipeline). Re-synced from the
        # restored state on resume via sync_host_step().
        self._host_step = 0

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        cfg = self.cfg
        rngs = model_rngs(self.seed, cfg.quantizer.type)
        dummy = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
        variables = self.model.init(rngs, dummy, train=False)
        params = variables["params"]
        vq_state = variables.get("vq_state")
        opt_state = self.tx.init(params)

        disc_params = disc_opt = None
        if self.disc is not None:
            disc_vars = self.disc.init(jax.random.PRNGKey(self.seed + 1), dummy)
            disc_params = disc_vars["params"]
            disc_opt = self.disc_tx.init(disc_params)

        state = create_train_state(params, opt_state,
                                   cfg.quantizer.num_embeddings, self.seed,
                                   vq_state=vq_state, disc_params=disc_params,
                                   disc_opt_state=disc_opt)
        if self.mesh is not None:
            from vqvae_tpu.parallel.mesh import replicate
            state = replicate(state, self.mesh)
        return state

    def gan_active(self, epoch: int) -> bool:
        return (self.cfg.use_adversarial
                and epoch >= self.cfg.loss.adversarial.start_epoch)

    def sync_host_step(self, state) -> None:
        """Align the host step mirror with (restored) device state."""
        self._host_step = int(state.step)

    def train_step(self, state, batch, epoch: int):
        images = batch["image"]
        if self.mesh is not None:
            images = shard_batch(images, self.mesh)
        if self.gan_active(epoch):
            adv = self.cfg.loss.adversarial
            on_r1 = (adv.r1_reg_weight is not None
                     and self._host_step % adv.r1_reg_every == 0)
            fn = self.steps.train_gan_r1 if on_r1 else self.steps.train_gan
        else:
            fn = self.steps.train_pre
        self._host_step += 1
        return fn(state, images)

    def eval_step(self, state, batch, epoch: int):
        images = batch["image"]
        mask = batch.get("mask")
        if mask is None:
            mask = np.ones((images.shape[0],), bool)
        payload = (images, mask)
        if self.mesh is not None:
            payload = shard_batch(payload, self.mesh)
        return self.steps.eval_step(state, payload,
                                    gan_active=self.gan_active(epoch))

    # ------------------------------------------------------------------
    def maybe_reinit_codes(self, state: TrainState, epoch: int) -> TrainState:
        """Dead-code re-init on epoch end (reference model.py:297-303)."""
        every = self.cfg.quantizer.reinit_every_n_epochs
        if every is None or epoch == 0 or epoch % every != 0:
            return state
        probs, _, _ = get_codebook_usage(state.usage_count)
        rng = jax.random.fold_in(state.rng, 7919 + epoch)
        # opt-in perturbation of resampled rows: the reference's exact-copy
        # resampling cannot revive a plain-VQ code (the copy ties with its
        # source under argmin and never receives gradient); default 0.0
        noise = float(self.cfg.quantizer.params.get("reinit_noise_scale", 0.0))
        if self.cfg.quantizer.type == "ema":
            # must also reinit the EMA accumulators, or the next step's
            # codebook = ema_weight/ema_count restores the dead rows (the
            # reference has this exact no-op; see reinit_unused_codes_ema)
            q = state.vq_state["quantizer"]
            new_cb, new_w, new_c = reinit_unused_codes_ema(
                q["codebook"], q["ema_weight"], q["ema_count"], probs, rng,
                noise_scale=noise)
            vq = dict(state.vq_state)
            vq["quantizer"] = dict(q, codebook=new_cb, ema_weight=new_w,
                                   ema_count=new_c)
            return state.replace(vq_state=vq)
        cb = state.params["quantizer"]["codebook"]
        new_cb = reinit_unused_codes(cb, probs, rng, noise_scale=noise)
        params = dict(state.params)
        params["quantizer"] = dict(params["quantizer"], codebook=new_cb)
        return state.replace(params=params)

    def reset_usage(self, state: TrainState) -> TrainState:
        return state.replace(usage_count=jnp.zeros_like(state.usage_count))

    def check_remat_gate(self, verbose: bool = True) -> Optional[str]:
        """Audit the auto-remat decision against the runtime's ACTUAL memory
        high-water mark (call once, after the first train step has run).

        estimate_activation_gb is a coarse point-calibrated model; a silent
        mis-estimate either flips remat on needlessly (~18% throughput lost,
        PERFORMANCE.md) or runs the step near the OOM edge. Backends without
        memory_stats (CPU tests) make this a no-op. Returns the warning
        string (also printed) or None when the gate looks right."""
        if not self._remat_auto:
            return None
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            return None
        peak = stats.get("peak_bytes_in_use")
        limit = stats.get("bytes_limit")
        if not peak or not limit:
            return None
        frac = peak / limit
        msg = None
        if not self.remat and frac > 0.92:
            msg = (f"[remat-gate] auto-remat chose OFF but the first step "
                   f"peaked at {peak / 1e9:.2f}/{limit / 1e9:.2f} GB "
                   f"({frac:.0%}) — one allocator hiccup from OOM. Consider "
                   "remat=True (or a smaller per-device batch); "
                   "estimate_activation_gb under-estimated this config.")
        elif self.remat and frac < 0.45:
            msg = (f"[remat-gate] auto-remat chose ON but the first step "
                   f"peaked at only {peak / 1e9:.2f}/{limit / 1e9:.2f} GB "
                   f"({frac:.0%}) — the ~18% recompute tax is likely "
                   "unnecessary. Consider remat=False; "
                   "estimate_activation_gb over-estimated this config.")
        if msg and verbose:
            print(msg)
        return msg


def run_training(cfg: Config, train_loader, val_loader, *, seed: int,
                 learning_rate: float, save_dir: str, run_name: str,
                 save_every_n_epochs: int = 1, logger: MetricLogger = None,
                 resume_path: Optional[str] = None, mesh=None,
                 compute_dtype=jnp.float32, max_epochs: Optional[int] = None,
                 check_val_every: int = 5, log_recon_batch: int = 2):
    """Full training run; returns the final TrainState."""
    steps_per_epoch = len(train_loader)
    max_epochs = max_epochs or cfg.training.max_epochs
    use_adv = cfg.use_adversarial
    accum = cfg.training.grad_accum_steps if cfg.training is not None else 1
    # the loader batch is per-HOST (train.py divides the cumulative batch by
    # process_count); divide by this host's LOCAL device share of the mesh
    n_local = (mesh.devices.size // jax.process_count()
               if mesh is not None else 1)
    per_dev = train_loader.batch_size // max(n_local, 1)
    if per_dev % max(accum, 1) != 0:
        raise RuntimeError(
            f"per-device batch {per_dev} must be divisible by "
            f"grad_accum_steps={accum}")
    if use_adv:
        # mbstd(group=4) constraint (reference train.py:139-140), applied to
        # the per-device micro-batch the discriminator actually sees
        if (per_dev // max(accum, 1)) % 4 != 0:
            raise RuntimeError(
                "batch size per device (per accumulation micro-batch) must "
                "be divisible by 4! (minibatch-std group size in the "
                "StyleGAN discriminator)")

    trainer = Trainer(cfg=cfg, learning_rate=learning_rate, seed=seed,
                      steps_per_epoch=steps_per_epoch, mesh=mesh,
                      compute_dtype=compute_dtype,
                      per_device_batch=per_dev)
    try:
        state = _run_epochs(trainer, train_loader, val_loader,
                            save_dir=save_dir, run_name=run_name,
                            save_every_n_epochs=save_every_n_epochs,
                            logger=logger, resume_path=resume_path,
                            max_epochs=max_epochs,
                            check_val_every=check_val_every,
                            log_recon_batch=log_recon_batch)
    finally:
        # explicit native-scheduler teardown (reference on_train_end,
        # model.py:305-307 scheduler.destroy()) — also on error paths, so
        # the advertised destroy() lifecycle never falls back to __del__
        trainer.native_lr.destroy()
    return state, trainer


def _run_epochs(trainer, train_loader, val_loader, *, save_dir,
                run_name, save_every_n_epochs, logger, resume_path,
                max_epochs, check_val_every, log_recon_batch):
    state = trainer.init_state()
    ckpt = CheckpointManager(save_dir, run_name, save_every_n_epochs)
    logger = logger or MetricLogger(save_dir, run_name)

    start_epoch = 0
    if resume_path is not None:
        state, start_epoch = ckpt.restore(resume_path, state)
        start_epoch += 1
        trainer.sync_host_step(state)
        print(f"[INFO] resumed from {resume_path} at epoch {start_epoch}")

    for epoch in range(start_epoch, max_epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        n_img = 0
        n_batches = 0
        metric_sums = None
        for batch_index, batch in enumerate(train_loader):
            state, metrics = trainer.train_step(state, batch, epoch)
            if epoch == start_epoch and batch_index == 0:
                # fence the first step, then audit the auto-remat estimate
                # against the runtime's actual high-water mark. Must be a
                # device->host READBACK: on the axon TPU stack (the only
                # place memory_stats exists) block_until_ready returns while
                # executions are still pipelined, so it would sample
                # peak_bytes_in_use before the step ran (ADVICE r4)
                jax.device_get(metrics)
                trainer.check_remat_gate()
            n_img += batch["image"].shape[0]
            # epoch-mean logging (reference on_epoch=True, model.py:277-286):
            # accumulate ON DEVICE (lazy adds) — a float() per step would
            # fence the dispatch pipeline; one fetch per epoch below
            metric_sums = (metrics if metric_sums is None
                           else jax.tree.map(jnp.add, metric_sums, metrics))
            n_batches += 1
            if batch_index == log_recon_batch and epoch % 5 == 0:
                _, _, recons = trainer.eval_step(state, batch, epoch)
                panel = make_recon_panel(_to_float01(batch["image"]),
                                         local_rows(recons))
                logger.log_images(panel, int(state.step),
                                  "train/reconstructions")

        # ONE device->host transfer for the whole epoch-sum tree (per-key
        # float() would pay a tunnel round-trip per metric)
        fetched = jax.device_get(metric_sums) if metric_sums else {}
        metrics = {k: float(v) / max(n_batches, 1) for k, v in fetched.items()}
        # logged LR comes from the HOST-side native (C++) scheduler — the
        # runtime-of-record twin of the in-jit schedule (pinned by
        # test_schedules); value at the epoch's last completed step
        metrics["lr"] = trainer.native_lr.step(max(int(state.step) - 1, 0))
        metrics["images_per_sec"] = n_img / max(time.time() - t0, 1e-9)
        metrics["epoch"] = epoch
        logger.log(metrics, int(state.step), prefix="train/")

        # validation every `check_val_every` epochs (train.py:131)
        if epoch % check_val_every == 0 and val_loader is not None:
            val_metrics, usage = run_validation(
                trainer, state, val_loader, epoch, logger=logger,
                log_recon_batch=log_recon_batch)
            _, perplexity, cb_usage = get_codebook_usage(jnp.asarray(usage))
            logger.log({"used_codebook": float(cb_usage),
                        "perplexity": float(perplexity)},
                       int(state.step), prefix="val_metrics/")
            logger.log(val_metrics, int(state.step), prefix="validation/")

        state = trainer.maybe_reinit_codes(state, epoch)
        state = trainer.reset_usage(state)
        ckpt.save(state, epoch)

    return state


def run_validation(trainer, state, val_loader, epoch, logger=None,
                   log_recon_batch: int = 2):
    """Weighted-mean validation over the loader.

    Partial final batches are INCLUDED: the eval step computes masked means
    over the valid rows and reports `n_valid`, so tail samples contribute
    with their true weight (the earlier skip-partial-batch policy silently
    dropped up to batch_size-1 images — and produced NaN perplexity when the
    whole set fit in one padded batch).

    n_valid-weighted sums accumulate ON DEVICE (lazy adds, the same pattern
    as the train loop's epoch means): a float() per metric per batch would
    fence the dispatch pipeline once per batch — one fetch of the whole sum
    tree at the end instead."""
    sums = total_n = usage = None
    for batch_index, batch in enumerate(val_loader):
        metrics, batch_usage, recons = trainer.eval_step(state, batch, epoch)
        usage = batch_usage if usage is None else usage + batch_usage
        n = metrics.pop("n_valid")
        weighted = jax.tree.map(lambda v, _n=n: v * _n, metrics)
        sums = (weighted if sums is None
                else jax.tree.map(jnp.add, sums, weighted))
        total_n = n if total_n is None else total_n + n
        if batch_index == log_recon_batch and logger is not None:
            panel = make_recon_panel(_to_float01(batch["image"]),
                                     local_rows(recons))
            logger.log_images(panel, int(state.step),
                              "validation/reconstructions")
    if sums is None:
        usage = np.zeros((trainer.cfg.quantizer.num_embeddings,), np.int32)
        return {}, usage
    sums, total_n, usage = jax.device_get((sums, total_n, usage))
    mean = {k: float(v) / max(float(total_n), 1.0) for k, v in sums.items()}
    return mean, np.asarray(usage)
