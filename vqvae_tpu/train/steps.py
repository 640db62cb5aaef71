"""Jitted, mesh-sharded train / eval steps.

TPU re-design of the reference's eager Lightning training_step
(model.py:232-295) and the VQGAN loss orchestration (loss.py:114-164):

- ONE compiled step per training phase. The discriminator's epoch gating
  (loss.py:125,147) is *staged compilation*: a pre-adversarial step (no D at
  all) and an adversarial step, selected by the host loop at the epoch
  boundary — no wasted D FLOPs before start_epoch and no dynamic branches in
  the hot path. The R1 cadence (every 16 steps, loss.py:148) is ALSO staged
  (train_gan vs train_gan_r1): keeping it as a lax.cond forces the
  D-at-images linearization (full-res lrelu masks + conv residuals) to be
  computed on every step; staging removes ~20 ms/step at 256^2/b32.
- Data parallelism via ``shard_map`` over the ``data`` mesh axis: gradients /
  metrics are ``pmean``-reduced, EMA codebook accumulators are ``psum``-reduced
  inside the quantizer, usage histograms are ``psum``-reduced — the explicit
  psum-on-ICI design (the reference delegates grads to DDP and silently leaves
  EMA buffers and usage counts replica-local, SURVEY §5).
- Both GAN phases (AE update, then D update on the same reconstructions)
  execute in the same compiled step, mirroring the reference's manual
  two-optimizer loop (model.py:244-264).
- ``training.grad_accum_steps > 1`` accumulates AE and D gradients over a
  ``lax.scan`` of micro-batches before the two optimizer updates: identical
  global-batch semantics (equal micros, mean-of-means), ~N x less activation
  memory — the published cumulative_bs=256 recipe runs on a single chip.
  The D still sees pre-update reconstructions, exactly like the reference's
  ordering. (EMA codebook state advances once per micro-batch — documented
  divergence; the reference never accumulates.)
- R1 reuses the real-logits forward via ``jax.vjp`` (one D forward gives the
  loss logits and the input-gradient); its parameter gradient is a 2nd-order
  derivative that JAX composes natively — no `no_weight_gradients` hack.
- The discriminator forward on the reconstructions is computed ONCE and
  shared between the generator loss (gradient flows to the reconstruction
  only) and the discriminator loss (gradient flows to D's parameters only)
  via a custom_vjp that routes each cotangent to exactly one input. The
  reference (and a naive two-loss translation) runs this forward twice —
  model.py:247 and loss.py:153 — and XLA does not CSE the copies because
  their backward residuals fuse differently; sharing saves a full D forward
  (~15 ms/step at 256^2 b32, profiled).
- Augmentation / gumbel RNG is derived per step and folded with the mesh axis
  index so every replica draws independent noise.

Intentional fixes of reference bugs (SURVEY §2.4), documented divergences:
- training_step returns the autoencoder loss (the reference's `return loss`
  is unbound in non-GAN configs, model.py:295).
- usage counts accumulate over the epoch (the reference's `+ used_indices`
  unary-plus keeps only the last batch, model.py:293).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map with check_vma kwarg
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vqvae_tpu.config import Config
from vqvae_tpu.losses.losses import (
    discriminator_loss, discriminator_loss_per_sample,
    generator_loss, generator_loss_per_sample, l1_loss, l2_loss)
from vqvae_tpu.models.preprocess import denormalize, preprocess_batch
from vqvae_tpu.models.quantizers import count_code_usage
from vqvae_tpu.train.state import TrainState

AXIS = "data"


def _initialized_backend() -> Optional[str]:
    """Default-backend name IF a backend is already initialized, else None —
    guaranteed never to trigger (or block on) backend initialization."""
    try:
        from jax._src import xla_bridge as _xb
        if not _xb._backends:  # registry empty -> nothing initialized yet
            return None
        return jax.default_backend()
    except Exception:
        return None


def _xla_compiler_options() -> Optional[dict]:
    """Per-step XLA compiler options (TPU tuning knobs that this environment
    cannot receive via XLA_FLAGS). Override with VQVAE_TPU_XLA_OPTS
    ("flag=value,flag=value", or "none" to disable).

    Default on TPU backends: xla_tpu_scoped_vmem_limit_kib=57344 — the
    round-4 bracket optimum on the 256^2 GAN step (88.61 img/s, reproduced
    3x; 48 MiB 88.55, 60 MiB 88.51, 64 MiB 88.31, 80 MiB 87.93 —
    docs/CHIPQ_r4.txt, PERFORMANCE.md); the compiler's built-in retry
    handles programs whose ops cannot fit the larger scoped window. 96 MB
    was rejected: compile time explodes (>45 min vs ~10)."""
    import os

    spec = os.environ.get("VQVAE_TPU_XLA_OPTS", "").strip()
    if not spec:
        # consult the backend ONLY if one is already initialized: a hanging
        # axon init is not an exception (round-2 MULTICHIP rc=124), so step
        # construction must never be the first backend touch. Callers that
        # want the TPU default initialize the backend first (bench.py does);
        # hermetic CPU paths (dryrun_multichip) set VQVAE_TPU_XLA_OPTS=none.
        backend = _initialized_backend()
        if backend in ("tpu", "axon"):
            return {"xla_tpu_scoped_vmem_limit_kib": "57344"}
        return None
    if spec.lower() == "none":
        return None
    opts = {}
    for item in spec.split(","):
        if not item.strip():
            continue
        key, _, value = item.partition("=")
        opts[key.strip()] = value.strip()
    return opts or None


def make_paired_logits(apply_fn: Callable):
    """Two logits views over ONE discriminator forward, with disjoint
    gradient routing.

    ``paired(dp, x) -> (logits_for_g, logits_for_d)`` where both outputs
    equal ``apply_fn(dp, x)`` in the primal, but the VJP sends the first
    output's cotangent to ``x`` only (generator loss: trains the
    reconstruction, never D — reference model.py:247 detaches nothing but
    only steps ae_opt) and the second output's cotangent to ``dp`` only
    (discriminator loss on detached reconstructions, loss.py:153). The two
    pullbacks share the single forward's residuals; XLA DCEs the unused half
    of each backward."""

    @jax.custom_vjp
    def paired(dp, x):
        logits = apply_fn(dp, x)
        return logits, logits

    def _fwd(dp, x):
        logits, vjp = jax.vjp(apply_fn, dp, x)
        return (logits, logits), vjp

    def _bwd(vjp, cts):
        ct_g, ct_d = cts
        _, dx = vjp(ct_g)    # generator side: image gradient only
        ddp, _ = vjp(ct_d)   # discriminator side: param gradient only
        return ddp, dx

    paired.defvjp(_fwd, _bwd)
    return paired


class StepBundle(NamedTuple):
    """Compiled step functions for one training run."""
    train_pre: Callable      # before the discriminator starts (or the only step)
    train_gan: Optional[Callable]      # GAN step, no R1 (15/16 of steps)
    train_gan_r1: Optional[Callable]   # GAN step + R1 penalty (every r1_reg_every)
    eval_step: Callable


def _replace_last_kernel(params, kernel):
    """Substitute the decoder's final conv kernel (adaptive g-weight path,
    reference loss.py:80-96 computes grads w.r.t. decoder.conv_out.weight)."""
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy pytree
    new["decoder"]["conv_out"]["Conv_0"] = dict(
        new["decoder"]["conv_out"]["Conv_0"], kernel=kernel)
    return new


def build_steps(cfg: Config, model, tx, mesh: Optional[Mesh] = None, *,
                disc=None, disc_tx=None, lpips_apply=None,
                lr_sched=None, temp_sched=None, kl_sched=None,
                augment: bool = True) -> StepBundle:
    """Create the compiled train/eval steps for a config.

    Args:
      cfg: parsed Config.
      model: VQVAE flax module.
      tx: AE optax optimizer.
      mesh: data-parallel mesh (None = single device, no collectives).
      disc: Discriminator module (GAN configs).
      disc_tx: discriminator optimizer.
      lpips_apply: ``lpips_apply(x, y) -> scalar`` with frozen params closed
        over (LPIPS weights live in no optimizer, reference model.py:419-427).
      lr_sched/temp_sched/kl_sched: step -> scalar schedules (logging + gumbel).
      augment: apply the train-time RandomResizedCrop+flip (the reference's
        always-on behavior, base_autoencoder.py:20-22). False = normalize
        only — used by the cross-framework trajectory parity tests, which
        need bit-identical inputs on both sides.
    """
    is_gumbel = cfg.quantizer.type == "gumbel"
    n_codes = cfg.quantizer.num_embeddings
    l_conf = cfg.loss
    adv = l_conf.adversarial if l_conf is not None else None

    def forward(params, vq_state, images, rng, step, train, mask=None):
        variables = {"params": params}
        mutable = False
        if vq_state is not None:
            variables["vq_state"] = vq_state
            if train:
                mutable = ["vq_state"]
        kwargs = {}
        if mask is not None:
            kwargs["mask"] = mask
        rngs = {}
        if is_gumbel:
            kwargs["temp"] = temp_sched(step) if temp_sched else None
            kwargs["kl_cost"] = kl_sched(step) if kl_sched else None
            rngs["gumbel"] = jax.random.fold_in(rng, 1)
        out = model.apply(variables, images, train=train, rngs=rngs or None,
                          mutable=mutable, **kwargs)
        if mutable:
            (recon, q_loss, codes), new_vars = out
            return recon, q_loss, codes, new_vars.get("vq_state")
        recon, q_loss, codes = out
        return recon, q_loss, codes, vq_state

    def recon_losses(images, recon):
        l1 = l1_loss(recon, images)
        l2 = l2_loss(recon, images)
        if l_conf is not None:
            p = lpips_apply(images, recon)
            nll = (l1 * l_conf.l1_weight + l2 * l_conf.l2_weight
                   + p * l_conf.perc_weight)
        else:
            p = jnp.zeros(())
            nll = l2
        return l1, l2, p, nll

    def _pmean(tree):
        if mesh is None:
            return tree
        return jax.lax.pmean(tree, AXIS)

    def _psum(tree):
        if mesh is None:
            return tree
        return jax.lax.psum(tree, AXIS)

    accum = (cfg.training.grad_accum_steps
             if cfg.training is not None else 1)

    # ------------------------------------------------------------------
    # shared D-forward on the reconstructions (see make_paired_logits)
    # ------------------------------------------------------------------
    if disc is not None:
        # VQVAE_TPU_FUSED_DBWD=1: first-order D applications use the Pallas
        # fused blur-transpose backward (ops/fused_dbwd.py; identical params
        # and forward, measured A/B in PERFORMANCE.md). The R1 linearization
        # below keeps the plain module — custom_vjp is not twice-
        # differentiable, and R1 differentiates D-at-images twice.
        fused_kw = {}
        if os.environ.get("VQVAE_TPU_FUSED_DBWD", "0") == "1":
            fused_kw["fused_dbwd"] = True
        if os.environ.get("VQVAE_TPU_FUSED_SKIP", "0") == "1":
            fused_kw["fused_skip"] = True
        disc_1st = disc.clone(**fused_kw) if fused_kw else disc
        paired_fake_logits = make_paired_logits(
            lambda dp, x: disc_1st.apply({"params": dp}, x))

    # ------------------------------------------------------------------
    # per-micro-batch gradients (one full AE + D gradient computation);
    # _train_step applies it directly (accum == 1) or accumulates it over a
    # lax.scan of micro-batches (grad_accum_steps > 1) before the single
    # optimizer update — same global-batch semantics, ~accum x less
    # activation memory
    # ------------------------------------------------------------------
    def _micro_grads(params, disc_params, vq_state, step, raw_images, rng,
                     gan_active: bool, compute_r1: bool):
        rng_aug, rng_model = jax.random.split(rng)
        images = preprocess_batch(raw_images, rng_aug, training=augment,
                                  image_size=cfg.image_size)
        gan = adv is not None and gan_active
        with_r1 = gan and compute_r1 and adv.r1_reg_weight is not None

        # ONE joint loss over (ae params, disc params): the paired_fake_logits
        # custom_vjp keeps the two sub-losses' gradients exactly disjoint
        # (identical math to the reference's two manual phases, one D forward
        # cheaper). R1 staging notes below still apply.
        def loss_fn(p, dp, vq):
            recon, q_loss, codes, new_vq = forward(
                p, vq, images, rng_model, step, train=True)
            l1, l2, perc, nll = recon_losses(images, recon)

            if gan:
                lg, ld = paired_fake_logits(dp, recon)
                g_loss = generator_loss(lg, adv.loss_type)
                if adv.use_adaptive:
                    # lambda = |grad_W nll_perc| / (|grad_W g| + 1e-8), W = last
                    # decoder kernel (reference loss.py:80-96; grads w.r.t.
                    # p_loss per model.py:249-251 callsite).
                    w0 = p["decoder"]["conv_out"]["Conv_0"]["kernel"]

                    def pg_of_w(w):
                        params2 = _replace_last_kernel(p, w)
                        recon2, _, _, _ = forward(params2, vq, images,
                                                  rng_model, step, True)
                        p2 = lpips_apply(images, recon2)
                        # plain module here: the OUTER value_and_grad must
                        # linearize this inner vjp, and the fused modules'
                        # Pallas backward has no AD rules (stop_gradient on
                        # g_weight does not stop the linearization)
                        g2 = generator_loss(
                            disc.apply({"params": dp}, recon2),
                            adv.loss_type)
                        return p2, g2

                    _, vjp = jax.vjp(lambda w: jnp.stack(pg_of_w(w)), w0)
                    gp = vjp(jnp.array([1.0, 0.0]))[0]
                    gg = vjp(jnp.array([0.0, 1.0]))[0]
                    g_weight = jnp.linalg.norm(gp.reshape(-1)) / (
                        jnp.linalg.norm(gg.reshape(-1)) + 1e-8)
                    g_weight = jnp.clip(g_weight, 0.0, 1e4) * adv.g_weight
                    g_weight = jax.lax.stop_gradient(g_weight)
                else:
                    g_weight = jnp.asarray(adv.g_weight, jnp.float32)
                ae_loss = nll + g_loss * g_weight + q_loss

                # -------- discriminator loss (same trace, same recons) ----
                # R1 is STAGED compilation, not lax.cond: linearizing D at
                # `images` (jax.vjp) materializes every lrelu mask / conv
                # residual at full resolution even on the 15/16 steps where
                # the penalty is never applied. The host loop selects
                # train_gan_r1 every r1_reg_every steps (loss.py:148 cadence)
                # and train_gan otherwise.
                if with_r1:
                    logits_real, d_vjp = jax.vjp(
                        lambda im: disc.apply({"params": dp}, im), images)
                else:
                    logits_real = disc_1st.apply({"params": dp}, images)
                d_loss = discriminator_loss(logits_real, ld, adv.loss_type)
                if with_r1:
                    grad_imgs = d_vjp(jnp.ones_like(logits_real))[0]
                    per = jnp.sum(
                        grad_imgs.reshape(grad_imgs.shape[0], -1) ** 2, axis=1)
                    r1 = adv.r1_reg_weight * jnp.mean(per)
                else:
                    r1 = jnp.zeros(())
                total = ae_loss + d_loss + r1
            else:
                g_loss = jnp.zeros(())
                g_weight = jnp.zeros(())
                d_loss = jnp.zeros(())
                r1 = jnp.zeros(())
                ae_loss = nll + q_loss if l_conf is not None else q_loss + l2
                total = ae_loss

            aux = dict(codes=codes, new_vq=new_vq, q_loss=q_loss,
                       ae_loss=ae_loss, d_loss=d_loss, r1=r1,
                       l1=l1, l2=l2, p=perc, g_loss=g_loss, g_weight=g_weight)
            return total, aux

        if gan:
            (_, aux), (grads, d_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    params, disc_params, vq_state)
        else:
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, disc_params, vq_state)
            d_grads = None

        usage = count_code_usage(aux["codes"], n_codes)
        metrics = {
            "loss": aux["ae_loss"], "l1_loss": aux["l1"], "l2_loss": aux["l2"],
            "quant_loss": aux["q_loss"], "perc_loss": aux["p"],
            "gen_loss": aux["g_loss"], "disc_loss": aux["d_loss"],
            "r1_penalty": aux["r1"], "g_weight": aux["g_weight"],
        }
        return grads, d_grads, aux["new_vq"], usage, metrics

    # ------------------------------------------------------------------
    # train step (one function parameterized by gan_active, staged twice)
    # ------------------------------------------------------------------
    def _train_step(state: TrainState, batch, gan_active: bool,
                    compute_r1: bool = False):
        rng = state.next_rng()
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
        has_d = adv is not None and gan_active

        if accum == 1:
            grads, d_grads, new_vq, usage, metrics = _micro_grads(
                state.params, state.disc_params, state.vq_state, state.step,
                batch, rng, gan_active, compute_r1)
        else:
            b = batch.shape[0]
            micro = batch.reshape(accum, b // accum, *batch.shape[1:])

            def body(carry, xs):
                vq_state, g_acc, d_acc, u_acc, m_acc = carry
                mb, idx = xs
                g, dg, new_vq, u, m = _micro_grads(
                    state.params, state.disc_params, vq_state, state.step,
                    mb, jax.random.fold_in(rng, idx), gan_active, compute_r1)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                if dg is not None:
                    d_acc = jax.tree.map(jnp.add, d_acc, dg)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (new_vq, g_acc, d_acc, u_acc + u, m_acc), None

            zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)
            m0 = {k: jnp.zeros(()) for k in
                  ("loss", "l1_loss", "l2_loss", "quant_loss", "perc_loss",
                   "gen_loss", "disc_loss", "r1_penalty", "g_weight")}
            init = (state.vq_state, zeros_like(state.params),
                    zeros_like(state.disc_params) if has_d else 0,
                    jnp.zeros((n_codes,), jnp.int32), m0)
            (new_vq, g_acc, d_acc, usage, m_acc), _ = jax.lax.scan(
                body, init, (micro, jnp.arange(accum)))
            inv = 1.0 / accum
            grads = jax.tree.map(lambda x: x * inv, g_acc)
            d_grads = (jax.tree.map(lambda x: x * inv, d_acc)
                       if has_d else None)
            metrics = jax.tree.map(lambda x: x * inv, m_acc)

        grads = _pmean(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if has_d:
            d_grads = _pmean(d_grads)
            d_updates, new_disc_opt = disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params)
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)
        else:
            new_disc_params = state.disc_params
            new_disc_opt = state.disc_opt_state

        usage = _psum(usage)
        metrics = _pmean(metrics)
        if lr_sched is not None:
            metrics["lr"] = lr_sched(state.step)
        if is_gumbel and temp_sched is not None:
            metrics["gumbel_temperature"] = temp_sched(state.step)
            metrics["gumbel_kl"] = kl_sched(state.step)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            vq_state=new_vq,
            disc_params=new_disc_params,
            disc_opt_state=new_disc_opt,
            usage_count=state.usage_count + usage,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    # eval step (validation/test: no augs, no optimizer, no EMA mutation)
    # ------------------------------------------------------------------
    def _eval_step(state: TrainState, batch, gan_active: bool):
        # All metrics are MASKED means: zero-padded rows of a partial final
        # eval batch (data/dataset.py Loader contract) are excluded exactly,
        # and the cross-device reduction is psum(sum)/psum(count) so
        # unevenly-filled shards stay correct. quant_loss comes out of the
        # quantizer as a per-shard masked scalar (the mask is threaded into
        # the quantizer reductions, models/quantizers.py), so its cross-shard
        # reduction is weighted by each shard's valid count.
        images, mask = batch
        images = preprocess_batch(images)
        maskf = mask.astype(jnp.float32)

        def masked_mean(per_sample):
            s = _psum(jnp.sum(per_sample * maskf))
            n = _psum(jnp.sum(maskf))
            return s / jnp.maximum(n, 1.0)

        def per_sample_mean(x):
            return x.reshape(x.shape[0], -1).astype(jnp.float32).mean(axis=1)

        rng_model = jax.random.fold_in(state.rng, state.step)
        if mesh is not None:
            rng_model = jax.random.fold_in(rng_model, jax.lax.axis_index(AXIS))
        recon, q_loss, codes, _ = forward(state.params, state.vq_state, images,
                                          rng_model, state.step, train=False,
                                          mask=mask)

        l1_i = per_sample_mean(jnp.abs(images - recon))
        l2_i = per_sample_mean((images - recon) ** 2)
        if l_conf is not None:
            p_i = lpips_apply(images, recon, reduce=False)
            nll_i = (l1_i * l_conf.l1_weight + l2_i * l_conf.l2_weight
                     + p_i * l_conf.perc_weight)
        else:
            p_i = jnp.zeros_like(l1_i)
            nll_i = l2_i

        if adv is not None and gan_active:
            logits_fake = disc.apply({"params": state.disc_params}, recon)
            g_i = generator_loss_per_sample(logits_fake, adv.loss_type)
            logits_real = disc.apply({"params": state.disc_params}, images)
            d_i = discriminator_loss_per_sample(logits_real, logits_fake,
                                                adv.loss_type)
            loss_i = nll_i + g_i * adv.g_weight + q_loss
        else:
            g_i = jnp.zeros_like(l1_i)
            d_i = jnp.zeros_like(l1_i)
            loss_i = (nll_i + q_loss if l_conf is not None
                      else q_loss + l2_i)

        # padded rows (mask=False) excluded: they would otherwise pollute the
        # usage histogram / perplexity on the partial final eval batch
        usage = _psum(count_code_usage(codes, n_codes, mask=mask))
        # q_loss is a per-shard masked mean; the global masked mean weights
        # each shard by its valid-row count (exact for uneven final batches)
        n_valid_local = jnp.sum(maskf)
        q_loss_global = (_psum(q_loss * n_valid_local)
                         / jnp.maximum(_psum(n_valid_local), 1.0))
        metrics = {
            "loss": masked_mean(loss_i), "l1_loss": masked_mean(l1_i),
            "l2_loss": masked_mean(l2_i), "quant_loss": q_loss_global,
            "perc_loss": masked_mean(p_i), "gen_loss": masked_mean(g_i),
            "disc_loss": masked_mean(d_i),
            "n_valid": _psum(jnp.sum(maskf)),
        }
        # reconstructions in [0,1] for logging panels (model.py:442-456)
        return metrics, usage, denormalize(recon)

    # ------------------------------------------------------------------
    # wrap in shard_map + jit
    # ------------------------------------------------------------------
    def _wrap(fn, donate=True, n_out_sharded=0):
        opts = _xla_compiler_options()
        if mesh is None:
            return jax.jit(fn, donate_argnums=(0,) if donate else (),
                           compiler_options=opts)
        out_specs: Any = (P(), P())
        if n_out_sharded:
            out_specs = (P(), P(), P(AXIS))
        mapped = shard_map(fn, mesh=mesh, in_specs=(P(), P(AXIS)),
                           out_specs=out_specs, check_rep=False)
        return jax.jit(mapped, donate_argnums=(0,) if donate else (),
                       compiler_options=opts)

    train_pre = _wrap(functools.partial(_train_step, gan_active=False))
    train_gan = (_wrap(functools.partial(_train_step, gan_active=True))
                 if adv is not None else None)
    train_gan_r1 = (_wrap(functools.partial(_train_step, gan_active=True,
                                            compute_r1=True))
                    if adv is not None and adv.r1_reg_weight is not None
                    else train_gan)

    eval_pre = _wrap(functools.partial(_eval_step, gan_active=False),
                     donate=False, n_out_sharded=1)
    if adv is not None:
        eval_gan = _wrap(functools.partial(_eval_step, gan_active=True),
                         donate=False, n_out_sharded=1)

        def eval_step(state, batch, gan_active=False):
            return (eval_gan if gan_active else eval_pre)(state, batch)
    else:
        def eval_step(state, batch, gan_active=False):
            return eval_pre(state, batch)

    return StepBundle(train_pre=train_pre, train_gan=train_gan,
                      train_gan_r1=train_gan_r1, eval_step=eval_step)
