"""Evaluation CLI — flag-compatible with the reference (vqvae/evaluate.py:8-24).

Computes the reference test suite (model.py:491-562): L2 (mse), SSIM, PSNR,
rFID (when inception weights are converted), codebook usage %, perplexity.

    python evaluate.py --params_file conf.yaml --dataset_path /data/ \
        --batch_size 64 --seed 42 --loading_path /ckpts/run/last
"""

from __future__ import annotations

import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--params_file', type=str, required=True,
                        help='path to yaml file with model params')
    parser.add_argument('--dataloader', type=str,
                        choices=['standard', 'packed', 'ffcv'], default='standard')
    parser.add_argument('--dataset_path', type=str, required=True,
                        help='path to a dataset folder with a test/ subfolder '
                             'or test.pack file')
    parser.add_argument('--batch_size', type=int, required=True,
                        help='evaluation batch size (global, split across '
                             'devices when more than one is visible)')
    parser.add_argument('--seed', type=int, required=True)
    parser.add_argument('--loading_path', type=str, required=True,
                        help='path to checkpoint to load')
    parser.add_argument('--workers', type=int, default=1)
    parser.add_argument('--single_device', action='store_true',
                        help='force single-device eval even on a multi-chip '
                             'host (the reference evaluates on one GPU, '
                             'evaluate.py:56; default here is the data mesh)')
    parser.add_argument('--allow_missing_rfid', action='store_true',
                        help='proceed without rFID when FID-inception weights '
                             'are not converted; WITHOUT this flag a missing '
                             'weights file is a hard error (rFID is the '
                             'reference test suite\'s headline metric, '
                             'model.py:497,536-541 — it must never be '
                             'silently omitted)')
    return parser.parse_args()


def evaluate_checkpoint(cfg, state, trainer, test_loader, *, verbose=True):
    """Run the test metric suite; returns a dict of results.

    Multi-host: each process streams its own shard of the test set through
    the metric accumulators, which are sum-reduced across hosts before
    compute (mse/ssim/psnr sums, FID feature moments, usage histogram)."""
    import jax
    import numpy as np

    from vqvae_tpu.eval.fid import FID, load_inception_extractor
    from vqvae_tpu.eval.metrics import ReconMetrics
    from vqvae_tpu.models.quantizers import get_codebook_usage
    from vqvae_tpu.parallel.mesh import local_rows as _local_rows

    recon_metrics = ReconMetrics(data_range=1.0)
    extractor, feat_dim = load_inception_extractor()
    fid = FID(extractor, feat_dim) if extractor is not None else None

    usage = None
    for batch in test_loader:
        metrics, batch_usage, recons = trainer.eval_step(state, batch, epoch=0)
        images = np.asarray(batch["image"], np.float32)
        if batch["image"].dtype == np.uint8:
            images = images / 255.0
        recons = _local_rows(recons)
        mask = np.asarray(batch["mask"], bool)

        recon_metrics.update(recons, images, mask)
        # batch_usage is already mask-filtered inside the eval step
        usage = batch_usage if usage is None else usage + batch_usage
        if fid is not None:
            # torchvision ConvertImageDtype(uint8) semantics (reference
            # model.py:536-538): multiply by 256-eps and truncate — equal-width
            # bins, NOT round(x*255)
            to_u8 = lambda x: np.clip(x * (256.0 - 1e-3), 0, 255).astype(np.uint8)
            fid.update(to_u8(recons), real=False, mask=mask)
            fid.update(to_u8(images), real=True, mask=mask)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def allsum(x):
            return np.asarray(
                multihost_utils.process_allgather(np.asarray(x))).sum(axis=0)

        recon_metrics.reduce_across_hosts(allsum)
        if fid is not None:
            fid.reduce_across_hosts(allsum)
        # usage was already psum'd across the mesh inside the eval step

    results = recon_metrics.compute()
    _, perplexity, cb_usage = get_codebook_usage(np.asarray(usage))
    results["used_codebook"] = float(cb_usage)
    results["perplexity"] = float(perplexity)
    if fid is not None:
        results["rfid"] = fid.compute()
    if verbose:
        for k, v in results.items():
            print(f"{k}: {v:.6f}")
    return results


def main():
    args = parse_args()

    # fail FAST and LOUD when the north-star metric can't be computed —
    # before any backend/dataset work, so a quality run can never get
    # minutes in and then silently report without rFID
    if not args.allow_missing_rfid:
        from vqvae_tpu.eval.fid import inception_weights_path
        path = inception_weights_path()
        if not path.exists():
            import sys
            sys.exit(
                f"ERROR: FID-inception weights not found at {path} — rFID "
                "(the reference's headline quality metric) cannot be "
                "computed.\nConvert them on a connected machine with:\n"
                "    python tools/convert_inception_weights.py "
                f"--out {path}\n(or tools/fetch_and_convert_all.sh for the "
                "full set), copy the file here, or re-run with "
                "--allow_missing_rfid to evaluate without rFID.")

    from vqvae_tpu.parallel.mesh import distributed_init_if_needed
    distributed_init_if_needed()

    import jax
    import jax.numpy as jnp

    from vqvae_tpu.config import load_config
    from vqvae_tpu.data.dataset import get_loaders
    from vqvae_tpu.ops.misc_ops import set_matmul_precision
    from vqvae_tpu.parallel.mesh import create_mesh
    from vqvae_tpu.train.loop import Trainer
    from vqvae_tpu.utils.checkpoint import restore_for_eval

    # eval-grade numerics: on TPU the DEFAULT matmul precision runs fp32
    # convolutions as a single bf16 MXU pass; published metrics are fp32.
    # (The reference's analogous knob is set_matmul_precision's TF32 switch
    # on A100, common_utils.py:16-27 — train keeps the bf16 policy, eval
    # pins full precision.)
    set_matmul_precision("highest")

    cfg = load_config(args.params_file)
    seed = int(args.seed)

    n_devices = len(jax.devices())
    mesh = (create_mesh() if n_devices > 1 and not args.single_device
            else None)
    if mesh is not None and int(args.batch_size) % n_devices != 0:
        raise RuntimeError(f"batch_size={args.batch_size} must be divisible "
                           f"by {n_devices} devices (or pass --single_device)")

    batch_per_host = int(args.batch_size) // jax.process_count()
    test_loader = get_loaders(args.dataloader, args.dataset_path,
                              cfg.image_size, batch_per_host,
                              int(args.workers), seed, mode='test')

    # inference: no loss stack needed (reference evaluate.py:48-49 loads with
    # l_conf=None, load_loss=False)
    import dataclasses
    eval_cfg = dataclasses.replace(cfg, loss=None)

    trainer = Trainer(cfg=eval_cfg, learning_rate=cfg.training.base_lr,
                      seed=seed, steps_per_epoch=1, mesh=mesh,
                      compute_dtype=jnp.float32)
    state = trainer.init_state()
    state = restore_for_eval(args.loading_path, state)
    if mesh is not None:
        from vqvae_tpu.parallel.mesh import replicate
        state = replicate(state, mesh)

    print(f"[INFO] devices: {n_devices}, batch size: {args.batch_size}")
    evaluate_checkpoint(eval_cfg, state, trainer, test_loader)


if __name__ == '__main__':
    main()
