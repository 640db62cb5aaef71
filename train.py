"""Train CLI — flag-compatible with the reference (reference vqvae/train.py:16-39).

Example:
    python train.py --params_file example_confs/standard_vqvae.yaml \
        --dataset_path /data/imagenet/ --save_path /ckpts/ \
        --run_name standard --seed 42

Differences from the reference, by design (TPU-native):
- `--dataloader` accepts `standard` (image folders) or `packed` (this
  framework's FFCV-beton equivalent; `ffcv` is accepted as an alias).
- devices come from the TPU mesh (`jax.devices()`) instead of
  `torch.cuda.device_count()`; multi-host via `jax.distributed`
  (`--num_nodes` kept for interface parity, host count is auto-detected).
- precision: bf16 compute / fp32 params (`--precision` flag) instead of AMP
  16-mixed.
"""

from __future__ import annotations

import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--params_file', type=str, required=True,
                        help='path to yaml file with model params')
    parser.add_argument('--dataloader', type=str,
                        choices=['standard', 'packed', 'ffcv'], default='standard',
                        help='defines what type of dataloader to use.')
    parser.add_argument('--dataset_path', type=str, required=True,
                        help='path to a dataset folder containing two sub-folders '
                             '(validation / train) or packed files '
                             '(train.pack / validation.pack).')
    parser.add_argument('--save_path', type=str, required=True,
                        help='path for checkpointing the model')
    parser.add_argument('--save_every_n_epochs', type=int, default=1,
                        help='how often to save a new checkpoint')
    parser.add_argument('--run_name', type=str, required=True,
                        help='name of the run, for logging and checkpointing')
    parser.add_argument('--seed', type=int, required=True,
                        help='global random seed for reproducibility')
    parser.add_argument('--loading_path', type=str, default=None,
                        help='if passed, will load and continue training of an '
                             'existing checkpoint')
    parser.add_argument('--logging', help='if passed, wandb logger is used',
                        action='store_true')
    parser.add_argument('--wandb_project', type=str, default='vqvae',
                        help='project name for wandb logger')
    parser.add_argument('--wandb_id', type=str, default=None,
                        help='wandb id of the run. Useful for resuming logging')
    parser.add_argument('--workers', type=int, default=1,
                        help='num of parallel workers')
    parser.add_argument('--num_nodes', type=int, default=1,
                        help='number of hosts (kept for CLI parity; '
                             'auto-detected via jax.distributed)')
    parser.add_argument('--precision', type=str, default='bf16',
                        choices=['bf16', 'fp32'],
                        help='compute dtype for the conv stacks '
                             '(params are always fp32)')
    parser.add_argument('--max_epochs', type=int, default=None,
                        help='override training.max_epochs (debug)')
    return parser.parse_args()


def main():
    args = parse_args()

    from vqvae_tpu.parallel.mesh import distributed_init_if_needed
    distributed_init_if_needed()

    import jax
    import jax.numpy as jnp

    from vqvae_tpu.config import load_config
    from vqvae_tpu.data.dataset import get_loaders
    from vqvae_tpu.parallel.mesh import create_mesh
    from vqvae_tpu.train.loop import run_training
    from vqvae_tpu.utils.logging import MetricLogger

    cfg = load_config(args.params_file)
    seed = int(args.seed)

    n_devices = len(jax.devices())
    mesh = create_mesh() if n_devices > 1 else None

    cumulative_bs = cfg.training.cumulative_bs
    if mesh is not None:
        # validates divisibility up front (a clear error at startup instead
        # of an opaque sharding failure after the first compile, and no
        # silent global-batch drift when hosts don't divide cumulative_bs)
        from vqvae_tpu.parallel.mesh import local_batch_size
        batch_per_host = local_batch_size(cumulative_bs, mesh)
    else:
        batch_per_host = cumulative_bs // jax.process_count()
    # sqrt LR scaling with global batch (reference train.py:63)
    learning_rate = cfg.training.scaled_lr()

    train_loader, val_loader = get_loaders(
        args.dataloader, args.dataset_path, cfg.image_size, batch_per_host,
        int(args.workers), seed, mode='train')

    logger = MetricLogger(args.save_path, args.run_name,
                          use_wandb=bool(args.logging),
                          wandb_project=args.wandb_project,
                          wandb_id=args.wandb_id,
                          resume=args.loading_path is not None,
                          is_main_process=jax.process_index() == 0)

    print(f"[INFO] devices: {n_devices} x {jax.devices()[0].device_kind}")
    print(f"[INFO] workers: {args.workers}")
    print(f"[INFO] batch size per host: {batch_per_host}")
    print(f"[INFO] cumulative batch size (all devices): {cumulative_bs}")
    print(f"[INFO] final learning rate: {learning_rate}")

    compute_dtype = jnp.bfloat16 if args.precision == 'bf16' else jnp.float32

    run_training(cfg, train_loader, val_loader, seed=seed,
                 learning_rate=learning_rate, save_dir=args.save_path,
                 run_name=args.run_name,
                 save_every_n_epochs=int(args.save_every_n_epochs),
                 logger=logger, resume_path=args.loading_path, mesh=mesh,
                 compute_dtype=compute_dtype, max_epochs=args.max_epochs)

    logger.finish()


if __name__ == '__main__':
    main()
