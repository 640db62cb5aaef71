"""Export VQ token sequences for a whole dataset (stage-2 model support).

The reference exposes get_tokens/reconstruct_from_tokens as a Python API for
second-stage (autoregressive / MaskGIT) training (reference model.py:458-489,
readme "2nd stage" usage); this CLI runs that API over a dataset at scale and
writes one int32 .npy of shape (N, S) per split — plus a manifest with the
codebook size so a stage-2 pipeline is self-describing.

    python tools/tokenize_dataset.py --params_file conf.yaml \
        --loading_path /ckpts/run/last --dataset_path /data/ \
        --splits train validation --batch_size 256 --output_folder /tokens/

Runs jitted on one device (tokenization is IO-bound; shard the splits across
hosts/processes for scale), deterministic (gumbel quantizer uses argmax
tokens via deterministic=True by default; --sampled_tokens reproduces the
reference's gumbel-noise vec_to_codes quirk, vector_quantizers.py:265-274).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params_file", required=True)
    ap.add_argument("--loading_path", required=True)
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "validation"])
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--dataloader", default="standard",
                    choices=["standard", "packed", "ffcv"])
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sampled_tokens", action="store_true",
                    help="gumbel quantizer: sample tokens through gumbel "
                         "noise exactly like the reference vec_to_codes "
                         "(default: deterministic argmax)")
    ap.add_argument("--spatial", action="store_true",
                    help="shard each image's HEIGHT across all devices "
                         "(GSPMD spatial partitioning, automatic conv halo "
                         "exchange) — for resolutions whose activations "
                         "exceed one chip's HBM; deterministic tokens only. "
                         "Encoder activation footprint is roughly "
                         "4*H*W*channels*2 bytes (bf16) per image — ~0.8 GB "
                         "at 1024^2/ch128, ~3.4 GB at 2048^2, ~13 GB at "
                         "4096^2 (single-chip ceiling on 16 GB; measured "
                         "probe: tools/probe_max_resolution.py); sharding H "
                         "over n chips divides that by ~n. NOTE: exactness "
                         "is pinned on the CPU mesh, multi-chip ICI "
                         "performance is unmeasured on this 1-chip box")
    return ap.parse_args()


def main():
    args = parse_args()

    import dataclasses

    import jax

    # honor JAX_PLATFORMS=cpu: the axon TPU plugin re-registers itself over
    # the env var, so hermetic runs (tests, tunnel outages) must pin the
    # platform through jax.config instead
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vqvae_tpu.config import load_config
    from vqvae_tpu.data.dataset import Loader, ImageFolderDataset
    from vqvae_tpu.data.packed import PackedDataset
    from vqvae_tpu.train.loop import Trainer
    from vqvae_tpu.utils.checkpoint import restore_for_eval

    cfg = load_config(args.params_file)
    eval_cfg = dataclasses.replace(cfg, loss=None)
    is_gumbel = cfg.quantizer.type == "gumbel"

    # eval-grade numerics: exported tokens must agree with evaluate.py's
    # reconstruction path (TPU default matmul precision runs fp32 convs as
    # one bf16 pass; near-tie code assignments would flip)
    from vqvae_tpu.ops.misc_ops import set_matmul_precision
    set_matmul_precision("highest")

    # the LR is irrelevant for tokenization; `training:` is optional schema
    lr = cfg.training.base_lr if cfg.training is not None else 1e-4
    trainer = Trainer(cfg=eval_cfg, learning_rate=lr,
                      seed=args.seed, steps_per_epoch=1, mesh=None,
                      compute_dtype=jnp.float32)
    state = trainer.init_state()
    state = restore_for_eval(args.loading_path, state)
    model = trainer.model

    kwargs = {}
    if is_gumbel:
        kwargs["deterministic"] = not args.sampled_tokens

    if args.spatial:
        if is_gumbel and args.sampled_tokens:
            raise SystemExit("--spatial supports deterministic tokens only "
                             "(drop --sampled_tokens)")
        from vqvae_tpu.parallel.mesh import create_mesh
        from vqvae_tpu.parallel.spatial import make_spatial_apply
        mesh = create_mesh(("data",))
        variables = {"params": state.params}
        if state.vq_state is not None:
            variables["vq_state"] = state.vq_state
        spatial_fn = make_spatial_apply(model, variables, mesh,
                                        method="get_tokens", **kwargs)
        print(f"[INFO] spatial sharding over {mesh.devices.size} devices")

        def tokens_of(params, images, rng):
            return spatial_fn(images.astype(jnp.float32) / 255.0)
    else:
        @jax.jit
        def tokens_of(params, images, rng):
            x = images.astype(jnp.float32) / 255.0
            variables = {"params": params}
            if state.vq_state is not None:
                variables["vq_state"] = state.vq_state
            rngs = {"gumbel": rng} if is_gumbel else None
            return model.apply(variables, x, method="get_tokens", rngs=rngs,
                               **kwargs)

    os.makedirs(args.output_folder, exist_ok=True)
    manifest = {"num_embeddings": cfg.quantizer.num_embeddings,
                "quantizer": cfg.quantizer.type,
                "image_size": cfg.image_size,
                "latent_tokens": cfg.latent_size ** 2,
                "splits": {}}

    for split in args.splits:
        if args.dataloader == "standard":
            ds = ImageFolderDataset(os.path.join(args.dataset_path, split),
                                    cfg.image_size)
        else:
            ds = PackedDataset(os.path.join(args.dataset_path, split + ".pack"),
                               cfg.image_size)
        loader = Loader(ds, batch_size=args.batch_size, shuffle=False,
                        drop_last=False, num_workers=args.workers,
                        shard_rank=0, shard_count=1)
        out = []
        rng = jax.random.PRNGKey(args.seed)
        for i, batch in enumerate(loader):
            rng, sub = jax.random.split(rng)
            toks = np.asarray(tokens_of(state.params, batch["image"], sub))
            out.append(toks[np.asarray(batch["mask"], bool)])
        tokens = np.concatenate(out).astype(np.int32)
        path = os.path.join(args.output_folder, f"{split}_tokens.npy")
        np.save(path, tokens)
        manifest["splits"][split] = {"file": os.path.basename(path),
                                     "num_sequences": int(tokens.shape[0]),
                                     "seq_len": int(tokens.shape[1])}
        print(f"[INFO] {split}: {tokens.shape} -> {path}")

    with open(os.path.join(args.output_folder, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"[INFO] manifest -> {args.output_folder}/manifest.json")


if __name__ == "__main__":
    main()
