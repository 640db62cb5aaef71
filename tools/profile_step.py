"""Capture a jax.profiler trace of the flagship train step and print the
top HLO ops by self-time (offline, via xprof's raw_to_tool_data — no
TensorBoard server needed).

Usage: python tools/profile_step.py [--config gan_r1|lpips|mse|gan]
                                    [--batch 32] [--remat 0|1|auto]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def capture(config: str, batch: int, remat, logdir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench_breakdown import make_cfg
    from vqvae_tpu.train.loop import Trainer

    variants = {
        "mse": dict(with_loss=False, with_adv=False, r1=False),
        "lpips": dict(with_loss=True, with_adv=False, r1=False),
        "gan": dict(with_loss=True, with_adv=True, r1=False),
        "gan_r1": dict(with_loss=True, with_adv=True, r1=True),
    }
    cfg = make_cfg(256, 128, **variants[config])
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=1000,
                      mesh=None, compute_dtype=jnp.bfloat16, remat=remat)
    state = trainer.init_state()
    images = np.random.RandomState(0).randint(
        0, 255, (batch, 256, 256, 3), np.uint8)
    batch_dict = {"image": images}

    for _ in range(3):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])

    jax.profiler.start_trace(logdir)
    for _ in range(4):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()


def report(logdir: str, top_n: int = 40):
    """Parse the captured xplane with xprof and print op-level stats."""
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    xplane = max(xplanes, key=os.path.getmtime)

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older installs
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplane], "op_profile", {})
    prof = json.loads(data)

    def walk(node, path, out):
        m = node.get("metrics", {})
        children = node.get("children", [])
        name = node.get("name", "?")
        if not children:
            out.append((m.get("rawTime", 0), name, m.get("flops", 0),
                        m.get("bandwidthUtils", [])))
        for c in children:
            walk(c, path + [name], out)

    root = prof.get("byProgram") or prof.get("byCategory")
    if root is None:
        print(f"op_profile payload has no byProgram/byCategory tree "
              f"(keys: {sorted(prof)})", file=sys.stderr)
        return
    out = []
    walk(root, [], out)
    out.sort(reverse=True)
    total = sum(t for t, *_ in out) or 1
    print(f"{'self-time %':>11}  {'ps':>14}  op")
    for t, name, flops, bw in out[:top_n]:
        print(f"{100.0 * t / total:10.2f}%  {t:14.0f}  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="gan_r1")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--remat", default="0")
    ap.add_argument("--logdir", default="/tmp/jax_trace")
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()

    remat = None if args.remat == "auto" else args.remat == "1"
    if not args.report_only:
        os.system(f"rm -rf {args.logdir}")
        capture(args.config, args.batch, remat, args.logdir)
    report(args.logdir)


if __name__ == "__main__":
    main()
