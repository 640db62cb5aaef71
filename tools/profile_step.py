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
import re
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


def report(logdir: str, top_n: int = 40, n_steps: int = 4,
           peak_tflops: float = 197e3, peak_gbps: float = 819.0):
    """Parse the captured xplane with xprof's hlo_stats view and print
    per-fusion time / achieved FLOP rate / achieved HBM bandwidth / roofline
    waste + source attribution — the view that exposes which fusions are
    below both rooflines (op_profile only surfaces non-fusion leaves).

    `waste` = self_time * (1 - max(flops/peak, bw/peak)): an upper bound on
    the time a speed-of-light implementation of that op could save. Peaks
    default to TPU v5e bf16 (197 TFLOP/s, 819 GB/s)."""
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
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    obj = json.loads(data.decode() if isinstance(data, bytes) else data)
    idx = {c["id"]: i for i, c in enumerate(obj["cols"])}

    rows = []
    tot = waste_tot = 0.0
    by_cat = {}
    for r in obj["rows"]:
        c = r["c"]
        t = (c[idx["total_self_time"]]["v"] or 0) / (1000.0 * n_steps)  # ms
        fr = c[idx["normalized_flop_rate"]]["v"] or 0                   # GF/s
        bw = c[idx["measured_memory_bw"]]["v"] or 0                     # GB/s
        cat = c[idx["category"]]["v"] or "?"
        eff = max(fr / peak_tflops, bw / peak_gbps)
        waste = t * (1 - min(eff, 1.0)) if eff > 0 else 0.0
        src = (c[idx["source_info"]]["v"] or "")  # html-wrapped path:line
        m = re.findall(r"([\w.-]+\.\w+:\d+)", src)
        src = m[-1] if m else ""
        rows.append((t, waste, fr / 1e3, bw, c[idx["hlo_op_name"]]["v"] or "?",
                     cat, src))
        tot += t
        waste_tot += waste
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    rows.sort(reverse=True)

    print(f"total {tot:.1f} ms/step over {len(rows)} ops; "
          f"roofline-bound waste {waste_tot:.1f} ms/step")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {cat:28s} {t:8.2f} ms/step")
    print(f"{'ms':>7} {'waste':>6} {'TF/s':>7} {'GB/s':>6}  op / source")
    for t, waste, fr, bw, op, cat, src in rows[:top_n]:
        print(f"{t:7.2f} {waste:6.2f} {fr:7.1f} {bw:6.1f}  {op:30s} {src}")


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
